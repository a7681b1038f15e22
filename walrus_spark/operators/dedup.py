"""Deduplication operators over the ``documents`` / ``embeddings`` tables.

Four families, each a pure distributed DataFrame transform:

  exact           — hash group-by on a canonical fingerprint (1 shuffle)
  n-gram Jaccard  — exact set-similarity via shingle token join
  MinHash + LSH   — the 100 TB path: signature → band → bucket join →
                    exact verify only on candidates
  SimHash         — 64-bit sketch, byte-band candidates, Hamming verify
  embedding cosine— near-dup by vector similarity

The LSH/SimHash plans never materialize the O(n²) pair space: candidate
generation is an equi-join on (band, hash-bucket), so shuffle volume is
O(n · bands), and the expensive exact verification runs only on bucket
collisions. That is the property that survives a 1000-executor scale-up;
the plain shingle join (kept as the oracle-checkable exact baseline)
does not, and says so in its docstring.

Hash functions are Spark's xxhash64 (JVM, codegen) with fixed affine
permutations — fully deterministic across runs and cluster sizes.
"""

from __future__ import annotations

import os
import random

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from walrus_spark.catalog import dataset_key, load_table, spread
from walrus_spark.queries.registry import register

SHINGLE_N = 3
JACCARD_THRESHOLD = 0.5
N_PERM = 64
LSH_BANDS = 16  # 16 bands × 4 rows; P(miss | j=0.9) ≈ 4e-8

# Fixed universal-hash constants for MinHash: h_i(x) = (a·x + b) mod p
# over the 32-bit-reduced shingle hash, p = 2^61-1 (Mersenne prime).
# Bounded so ANSI long arithmetic never overflows (a < 2^30, x < 2^32
# → a·x < 2^62; + b < 2^61 stays under 2^63). The mod-p step is what
# makes the 64 functions behave as independent permutations (a plain
# affine map is monotonic in x and would make every minimum pick the
# same shingle).
_MERSENNE_61 = (1 << 61) - 1
_rng = random.Random(0xA1C3)
_PERM = [
    (2 * _rng.getrandbits(29) + 1, _rng.getrandbits(60)) for _ in range(N_PERM)
]


def shingles(text_col: Column, n: int = SHINGLE_N) -> Column:
    """Distinct word n-gram shingles of a text column.

    One regex pass: normalize whitespace, then capture each overlapping
    n-gram with a lookahead group while consuming one word per match.
    Deliberately NOT a transform/sequence/element_at lambda chain —
    Spark evaluates higher-order functions interpreted (no codegen, no
    common-subexpression elimination), and `InferFiltersFromGenerate`
    copies a Generate's input expression into pushed-down filters, so an
    expensive shingle expression gets re-evaluated below the exchange on
    the scan's (possibly single-file) partitioning. A codegen'd regex
    stays cheap everywhere the optimizer duplicates it. Fewer than n
    words → empty array (the lookahead never matches), no CASE needed."""
    norm = F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " ")
    pat = r"(?=((?:\S+ ){%d}\S+))\S+ " % (n - 1)
    return F.array_distinct(F.regexp_extract_all(norm, F.lit(pat), 1))


# Exact Jaccard over word-3-shingles — the shared CTE body of three
# oracles: the exact operator, the MinHash-LSH variant (which must agree
# with the exact result — that's the point), and the SimHash containment
# contract below.
_JACCARD_CTES = """
WITH words AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
  FROM documents
), idx AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i FROM words
  WHERE len(ws) >= 3
), sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s FROM idx
), sz AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), pair AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
"""

# Gate window width for the exact-substring branch (tokens). 8 keeps
# the sf0.01 oracle's full window self-join tractable while still
# exercising the positioned-window/run machinery end-to-end.
SUBSTR_WINDOW = 8

# Exact-substring pairs recomputed relationally: token windows by
# position, self-join on the window STRING, gaps-and-islands along the
# (ia - ib) diagonal for the longest shared run. Mirrors
# substring_dedup_pairs' semantics without its banding (the banding is
# a pure candidate pre-filter; exact verify makes the results equal).
_SUBSTR_CTES = f"""
, st AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS ts
  FROM documents
), sw AS (
  SELECT doc_id, i, array_to_string(ts[i:i+{SUBSTR_WINDOW - 1}], ' ') AS ws
  FROM (SELECT doc_id, ts,
               unnest(generate_series(1, len(ts)-{SUBSTR_WINDOW - 1}))
               AS i
        FROM st WHERE len(ts) >= {SUBSTR_WINDOW})
), ssh AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.i AS ia, y.i AS ib
  FROM sw x JOIN sw y ON x.ws = y.ws AND x.doc_id < y.doc_id
), runs AS (
  SELECT doc_a, doc_b, d, grp, count(*) AS chain,
         min(ia) - d AS ib0
  FROM (
    SELECT doc_a, doc_b, ia - ib AS d,
           ia - row_number() OVER (
             PARTITION BY doc_a, doc_b, ia - ib ORDER BY ia) AS grp,
           ia
    FROM ssh)
  GROUP BY doc_a, doc_b, d, grp
), substr_pairs AS (
  SELECT doc_a, doc_b,
         CAST(sum(chain) AS BIGINT) AS n_shared_windows,
         CAST(max(chain) + {SUBSTR_WINDOW - 1} AS BIGINT) AS max_run_tokens
  FROM runs GROUP BY doc_a, doc_b
), rem AS (
  SELECT DISTINCT doc_b AS doc_id,
         unnest(generate_series(ib0, ib0 + chain + {SUBSTR_WINDOW - 2}))
         AS pos
  FROM runs
), tokpos AS (
  SELECT doc_id, i AS pos, ts[i] AS tok
  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
        FROM st)
), keptt AS (
  SELECT doc_id, pos, tok FROM tokpos ANTI JOIN rem USING (doc_id, pos)
), cleaned AS (
  SELECT doc_id,
         coalesce(string_agg(tok, ' ' ORDER BY pos), '') AS text_clean
  FROM keptt GROUP BY doc_id
), nrem AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS nrm FROM rem GROUP BY doc_id
), cleanrow AS (
  SELECT s.doc_id,
         CAST(coalesce(n.nrm, 0) AS BIGINT) AS n_tokens_removed,
         md5(coalesce(c.text_clean, '')) AS clean_fp
  FROM st s LEFT JOIN cleaned c USING (doc_id) LEFT JOIN nrem n USING (doc_id)
)
"""

_JACCARD_ORACLE = _JACCARD_CTES + _SUBSTR_CTES + """
SELECT 'jaccard' AS src, p.doc_a, p.doc_b,
       round(p.inter * 1.0 / (sa.n + sb.n - p.inter), 6) AS jaccard,
       CAST(NULL AS BIGINT) AS n_shared_windows,
       CAST(NULL AS BIGINT) AS max_run_tokens,
       CAST(NULL AS BIGINT) AS n_tokens_removed,
       CAST(NULL AS VARCHAR) AS clean_fp
FROM pair p
JOIN sz sa ON sa.doc_id = p.doc_a
JOIN sz sb ON sb.doc_id = p.doc_b
WHERE p.inter * 1.0 / (sa.n + sb.n - p.inter) >= 0.5
UNION ALL
SELECT 'substr', doc_a, doc_b, CAST(NULL AS DOUBLE),
       n_shared_windows, max_run_tokens, NULL, NULL
FROM substr_pairs
UNION ALL
SELECT 'clean', doc_id, NULL, NULL, NULL, NULL,
       n_tokens_removed, clean_fp
FROM cleanrow
"""

# SimHash containment contract: every exact pair must be simhash-found,
# so the oracle asserts the flag as a constant — if the sketch/banding
# ever regresses, the Spark side emits false and the hash check fails.
_SIMHASH_ORACLE = _JACCARD_CTES + """
SELECT p.doc_a, p.doc_b,
       round(p.inter * 1.0 / (sa.n + sb.n - p.inter), 6) AS jaccard,
       true AS simhash_found
FROM pair p
JOIN sz sa ON sa.doc_id = p.doc_a
JOIN sz sb ON sb.doc_id = p.doc_b
WHERE p.inter * 1.0 / (sa.n + sb.n - p.inter) >= 0.5
"""


@register(
    "dq19_dedup_exact",
    oracle="WITH g AS (SELECT md5(lower(text)) AS fp, "
    "min(doc_id) AS canonical_id, count(*) AS n_copies "
    "FROM documents GROUP BY 1), "
    "r AS (SELECT ('0x' || substring(md5(lower(text)), 1, 3))::BIGINT "
    "AS bucket, "
    "('0x' || substring(md5(lower(text)), 4, 13))::BIGINT AS v "
    "FROM documents WHERE text IS NOT NULL), "
    "reg AS (SELECT bucket, max(CASE WHEN v = 0 THEN 53 "
    "ELSE 53 - length(bin(v)) END) AS max_rho FROM r GROUP BY bucket) "
    "SELECT 'group' AS src, fp, canonical_id, n_copies, "
    "CAST(NULL AS BIGINT) AS bucket, CAST(NULL AS BIGINT) AS max_rho "
    "FROM g "
    "UNION ALL SELECT 'hll' AS src, CAST(NULL AS VARCHAR), "
    "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), bucket, "
    "CAST(max_rho AS BIGINT) FROM reg"
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ19 + exact dedup + a verifiable cardinality sketch in one
    tagged entry. 'group' rows: content-fingerprint groups with the min
    doc_id as canonical representative (the distinct-document count
    DQ19 asked for IS this branch's row count). 'hll' rows: the
    engine-independent HyperLogLog register table over the same
    fingerprint input (operators/sketch.py) — hash-checked register-
    for-register against DuckDB recomputing the identical md5-bucket/
    bit-length construction, so the SKETCH itself is verified, not
    just trusted. One shuffle per branch (128-bit key / 4096-bucket
    key); neither ever carries document bodies."""
    d = load_table(spark, sf_dir, "documents")
    lowered = d.select("doc_id", F.lower("text").alias("lt"))
    groups = (
        lowered.select(
            "doc_id", F.md5(F.encode("lt", "UTF-8")).alias("fp")
        )
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
        .select(
            F.lit("group").alias("src"),
            "fp",
            "canonical_id",
            "n_copies",
            F.lit(None).cast("long").alias("bucket"),
            F.lit(None).cast("long").alias("max_rho"),
        )
    )
    from walrus_spark.operators.sketch import hll_registers

    hll = hll_registers(lowered, "lt").select(
        F.lit("hll").alias("src"),
        F.lit(None).cast("string").alias("fp"),
        F.lit(None).cast("long").alias("canonical_id"),
        F.lit(None).cast("long").alias("n_copies"),
        "bucket",
        F.col("max_rho").cast("long"),
    )
    # unsorted: order-insensitive gate hash; groups-scale sort elided
    return groups.unionByName(hll)


# _spread moved to catalog.spread (r12): the tiny-file fan-out turned
# out to matter for every CPU-heavy scan-stage family, not just
# tokenization — imported here under its historical name.
_spread = spread


def _bucket_pairs(
    bucketed: DataFrame,
    keys: list[str],
    item: Column,
    pair_pred=None,
) -> DataFrame:
    """All i<j item pairs within each bucket — WITHOUT a self-join.

    groupBy(keys) → sort_array(collect_list(item)) → nested transform/
    slice higher-order functions enumerate each bucket's pairs in
    place, optionally filtered by ``pair_pred(a, b)`` BEFORE any pair
    row materializes. Output columns: ``a`` and ``b`` (item structs),
    with a < b in the item's struct order (sort_array guarantees it).

    Why not the classic self equi-join on the bucket key: Spark has no
    DAG-level sharing of a repeated subtree, so a self-join evaluates
    the (expensive) upstream pipeline once PER SIDE — and AQE's
    broadcast conversion defeats ReusedExchange, the only physical
    mechanism that could have deduplicated it (measured: the simhash
    candidate join ran the whole signature pipeline twice). Grouping
    computes the upstream once and shuffles each row once, keyed by
    bucket — the shape that survives a 1000-executor scale-up.

    Skew note: a bucket is one aggregation row, so a pathological hot
    bucket builds its (filtered) pair array inside one task — the same
    task that would own the hot side of the equi-join, but with O(pairs)
    array memory. Callers with a cheap pair predicate (e.g. Hamming ≤ k)
    pass it here so hot buckets shrink before the array exists; callers
    without one must keep bucket entropy high (wide band hashes)."""
    grouped = (
        bucketed.groupBy(*keys)
        .agg(F.sort_array(F.collect_list(item)).alias("xs"))
        .where(F.size("xs") >= 2)
    )

    def per_i(x, i):
        rest = F.slice(F.col("xs"), i + F.lit(2), F.size(F.col("xs")))
        if pair_pred is not None:
            # filter BEFORE building pair structs: predicate failures
            # cost one boolean eval, never an allocation
            rest = F.filter(rest, lambda y: pair_pred(x, y))
        return F.transform(rest, lambda y: F.struct(x.alias("a"), y.alias("b")))

    pairs = F.flatten(F.transform(F.col("xs"), per_i))
    return grouped.select(F.explode(pairs).alias("p")).select("p.a", "p.b")


def _shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, n, hs: array<bigint>): per-doc distinct shingle sets as
    sorted 64-bit xxhash values, n = |set|.

    Every dedup consumer (minhash/simhash signatures, Jaccard
    intersection counting, LSH verify) needs only the HASH of each
    shingle, so the strings are dropped at tokenize time — hashed sets
    shuffle ~10× less than string arrays and, critically, cache
    cheaply: materializing array<string> into the in-memory columnar
    store measured 4.2 s at sf0.1 vs well under 1 s for array<bigint>,
    which is what makes sharing one cached frame across a multi-pass
    dedup query a win instead of a tax.

    Docs with < SHINGLE_N words are dropped: they have no set to
    sketch, and keeping them would put every tiny doc into the same
    degenerate LSH bucket (a skew bomb at 100 TB). Sets are capped at
    32767 shingles (the simhash 16-bit lane bound; only pathological
    multi-megabyte single documents hit it)."""
    return (
        # shingling is BLAS/regex-heavy per row: full fan-out pays off
        # even on 5k-row fixtures (per_part_rows=64 -> 32 parts there)
        _spread(docs, per_part_rows=64)
        .select(
            "doc_id",
            F.explode(
                F.slice(shingles(F.col("text")), 1, 32767)
            ).alias("s"),
        )
        .select("doc_id", F.xxhash64("s").alias("sh64"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("sh64")).alias("hs"))
        .withColumn("n", F.size("hs"))
    )


# One cached shingle-set frame per (session, dataset), shared by EVERY
# registered dedup entry (ngram/minhash/simhash/clusters). Spark's cache
# manager is plan-keyed, so repeated `.cache()` calls over the same plan
# already reuse one entry — but each call still builds and pins a fresh
# DataFrame handle, and a 50-entry gate run that mixes entry-local
# caches accumulates storage bookkeeping it never releases (the r4
# dedup_clusters bench outlier). Memoizing the HANDLE makes the sharing
# explicit and gives the suite a single place to evict: entering a new
# dataset (or a new session) unpersists the old frame first, so a
# long-lived session holds at most ONE cached sets frame. At 100 TB
# this frame is the materialized shingle-set table any multi-pass dedup
# pipeline would persist explicitly.
_SETS_CACHE: dict[str, tuple[SparkSession, DataFrame]] = {}


def shared_shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-dataset cached shingle-set frame used by all dedup
    entries; tokenization — the measured dominant cost — runs once per
    dataset per session, never once per entry."""
    # content-signature keyed (r11 advisor finding): a fixture
    # rewritten in place must MISS every derived-frame memo, not just
    # load_table's handle cache
    key = str(dataset_key(sf_dir, "documents"))
    hit = _SETS_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    clear_shared_sets()
    sets = _shingle_sets(load_table(spark, sf_dir, "documents")).cache()
    _SETS_CACHE[key] = (spark, sets)
    return sets


def clear_shared_sets() -> None:
    """Unpersist and drop every memoized shingle-set frame (entry-exit
    cleanup for tests and long-lived sessions)."""
    for k, (_, df) in list(_SETS_CACHE.items()):
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001  # session already stopped
            pass
        del _SETS_CACHE[k]


# One cached exactly-verified substring-match table per (session,
# dataset, window) — the shingle-set discipline applied to the
# exact-substring family: the banded-candidate + SMJ-verify stages
# (_shared_window_positions steps 1–3) are the measured dominant cost
# of BOTH policy operators (pair report + span removal), and at 100 TB
# a pipeline that runs both persists the match table once — it is the
# natural materialized intermediate of long-exact-match dedup (the
# (doc_a, doc_b, ia, ib) table is pair-workload sized, far smaller
# than the corpus). cache()+count() rather than localCheckpoint: the
# release-everything hook (session.release_session_caches) may drop
# the blocks between pipeline stages, and a cached frame silently
# recomputes where a truncated-lineage checkpoint would raise.
_POS_CACHE: dict[str, tuple[SparkSession, DataFrame, DataFrame]] = {}


def shared_substring_positions(
    spark: SparkSession, sf_dir: str, w: int
) -> tuple[DataFrame, DataFrame]:
    """The per-(dataset, window) cached (all_base, verified-matches)
    pair used by the substring dedup entry; the SMJ verify runs once
    per session per dataset, never once per entry invocation."""
    key = f"{dataset_key(sf_dir, 'documents')}|{w}"
    hit = _POS_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1], hit[2]
    clear_shared_positions()
    base, shared = _shared_window_positions(
        load_table(spark, sf_dir, "documents"), w
    )
    shared = shared.cache()
    shared.count()  # eager: materialize the verify stage now
    _POS_CACHE[key] = (spark, base, shared)
    return base, shared


def clear_shared_positions() -> None:
    """Unpersist and drop every memoized substring-match table."""
    for k, (_, _b, df) in list(_POS_CACHE.items()):
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001  # session already stopped
            pass
        del _POS_CACHE[k]


# Session-level memo for the two pair tables the simhash entry stacks
# (r9 verdict directive #2 — dedup_simhash was the suite's worst
# contention outlier: 24.8 s contended vs 2.37 s steady, because the
# Manku pigeonhole verify and the exact-Jaccard verify both re-ran per
# execution while every OTHER verify-stage family had already moved to
# a per-(session, dataset) materialized match table). Both tables are
# pair-workload-sized (far smaller than the corpus); at 100 TB they
# are exactly the candidate/verified-pairs intermediates a multi-pass
# dedup pipeline persists once. cache()+eager count, not
# localCheckpoint — the release-everything hook may drop blocks
# between stages and a cached frame recomputes where truncated
# lineage would raise (the _POS_CACHE note).
_PAIR_CACHE: dict[str, tuple[SparkSession, DataFrame]] = {}


def _shared_pair_table(
    spark: SparkSession, key: str, build
) -> DataFrame:
    hit = _PAIR_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    # release only STALE entries — another dataset or a dead session.
    # (Same-dataset siblings must survive: the simhash entry stacks
    # the jaccard and simhash tables, and clearing all on any miss
    # would make the two memos mutually evict forever.)
    dataset = key.rsplit("|", 1)[0]
    for k, (s, df) in list(_PAIR_CACHE.items()):
        if s is not spark or k.rsplit("|", 1)[0] != dataset:
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001
                pass
            del _PAIR_CACHE[k]
    df = build().cache()
    df.count()  # eager: materialize the verify stage now
    _PAIR_CACHE[key] = (spark, df)
    return df


def shared_exact_jaccard_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The per-(session, dataset) cached exact n-gram Jaccard pair
    table at the default threshold — shared by dedup_ngram_jaccard's
    'jaccard' branch and dedup_simhash's containment check."""
    key = f"{dataset_key(sf_dir, 'documents')}|jaccard"
    return _shared_pair_table(
        spark,
        key,
        lambda: exact_jaccard_pairs(
            load_table(spark, sf_dir, "documents"),
            JACCARD_THRESHOLD,
            sets=shared_shingle_sets(spark, sf_dir),
            sorted_output=False,  # cached memo; consumers re-shuffle
        ),
    )


def shared_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-(session, dataset) cached SimHash near-dup pair table
    (auto Hamming budget) — the sketch + pigeonhole-banding + Arrow
    popcount verify runs once per session per dataset."""
    key = f"{dataset_key(sf_dir, 'documents')}|simhash"
    return _shared_pair_table(
        spark,
        key,
        lambda: simhash_pairs(
            load_table(spark, sf_dir, "documents"),
            sets=shared_shingle_sets(spark, sf_dir),
            sorted_output=False,  # cached memo; consumers re-shuffle
        ),
    )


def shared_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-(session, dataset) cached MinHash-LSH self-join pair
    table at the default threshold — shared by dedup_minhash_lsh's
    'all' branch and dedup_clusters' edge source (banding + exact
    verify run once per session per dataset; the CC propagation then
    iterates over a pair-workload-sized cached frame)."""
    key = f"{dataset_key(sf_dir, 'documents')}|minhash"
    return _shared_pair_table(
        spark,
        key,
        lambda: minhash_lsh_pairs(
            load_table(spark, sf_dir, "documents"),
            JACCARD_THRESHOLD,
            sets=shared_shingle_sets(spark, sf_dir),
            sorted_output=False,  # cached memo; consumers re-shuffle
        ),
    )


def shared_minhash_cross_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The per-(session, dataset) cached INCREMENTAL-dedup pair table:
    minhash_lsh_cross over the deterministic odd/even doc_id split
    (odd = new batch, even = existing corpus) — the second signature
    pipeline dedup_minhash_lsh's 'cross' branch was re-running per
    execution after its 'all' branch moved to the memo."""
    key = f"{dataset_key(sf_dir, 'documents')}|minhash_cross"

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        sets = shared_shingle_sets(spark, sf_dir)
        return minhash_lsh_cross(
            docs.where(F.col("doc_id") % 2 == 1),
            docs.where(F.col("doc_id") % 2 == 0),
            sets_new=sets.where(F.col("doc_id") % 2 == 1),
            sets_corpus=sets.where(F.col("doc_id") % 2 == 0),
            sorted_output=False,  # cached memo; consumers re-shuffle
        )

    return _shared_pair_table(spark, key, build)


def clear_shared_pairs() -> None:
    """Unpersist and drop every memoized pair table."""
    for k, (_, df) in list(_PAIR_CACHE.items()):
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001  # session already stopped
            pass
        del _PAIR_CACHE[k]


def exact_jaccard_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    sets: DataFrame | None = None,
    sorted_output: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard pairs, single-pass.

    Each doc's shingle-set SIZE rides through the explode next to the
    shingle hash, so the per-shingle buckets already hold everything
    Jaccard needs: group per shingle, enumerate in-bucket pairs
    (_bucket_pairs — no self-join, tokenization runs ONCE), count each
    pair's collisions = |intersection|, and |union| = na + nb − inter
    falls out of the carried sizes. One tokenize scan + two shuffles
    (by shingle, by pair); the old formulation tokenized three times
    (join sides + size table) and joined four ways.

    Still O(Σ bucket²) in shingle frequency — fine as the exact oracle
    baseline and the verify stage on LSH candidates, but hot shingles
    blow up at 100 TB; minhash_lsh_pairs below is the scale path."""
    if sets is None:
        sets = _shingle_sets(docs)
    rows = sets.select("doc_id", "n", F.explode("hs").alias("sh64"))
    pairs = _bucket_pairs(rows, ["sh64"], F.struct("doc_id", "n"))
    agg = pairs.groupBy(
        F.col("a.doc_id").alias("doc_a"),
        F.col("a.n").alias("na"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("b.n").alias("nb"),
    ).agg(F.count("*").alias("inter"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    out = agg.where(jac >= threshold).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )
    # sorted_output=True is the interactive-use default (COVERAGE.md
    # output-order contract); the session memo opts out — its cache
    # materialization would pay the range sampling's re-execution of
    # the last aggregate stage for an order no consumer reads
    return out.orderBy("doc_a", "doc_b") if sorted_output else out


@register("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two hash-checked branches in one tagged entry (r7 — gates the
    r6 library-only substring operator per the round directive):

    'jaccard' — exact n-gram Jaccard pairs (exact_jaccard_pairs).
    'substr'  — exact-substring dedup (substring_dedup_pairs,
                dedup.py below): pairs sharing a verbatim
                SUBSTR_WINDOW-token run, with shared-window count and
                longest-run length. All-integer output; the oracle
                recomputes it relationally (windows → string self-join
                → gaps-and-islands), so the banded candidate stage +
                exact verify must reproduce the exact pair set.
    'clean' (r7) — the POLICY half, substring_dedup_dropspans: one row
                per doc with tokens-removed count and the md5 of the
                cleaned (earliest-copy-kept) token stream — every doc
                fingerprinted, so an over- OR under-removal anywhere
                in the corpus fails the hash."""
    docs = load_table(spark, sf_dir, "documents")
    _nl = F.lit(None).cast("long")
    _ns = F.lit(None).cast("string")
    jac = shared_exact_jaccard_pairs(spark, sf_dir).select(
        F.lit("jaccard").alias("src"),
        "doc_a",
        "doc_b",
        "jaccard",
        _nl.alias("n_shared_windows"),
        _nl.alias("max_run_tokens"),
        _nl.alias("n_tokens_removed"),
        _ns.alias("clean_fp"),
    )
    # one candidate/verify subplan feeds BOTH substring branches,
    # MATERIALIZED through the session-level match-table cache
    # (shared_substring_positions — the shared_shingle_sets
    # discipline): previously the two branches shared the plan subtree
    # and relied on ReuseExchange to deduplicate the SMJ-verify
    # self-join across union arms, which AQE does not guarantee — the
    # r8 verdict's bimodal-runtime finding (17.6 s first-execution vs
    # 5.4 s steady). Now the verify stage runs once per (session,
    # dataset) and both branches read the cached pair-workload-sized
    # (doc_a, doc_b, ia, ib) table. NOTE: the window builder inside
    # deliberately re-tokenizes instead of reading
    # text.shared_doc_tokens — A/B measured (PERF_r09 §2): the
    # positioned-window transform is a heavy HOF over the token array,
    # and feeding it from the cache costs array<string> batch
    # deserialization + loses the fused tokenize→slice codegen (3.0 s
    # vs 2.0 s per pass at sf0.1). The cache wins for flat explode
    # consumers (vocab 0.45 vs 0.55 s), not for this one.
    pos = shared_substring_positions(spark, sf_dir, SUBSTR_WINDOW)
    sub = substring_dedup_pairs(
        docs,
        window_tokens=SUBSTR_WINDOW,
        positions=pos,
        sorted_output=False,  # union branch; gate hash is unordered
    ).select(
        F.lit("substr").alias("src"),
        "doc_a",
        "doc_b",
        F.lit(None).cast("double").alias("jaccard"),
        "n_shared_windows",
        "max_run_tokens",
        _nl.alias("n_tokens_removed"),
        _ns.alias("clean_fp"),
    )
    # the cleaned-corpus fingerprints are per (session, dataset) —
    # memoized through the shared pair-table discipline (r14): the
    # dropspans rebuild (re-tokenize + span anti-join + per-doc token
    # reassembly) is the entry's only remaining per-execution
    # corpus-scale stage, and a real pipeline materializes the cleaned
    # corpus once. Cached AFTER the md5 projection, so the resident
    # frame is 3 slim columns per doc, never the cleaned text itself.
    clean_fp = _shared_pair_table(
        spark,
        f"{dataset_key(sf_dir, 'documents')}|cleanfp",
        lambda: substring_dedup_dropspans(
            docs,
            window_tokens=SUBSTR_WINDOW,
            positions=pos,
            sorted_output=False,  # entry output is unsorted (gate hash)
        ).select(
            F.col("doc_id").alias("doc_a"),
            F.col("n_tokens_removed").cast("long").alias("n_tokens_removed"),
            F.md5("text_clean").alias("clean_fp"),
        ),
    )
    clean = clean_fp.select(
        F.lit("clean").alias("src"),
        "doc_a",
        _nl.alias("doc_b"),
        F.lit(None).cast("double").alias("jaccard"),
        _nl.alias("n_shared_windows"),
        _nl.alias("max_run_tokens"),
        "n_tokens_removed",
        "clean_fp",
    )
    # unsorted: order-insensitive gate hash; the docs-scale 'clean'
    # branch made this the one dedup entry whose final sort was material
    return jac.unionByName(sub).unionByName(clean)


# Scratch ceiling for the Arrow signature kernels: both build a
# (shingles × 64) int64 matrix = 512 B per shingle, so an unblocked
# 10k-row batch of ~1k-shingle docs would allocate ~5 GB per task.
# Blocking by cumulative shingle count (knn_join's `(1<<25)//width`
# pattern) bounds scratch at ~256 MB regardless of Arrow batch size
# and document length.
_MAX_BLOCK_SHINGLES = (1 << 25) // 64


def _doc_blocks(lens):
    """Yield (lo, hi) doc-index ranges whose shingle totals stay under
    `_MAX_BLOCK_SHINGLES` (always ≥1 doc per block, so a single
    pathological document still processes — its matrix is the minimum
    possible for the algorithm)."""
    n = len(lens)
    lo = 0
    while lo < n:
        hi = lo + 1
        tot = int(lens[lo])
        while hi < n and tot + int(lens[hi]) <= _MAX_BLOCK_SHINGLES:
            tot += int(lens[hi])
            hi += 1
        yield lo, hi
        lo = hi


def minhash_signatures(
    docs: DataFrame, sets: DataFrame | None = None
) -> DataFrame:
    """doc_id → 64 minhash values over word-3-shingles.

    h_i(s) = (a_i * (xxhash64(s) & 0xFFFFFFFF) + b_i) mod (2^61-1) — a
    fixed deterministic universal-hash family over the 32-bit-reduced
    hash. Bounds make int64 exact everywhere: a < 2^30, h < 2^32 →
    a·h < 2^62; + b < 2^60 stays under 2^63, so numpy int64 and JVM
    long arithmetic agree bit-for-bit.

    Computed Arrow-batched in the SCAN stage (mapInPandas over the
    shingle-set frame, same shape as simhash_signatures): one
    (total_shingles × 64) affine-mod matrix per batch, one segmented
    `np.minimum.reduceat` for all per-doc minima. Zero shuffle — the
    earlier explode + 64-min groupBy aggregate paid a full exchange of
    the exploded rows plus 64 codegen'd pmods per shingle row, and was
    the dominant cost of the LSH pipeline (1.19 s of 2.22 s at sf0.1).
    Pass ``sets`` to derive from an existing (possibly cached)
    shingle-set frame instead of re-tokenizing."""
    import numpy as np
    import pandas as pd

    if sets is None:
        sets = _shingle_sets(docs)

    a_vec = np.array([a for a, _ in _PERM], dtype=np.int64)
    b_vec = np.array([b for _, b in _PERM], dtype=np.int64)
    cols = [f"m{i}" for i in range(N_PERM)]

    def sign_batches(batches):
        for pdf in batches:
            lens = pdf["hs"].map(len).to_numpy(dtype=np.int64)
            keep = lens > 0  # shingle-less docs have no signature (as
            # the explode formulation: zero rows -> absent)
            if not keep.any():
                continue
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)[keep]
            lens = lens[keep]
            hs_list = pdf["hs"][keep].tolist()
            for blo, bhi in _doc_blocks(lens):
                blens = lens[blo:bhi]
                all_h = np.concatenate(
                    [
                        np.asarray(x, dtype=np.int64)
                        for x in hs_list[blo:bhi]
                    ]
                )
                h32 = (
                    all_h.view(np.uint64) & np.uint64(0xFFFFFFFF)
                ).astype(np.int64)
                vals = (h32[:, None] * a_vec[None, :] + b_vec[None, :]) % (
                    _MERSENNE_61
                )
                starts = np.concatenate(([0], np.cumsum(blens)[:-1]))
                mins = np.minimum.reduceat(vals, starts, axis=0)
                out = {"doc_id": ids[blo:bhi]}
                for i, c in enumerate(cols):
                    out[c] = mins[:, i]
                yield pd.DataFrame(out)

    schema = ", ".join(["doc_id long"] + [f"{c} long" for c in cols])
    return sets.select("doc_id", "hs").mapInPandas(sign_batches, schema)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    sets: DataFrame | None = None,
    sorted_output: bool = True,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified.

    signature → LSH_BANDS band hashes → per-(band, band_hash) bucket
    grouping with in-bucket pair enumeration (_bucket_pairs — the
    signature pipeline runs ONCE, not once per join side) → distinct
    candidates → exact Jaccard verify via array_intersect on the
    (distinct-shingle) arrays. Shuffle volume is O(n·bands) for
    candidates + O(candidates) for the verify — no n² stage anywhere.

    The shingle-set frame is marked for cache: signatures and both
    verify sides all derive from it, so tokenization — the measured
    dominant cost — happens one time per dataset. (Spark's cache
    manager is plan-keyed, so repeated calls over the same input reuse
    one entry; at 100 TB this cache is the materialized shingle-set
    table any multi-pass dedup pipeline would persist explicitly.)
    Pass ``sets`` to share an already-cached shingle-set frame."""
    if sets is None:
        sets = _shingle_sets(docs).cache()
    sig = minhash_signatures(docs, sets=sets)
    r = N_PERM // LSH_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.xxhash64(*[f"m{j * r + k}" for k in range(r)]).alias("bh"),
            )
            for j in range(LSH_BANDS)
        ]
    )
    bucketed = sig.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    cand = (
        _bucket_pairs(bucketed, ["band", "bh"], F.struct("doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    jac = inter / (F.size("hs_a") + F.size("hs_b") - inter)
    out = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
    # memo builds opt out: the range sampling re-runs the verify join
    # (array_intersect over the shingle arrays) for a presentation
    # order the cached pair table's consumers never read
    return out.orderBy("doc_a", "doc_b") if sorted_output else out


def minhash_lsh_cross(
    new: DataFrame,
    corpus: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    sets_new: DataFrame | None = None,
    sets_corpus: DataFrame | None = None,
    sorted_output: bool = True,
) -> DataFrame:
    """Cross-corpus near-dedup — the incremental-ingest shape: which
    NEW documents near-duplicate something already in the CORPUS
    (daily crawl vs accumulated training set). Same banded MinHash
    machinery as the self-join, but candidates come from a plain
    equi-join of the two sides' (band, band-hash) buckets, so shuffle
    volume is O((|new|+|corpus|)·bands) and — unlike re-running the
    self-join over new ∪ corpus — corpus×corpus pairs are never
    enumerated. Exact Jaccard verify on candidates only.

    Output: (doc_new, doc_corpus, jaccard) for verified pairs. Both
    sides may be 100 TB-scale; nothing is broadcast. Pass
    ``sets_new``/``sets_corpus`` to reuse cached shingle-set frames
    (e.g. filtered views of one corpus-wide frame)."""
    sets_n = sets_new if sets_new is not None else _shingle_sets(new).cache()
    sets_c = (
        sets_corpus
        if sets_corpus is not None
        else _shingle_sets(corpus).cache()
    )
    r = N_PERM // LSH_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.xxhash64(*[f"m{j * r + k}" for k in range(r)]).alias("bh"),
            )
            for j in range(LSH_BANDS)
        ]
    )

    def bucketize(docs, sets, out):
        sig = minhash_signatures(docs, sets=sets)
        return sig.select(
            F.col("doc_id").alias(out), F.explode(bands).alias("b")
        ).select(out, F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))

    cand = (
        bucketize(new, sets_n, "doc_new")
        .join(bucketize(corpus, sets_c, "doc_corpus"), ["band", "bh"])
        .select("doc_new", "doc_corpus")
        .distinct()
    )
    sa = sets_n.select(
        F.col("doc_id").alias("doc_new"), F.col("hs").alias("hs_a")
    )
    sb = sets_c.select(
        F.col("doc_id").alias("doc_corpus"), F.col("hs").alias("hs_b")
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    jac = inter / (F.size("hs_a") + F.size("hs_b") - inter)
    out = (
        cand.join(sa, "doc_new")
        .join(sb, "doc_corpus")
        .where(jac >= threshold)
        .select(
            "doc_new", "doc_corpus", F.round(jac, 6).alias("jaccard")
        )
    )
    return out.orderBy("doc_new", "doc_corpus") if sorted_output else out


_MINHASH_ENTRY_ORACLE = _JACCARD_CTES + """
, base AS (
  SELECT p.doc_a, p.doc_b,
         round(p.inter * 1.0 / (sa.n + sb.n - p.inter), 6) AS jaccard
  FROM pair p
  JOIN sz sa ON sa.doc_id = p.doc_a
  JOIN sz sb ON sb.doc_id = p.doc_b
  WHERE p.inter * 1.0 / (sa.n + sb.n - p.inter) >= 0.5
)
SELECT 'all' AS src, doc_a, doc_b, jaccard FROM base
UNION ALL
SELECT 'cross' AS src,
       CASE WHEN doc_a % 2 = 1 THEN doc_a ELSE doc_b END AS doc_a,
       CASE WHEN doc_a % 2 = 1 THEN doc_b ELSE doc_a END AS doc_b,
       jaccard
FROM base WHERE (doc_a % 2) <> (doc_b % 2)
"""


@register("dedup_minhash_lsh", oracle=_MINHASH_ENTRY_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle = the exact-Jaccard SQL: LSH + verify must reproduce the
    exact result (recall loss would fail the hash check). Two tagged
    branches: 'all' = the self-join pairs; 'cross' = minhash_lsh_cross
    over a deterministic odd/even doc_id split (odd = the "new batch",
    even = the "existing corpus"), whose output must equal the exact
    cross-parity pairs — keyed (doc_new, doc_corpus).

    One shingle-set frame (the session-shared `shared_shingle_sets`
    cache) serves all three pipelines — self-join signatures + both
    cross sides filter it — so the tokenize scan runs once for the
    whole entry AND is the same cache entry every other dedup entry in
    a gate run rides."""
    all_pairs = shared_minhash_pairs(spark, sf_dir).withColumn(
        "src", F.lit("all")
    )
    cross = shared_minhash_cross_pairs(spark, sf_dir).select(
        F.lit("cross").alias("src"),
        F.col("doc_new").alias("doc_a"),
        F.col("doc_corpus").alias("doc_b"),
        "jaccard",
    )
    # unsorted: order-insensitive gate hash (sample pass re-evaluated
    # the banding+verify join subtree)
    return all_pairs.select("src", "doc_a", "doc_b", "jaccard").unionByName(
        cross
    )


def simhash_signatures(
    docs: DataFrame, sets: DataFrame | None = None
) -> DataFrame:
    """doc_id → 64-bit SimHash sketch (one LONG) over word-3-shingle
    sets (shingles, not unigrams: unigram frequency profiles are too
    similar across documents with a shared vocabulary, collapsing
    Hamming distances).

    Bit b of the sketch is sign(Σ_s ±1 per bit b of xxhash64(s)) over
    the doc's distinct shingles — equivalently, bit b set iff
    2·p_b > n where p_b counts shingles with hash-bit b set.

    Computed Arrow-batched in the SCAN stage (mapInPandas over the
    shingle-set frame): per batch, one (total_shingles × 64) bit
    unpack, one segmented `np.add.reduceat` for all per-doc counters,
    one vectorized threshold + bit-pack. No shuffle exists before the
    banding repartition — the earlier formulation (explode + a 64-lane
    packed groupBy aggregate) paid a full shuffle of the exploded
    shingle rows plus a janino compile of the 16-sum update code that
    dominated cold start, and benchmarked slowest in the dedup family.
    Shingle hashes ride in as one Arrow list column; bit semantics use
    uint64 logical shifts, matching shiftrightunsigned exactly."""
    import numpy as np
    import pandas as pd

    if sets is None:
        sets = _shingle_sets(docs)

    shifts = np.arange(64, dtype=np.uint64)

    def sketch_batches(batches):
        for pdf in batches:
            lens = pdf["hs"].map(len).to_numpy(dtype=np.int64)
            keep = lens > 0  # shingle-less docs have no sketch (as the
            # explode formulation: zero rows -> absent from the result)
            if not keep.any():
                continue
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)[keep]
            lens = lens[keep]
            hs_list = pdf["hs"][keep].tolist()
            for blo, bhi in _doc_blocks(lens):
                blens = lens[blo:bhi]
                all_h = np.concatenate(
                    [
                        np.asarray(a, dtype=np.int64)
                        for a in hs_list[blo:bhi]
                    ]
                ).view(np.uint64)
                # (block_shingles, 64) bit matrix -> per-doc column sums
                # via ONE segmented reduction (groups are contiguous);
                # _doc_blocks bounds the matrix at ~256 MB
                bits = ((all_h[:, None] >> shifts) & np.uint64(1)).astype(
                    np.int64
                )
                starts = np.concatenate(([0], np.cumsum(blens)[:-1]))
                p = np.add.reduceat(bits, starts, axis=0)  # (docs, 64)
                bitvals = (2 * p > blens[:, None]).astype(np.uint64)
                sk = (bitvals << shifts).sum(axis=1, dtype=np.uint64)
                yield pd.DataFrame(
                    {"doc_id": ids[blo:bhi], "sketch": sk.view(np.int64)}
                )

    return sets.select("doc_id", "hs").mapInPandas(
        sketch_batches, "doc_id long, sketch long"
    )


# simhash_pairs auto budget: corpora up to this many documents get the
# recall-first wide budget (k=12 — short/noisy-sketch docs need it, and
# quadratic 5-bit buckets are harmless at this size); past it the
# SCALE-SAFE narrow budget (k=3, 16-bit chunks) is the default, because
# it is the only configuration whose in-bucket verify stays subquadratic
# as n grows (measured: 5.1× wall at 10× data under k=12 vs 1.9× under
# k=3 — PERF_r03.md). A corpus that needs wide-budget recall AT scale
# should use MinHash-LSH instead, whose candidate volume is O(n·bands)
# regardless of similarity radius.
SIMHASH_WIDE_BUDGET_MAX_DOCS = 20_000
SIMHASH_WIDE_BUDGET = 12
SIMHASH_NARROW_BUDGET = 3


def simhash_auto_budget(n_docs: int) -> int:
    """The default Hamming budget for a corpus of n_docs documents —
    wide below SIMHASH_WIDE_BUDGET_MAX_DOCS, scale-safe narrow above."""
    return (
        SIMHASH_WIDE_BUDGET
        if n_docs <= SIMHASH_WIDE_BUDGET_MAX_DOCS
        else SIMHASH_NARROW_BUDGET
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int | None = None,
    sets: DataFrame | None = None,
    n_docs: int | None = None,
    sorted_output: bool = True,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ max_hamming.

    Block-permuted candidate generation (Manku/Charikar): the 64-bit
    sketch is split into max_hamming+1 chunks; by pigeonhole, any pair
    within the Hamming budget agrees exactly on ≥1 chunk, so grouping
    on (chunk_index, chunk_value) has perfect recall — not
    probabilistic. The signature pipeline runs ONCE (no candidate
    self-join, which would evaluate it once per side); each chunk
    bucket is verified in one vectorized pandas group — a row-blocked
    byte-table popcount over the XOR matrix — so non-matching
    candidates never materialize as rows and only (doc_id, sketch)
    ever shuffles, once, keyed by bucket.

    Scale note: candidate-bucket entropy is 64/(k+1) bits, so the
    budget trades recall radius against bucket size — k=12 means 5-bit
    chunks (32 buckets/band, in-bucket verify quadratic in n), k=3
    means 16-bit chunks (65k buckets/band, bucket sizes ~n/65536,
    scales to billions of docs). `max_hamming=None` (the default)
    AUTO-SELECTS: wide budget (12) up to SIMHASH_WIDE_BUDGET_MAX_DOCS
    documents — short-doc fixtures have noisy sketches whose true
    near-dups span Hamming up to ~11, and tiny corpora can afford
    quadratic buckets — then the scale-safe narrow budget (3). Pass an
    explicit budget to override.

    ``n_docs``: corpus size for the auto-budget decision. When omitted
    the operator runs a count() job — metadata-cheap but still one
    extra job per call; a 100 TB caller that knows its corpus size
    (catalog stats, ingest ledger) passes it and the call stays
    plan-only. Ignored when max_hamming is explicit."""
    if max_hamming is None:
        max_hamming = simhash_auto_budget(
            docs.count() if n_docs is None else int(n_docs)
        )
    m = max_hamming + 1
    widths = [64 // m + (1 if i < 64 % m else 0) for i in range(m)]
    starts = [sum(widths[:i]) for i in range(m)]
    sig = simhash_signatures(docs, sets=sets)
    chunked = sig.select(
        "doc_id",
        "sketch",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("ci"),
                        F.shiftrightunsigned("sketch", starts[c])
                        .bitwiseAND(F.lit((1 << widths[c]) - 1))
                        .alias("cv"),
                    )
                    for c in range(m)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "sketch", F.col("ch.ci").alias("ci"), F.col("ch.cv").alias("cv"))
    import numpy as np
    import pandas as pd

    pop = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

    def _bucket(ids, sk, out_a, out_b, out_h):
        order = np.argsort(ids)
        ids = ids[order]
        sk = sk[order]
        # row-blocked pairwise Hamming: bounds scratch memory to
        # O(block · k) so a hot bucket can't allocate k² byte-tables
        for lo in range(0, len(ids) - 1, 1024):
            blk = sk[lo : lo + 1024]
            x = blk[:, None] ^ sk[None, :]
            ham = pop[x.view(np.uint8)].reshape(*x.shape, 8).sum(
                axis=2, dtype=np.int64
            )
            ai, bi = np.nonzero(ham <= max_hamming)
            keep = lo + ai < bi  # strict upper triangle in global index
            out_a.append(ids[lo + ai[keep]])
            out_b.append(ids[bi[keep]])
            out_h.append(ham[ai[keep], bi[keep]])

    # Partition-at-a-time, not group-at-a-time: groupBy().applyInPandas
    # pays per-GROUP Arrow/pandas overhead (~3 ms × hundreds of small
    # buckets ≈ seconds); repartitioning on the bucket key gives the
    # same co-location with ONE Python call per partition, and the
    # in-process pandas groupby costs microseconds per bucket.
    def part_verify(batches) -> "pd.DataFrame":
        frames = [p for p in batches if len(p)]
        empty = {
            "doc_a": np.array([], dtype=np.int64),
            "doc_b": np.array([], dtype=np.int64),
            "hamming": np.array([], dtype=np.int64),
        }
        if not frames:
            yield pd.DataFrame(empty)
            return
        pdf = pd.concat(frames)
        out_a, out_b, out_h = [], [], []
        for _, g in pdf.groupby(["ci", "cv"], sort=False):
            if len(g) < 2:
                continue
            _bucket(
                g["doc_id"].to_numpy(dtype=np.int64),
                g["sketch"].to_numpy(dtype=np.int64).view(np.uint64),
                out_a,
                out_b,
                out_h,
            )
        if not out_a:
            yield pd.DataFrame(empty)
            return
        yield pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        )

    out = (
        chunked.repartition("ci", "cv")
        .mapInPandas(part_verify, "doc_a long, doc_b long, hamming long")
        .distinct()
    )
    return out.orderBy("doc_a", "doc_b") if sorted_output else out


@register("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked SimHash contract (the sketch itself uses xxhash64,
    which DuckDB can't reproduce — so the CONTRACT is hashed instead):
    emit every exact-Jaccard pair (≥0.5) with a `simhash_found` flag.
    The pigeonhole banding has perfect recall within its Hamming budget
    and the whole pipeline is deterministic, so on any dataset where the
    budget captures the exact pairs the flag is provably always-true —
    regression in sketch, banding, or verify flips it to false and the
    oracle hash check fails (the reference's exact-pattern integrity
    style, tests/batch_writes.rs:18-1827).

    Both sides ride session-level memos (r9 verdict directive #2):
    the sketch/banding/verify pipeline materializes ONCE per
    (session, dataset) into the cached simhash pair table
    (shared_simhash_pairs) and the exact side reads the cached
    Jaccard pair table shared with dedup_ngram_jaccard
    (shared_exact_jaccard_pairs) — the entry's own work is a join of
    two pair-workload-sized cached tables, so a contended host can no
    longer re-run the Arrow popcount verify on every execution (the
    24.8 s contended outlier of BENCH_CONTENDED_r09)."""
    found = (
        shared_simhash_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .withColumn("simhash_found", F.lit(True))
    )
    return (
        shared_exact_jaccard_pairs(spark, sf_dir)
        .join(found, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.coalesce("simhash_found", F.lit(False)).alias("simhash_found"),
        )
    )  # unsorted: order-insensitive gate hash


_EMB_PAIR_ORACLE = """
WITH n AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::DOUBLE) AS e,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(generate_series(1, len(a.e)),
                              i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm) >= 0.4
"""


MAX_REFERENCE_ROWS = 2_000_000  # ~2M×64 float64 ≈ 1 GB broadcast ceiling


def embedding_cosine_pairs(
    spark: SparkSession,
    emb: DataFrame,
    threshold: float = 0.4,
    reference: DataFrame | None = None,
    max_reference_rows: int = MAX_REFERENCE_ROWS,
    sorted_output: bool = True,
) -> DataFrame:
    """Cosine ≥ threshold pairs via broadcast block-matmul.

    Contract: the REFERENCE side must be bounded. It is collected and
    broadcast once (≤ max_reference_rows, enforced with a loud error —
    never an unbounded driver materialization); each Arrow batch of the
    distributed probe side then does one numpy matmul against it — BLAS
    speed, no O(n²) join rows ever materialized in a shuffle. This is
    the standard block-nested-loop design for a small-vs-huge pairing
    (e.g. a benchmark-contamination blocklist vs a 100 TB corpus). For
    symmetric all-pairs dedup where NO side is bounded, use
    `embedding_lsh_pairs` — the banded-LSH scale path."""
    import numpy as np
    import pandas as pd

    ref = emb if reference is None else reference
    rows = (
        ref.select("vec_id", "embedding")
        .limit(max_reference_rows + 1)
        .collect()
    )
    if len(rows) > max_reference_rows:
        raise ValueError(
            f"reference side exceeds {max_reference_rows} rows; "
            "use embedding_lsh_pairs for unbounded all-pairs dedup"
        )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))

    def block(batches):
        b_ids, b_mat = bc.value
        for pdf in batches:
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a = np.array(list(pdf["embedding"]), dtype=np.float64)
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            sims = a @ b_mat.T
            ai, bi = np.nonzero(
                (sims >= threshold) & (a_ids[:, None] < b_ids[None, :])
            )
            yield pd.DataFrame(
                {"vec_a": a_ids[ai], "vec_b": b_ids[bi]}
            )

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField("vec_a", LongType()), StructField("vec_b", LongType())]
    )
    out = emb.select("vec_id", "embedding").mapInPandas(block, out_schema)
    return out.orderBy("vec_a", "vec_b") if sorted_output else out


@register("dedup_embedding_cosine", oracle=_EMB_PAIR_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.4; ids only, so float noise
    can't affect the hash)."""
    # unsorted: order-insensitive gate hash
    return embedding_cosine_pairs(
        spark,
        _spread(load_table(spark, sf_dir, "embeddings"), per_part_rows=64),
        sorted_output=False,
    )


N_HYPERPLANES = 64
EMB_LSH_BANDS = 16  # 16 bands × 4 planes


def embedding_lsh_pairs(
    spark: SparkSession,
    emb: DataFrame,
    threshold: float = 0.4,
    n_planes: int = N_HYPERPLANES,
    bands: int = EMB_LSH_BANDS,
    verify: str = "bucket",
    sorted_output: bool = True,
) -> DataFrame:
    """Random-hyperplane LSH near-dup pairs — the 100 TB path when no
    side fits in a broadcast (`embedding_cosine_pairs`' limit).

    Charikar sign-sketch: bit i = sign(v · r_i) for a fixed seeded
    hyperplane matrix (computed once per Arrow batch as a numpy matmul —
    vectorized, no JVM↔Python per-row cost). Candidates = pairs sharing
    any of `bands` sketch bands; recall is probabilistic
    (1-(1-p^r)^b with p = 1-θ/π), so the registered query hashes a
    containment CONTRACT against the exact operator, not raw recall.

    Two verification strategies — the choice is a shuffle-volume
    trade-off, pick per workload:

      verify="bucket" (default): group rows by (band, value) and run
        the exact cosine check INSIDE each bucket as one BLAS matmul
        (applyInPandas). Candidate pairs never exist as rows. Shuffle =
        O(n·bands·dim) — proportional to the INPUT, independent of how
        loose the threshold is. The right choice at permissive
        thresholds, where candidate volume explodes (measured 8× faster
        at the fixture's cos ≥ 0.4, where sign-LSH prunes only ~⅓ of
        the pair space).

      verify="join": enumerate candidate ids per bucket (_bucket_pairs
        — the Python sketch stage runs ONCE, not once per self-join
        side), distinct, then join embeddings back and verify with
        numpy einsum. Shuffle = O(n·bands) ids + O(candidates·dim).
        The right choice at production near-dup thresholds (cos ≥ 0.8,
        p ≈ 0.8+), where banding prunes >99% and candidates·dim ≪
        n·bands·dim.

    Skew note (bucket mode): one bucket = one pandas group; bucket size
    is bounded by band entropy (r planes → 2^r values). Hot buckets at
    loose thresholds cap at O(k²) BLAS flops, not O(k²) shuffled rows."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    r = n_planes // bands
    carry_embedding = verify == "bucket"

    def sketch(batches):
        planes = None
        for pdf in batches:
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            if planes is None:
                rng = np.random.RandomState(0xE1B)
                planes = rng.standard_normal((mat.shape[1], n_planes))
            bits = (mat @ planes) > 0  # (n, n_planes)
            out = {"vec_id": pdf["vec_id"].to_numpy(dtype=np.int64)}
            if carry_embedding:
                out["embedding"] = pdf["embedding"]
            for j in range(bands):
                band_bits = bits[:, j * r : (j + 1) * r]
                out[f"b{j}"] = band_bits @ (1 << np.arange(r, dtype=np.int64))
            yield pd.DataFrame(out)

    sk_schema = StructType(
        [StructField("vec_id", LongType())]
        + ([emb.schema["embedding"]] if carry_embedding else [])
        + [StructField(f"b{j}", LongType()) for j in range(bands)]
    )
    sk = emb.select("vec_id", "embedding").mapInPandas(sketch, sk_schema)
    band_arr = F.explode(
        F.array(
            *[
                F.struct(F.lit(j).alias("band"), F.col(f"b{j}").alias("bv"))
                for j in range(bands)
            ]
        )
    ).alias("b")

    if carry_embedding:
        bucketed = sk.select("vec_id", "embedding", band_arr).select(
            "vec_id",
            "embedding",
            F.col("b.band").alias("band"),
            F.col("b.bv").alias("bv"),
        )

        # Partition-at-a-time (see simhash_pairs): one Python call per
        # partition, pandas groupby inside — not per-bucket Arrow round
        # trips.
        def part_verify(batches):
            frames = [p for p in batches if len(p)]
            empty = {
                "vec_a": np.array([], dtype=np.int64),
                "vec_b": np.array([], dtype=np.int64),
            }
            if not frames:
                yield pd.DataFrame(empty)
                return
            pdf = pd.concat(frames)
            out_a, out_b = [], []
            for _, g in pdf.groupby(["band", "bv"], sort=False):
                if len(g) < 2:
                    continue
                ids = g["vec_id"].to_numpy(dtype=np.int64)
                order = np.argsort(ids)
                ids = ids[order]
                mat = np.array(list(g["embedding"]), dtype=np.float64)[order]
                mat /= np.linalg.norm(mat, axis=1, keepdims=True)
                ai, bi = np.nonzero(np.triu(mat @ mat.T >= threshold, k=1))
                out_a.append(ids[ai])
                out_b.append(ids[bi])
            if not out_a:
                yield pd.DataFrame(empty)
                return
            yield pd.DataFrame(
                {
                    "vec_a": np.concatenate(out_a),
                    "vec_b": np.concatenate(out_b),
                }
            )

        out = (
            bucketed.repartition("band", "bv")
            .mapInPandas(part_verify, "vec_a long, vec_b long")
            .distinct()
        )
        # sorted_output=True is the interactive-use default (COVERAGE.md
        # output-order contract); compositions that re-shuffle anyway
        # (joins, the gate's order-insensitive hash) opt out and skip
        # the global range sort
        return out.orderBy("vec_a", "vec_b") if sorted_output else out

    bucketed = sk.select("vec_id", band_arr).select(
        "vec_id", F.col("b.band").alias("band"), F.col("b.bv").alias("bv")
    )
    cand = (
        _bucket_pairs(bucketed, ["band", "bv"], F.struct("vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )
    ea = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("e_a")
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("e_b")
    )

    def pair_verify(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            va = np.array(list(pdf["e_a"]), dtype=np.float64)
            vb = np.array(list(pdf["e_b"]), dtype=np.float64)
            cos = np.einsum("ij,ij->i", va, vb) / (
                np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
            )
            keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "vec_a": pdf["vec_a"].to_numpy(dtype=np.int64)[keep],
                    "vec_b": pdf["vec_b"].to_numpy(dtype=np.int64)[keep],
                }
            )

    out_schema = StructType(
        [StructField("vec_a", LongType()), StructField("vec_b", LongType())]
    )
    out = (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", "e_a", "e_b")
        .mapInPandas(pair_verify, out_schema)
    )
    return out.orderBy("vec_a", "vec_b") if sorted_output else out


EMB_LSH_CONTRACT_COS = 0.45  # banding recall is certain here on the fixtures

_EMB_LSH_ORACLE = """
WITH n AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::DOUBLE) AS e,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, true AS lsh_found
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(generate_series(1, len(a.e)),
                              i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm) >= 0.45
"""


@register("dedup_embedding_lsh", oracle=_EMB_LSH_ORACLE)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked LSH contract (recall is probabilistic, so the
    CONTRACT is hashed, not the raw pair list): every exact cosine pair
    at ≥ 0.45 — where the seeded banding's recall is deterministic-
    certain on the fixtures — must carry lsh_found=true. The exact side
    comes from the broadcast-matmul operator, the approximate side from
    the banded sketch; a regression in either flips a flag and fails
    the hash check."""
    emb = _spread(
        load_table(spark, sf_dir, "embeddings"), per_part_rows=64
    )
    found = (
        embedding_lsh_pairs(
            spark, emb, threshold=EMB_LSH_CONTRACT_COS, sorted_output=False
        )  # feeds a join that re-shuffles anyway; the sort would be dead
        .select("vec_a", "vec_b")
        .withColumn("lsh_found", F.lit(True))
    )
    return (
        embedding_cosine_pairs(
            spark, emb, threshold=EMB_LSH_CONTRACT_COS, sorted_output=False
        )
        .join(found, ["vec_a", "vec_b"], "left")
        .select(
            "vec_a",
            "vec_b",
            F.coalesce("lsh_found", F.lit(False)).alias("lsh_found"),
        )
    )  # unsorted: order-insensitive gate hash


def _large_star(und: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): every node u connects its strictly-larger
    neighbors to the minimum of its closed neighborhood. Input/output:
    canonical undirected edges (a < b)."""
    e = und.select("a", "b").union(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    m = (
        e.groupBy("a")
        .agg(F.min("b").alias("mn"))
        .select("a", F.least("a", "mn").alias("m"))
    )
    # m ≤ a < b, so (m, b) is already canonical and never a self-loop
    return (
        e.join(m, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("m").alias("a"), "b")
        .distinct()
    )


def _small_star(und: DataFrame) -> DataFrame:
    """One small-star round: every node connects its smaller neighbors
    (and itself) to the minimum among them. Canonical (a < b) in/out."""
    m = und.groupBy("b").agg(F.min("a").alias("m"))
    e1 = (
        und.join(m, "b")
        .where(F.col("a") != F.col("m"))
        .select(F.col("m").alias("a"), F.col("a").alias("b"))
    )
    e2 = m.select(F.col("m").alias("a"), "b")
    return e1.union(e2).distinct()


def _star_components(und: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star/small-star to a fixpoint — O(log n)
    rounds even on pathological chain graphs, where plain min-label
    propagation needs O(diameter). Convergence is detected by an edge-
    multiset fingerprint (count + hash sum) staying fixed across one
    full alternation; at the fixpoint the edge set is a star forest
    centered on each component's minimum id."""
    und = und.localCheckpoint(eager=True)
    prev = None
    for _ in range(max_iter):
        und = _large_star(und).localCheckpoint(eager=True)
        und = _small_star(und).localCheckpoint(eager=True)
        fp = tuple(
            und.agg(
                F.count("*"),
                # decimal accumulator: ANSI mode forbids the long
                # overflow a plain sum of 64-bit hashes would hit
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")),
            ).collect()[0]
        )
        if fp == prev:
            break
        prev = fp
    return und


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    method: str = "propagate",
) -> DataFrame:
    """Connected components over a near-dup pair list → (id, component),
    component = the smallest id reachable from each vertex. This is the
    step that turns PAIRS into dedup CLUSTERS, from which one canonical
    representative per cluster survives.

    Iterative min-label propagation: each round every vertex adopts the
    minimum label in its closed neighborhood; converges in O(diameter)
    rounds. Near-dup graphs are overwhelmingly tiny cliques (diameter
    1-2), so the loop exits after 2-3 rounds — the driver loop is
    `count()`-gated per round exactly like GraphX/GraphFrames' Pregel
    loop, with localCheckpoint truncating the lineage so the plan does
    not grow exponentially with iterations. At web scale the same loop
    runs with edges/labels pre-partitioned on vertex id so every round
    is a co-partitioned join.

    ``method="star"`` switches to the alternating large-star/small-star
    formulation (Kiveris et al.) — O(log n) rounds on ANY graph shape,
    including pathological long chains where propagation is O(diameter).
    Same output contract; pick it when components may be deep (linked
    near-dup chains, web graphs) rather than clique-like.
    """
    if method == "star":
        und = (
            pairs.select(
                F.least(F.col(a_col), F.col(b_col)).alias("a"),
                F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        nodes = (
            pairs.select(F.col(a_col).alias("id"))
            .union(pairs.select(F.col(b_col).alias("id")))
            .distinct()
        )
        stars = _star_components(und, max_iter)
        lab = (
            stars.groupBy("b")
            .agg(F.min("a").alias("component"))
            .select(F.col("b").alias("id"), "component")
        )
        return nodes.join(lab, "id", "left").select(
            "id",
            F.coalesce("component", F.col("id")).alias("component"),
        )
    if method != "propagate":
        raise ValueError(f"unknown connected_components method: {method!r}")
    edges = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    )
    edges = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # no distinct: min-propagation is idempotent over duplicate
        # edges, and every producer in this module already emits one
        # row per (a<b) pair — a dedup here would only add a shuffle
        # materialize ONCE: every iteration joins against edges, and
        # without this the (possibly expensive) pair-producing pipeline
        # would re-execute per round per join side
        .localCheckpoint(eager=True)
    )
    # label init FUSED with the first propagation round: lab₀ =
    # min(id, min(neighbor)) comes out of one aggregate over the
    # symmetrized edges — the same shuffle the plain id-distinct init
    # would pay, but it already IS round one, so the loop below runs
    # one round fewer (min-propagation from these labels converges to
    # the identical fixpoint).
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("mn")).alias("lab"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("lab").alias("nlab"))
        )
        # old and new label meet in this one join, so the convergence
        # flag rides along and the change count reads materialized data.
        # LAZY checkpoint (r16): the count() below is the round's first
        # action and materializes the checkpoint blocks as a side
        # effect — eager=True ran a separate materialization job per
        # round before the count re-read the blocks, i.e. two driver-
        # gated jobs per round where one does the same work.
        stepped = (
            labels.join(neigh_min, labels["id"] == neigh_min["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))
                ).alias("new_lab"),
                (F.coalesce(F.col("nlab"), F.col("lab")) < F.col("lab")).alias(
                    "chg"
                ),
            )
            .localCheckpoint(eager=False)
        )
        labels = stepped.select("id", F.col("new_lab").alias("lab"))
        if stepped.where("chg").count() == 0:
            break
    return labels.select("id", F.col("lab").alias("component"))


_CLUSTER_ORACLE = _JACCARD_CTES.replace("WITH ", "WITH RECURSIVE ", 1) + """
, jpair AS (
  SELECT p.doc_a, p.doc_b
  FROM pair p
  JOIN sz sa ON sa.doc_id = p.doc_a
  JOIN sz sb ON sb.doc_id = p.doc_b
  WHERE p.inter * 1.0 / (sa.n + sb.n - p.inter) >= 0.5
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM jpair
  UNION SELECT doc_b, doc_a FROM jpair
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT id, CAST(least(id, min(dst)) AS BIGINT) AS component
FROM (SELECT src AS id, dst FROM reach) t
GROUP BY id
"""


@register("dedup_clusters", oracle=_CLUSTER_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (Jaccard ≥ 0.5) → connected components →
    (doc_id, component): the canonical-representative assignment of a
    dedup pipeline.

    The pair source is the SCALE path, minhash_lsh_pairs — banded LSH
    candidates + exact verify, O(n·bands) shuffle, no hot-shingle
    O(bucket²) stage. The exact-verify step removes all false
    POSITIVES, so LSH output ⊆ exact pairs always; equality with
    exact_jaccard_pairs additionally requires the banding to surface
    every true pair as a candidate. That recall is probabilistic in
    general — 16 bands × 4 rows gives P(candidate | j) = 1-(1-j⁴)¹⁶,
    ≈0.99 at j=0.7 but only ≈0.64 at j=0.5 — so the equality holds
    HERE because the corpus' true pairs sit near j≈0.9 (miss prob
    ~3e-8), an empirical property of the data verified per-run by
    dedup_minhash_lsh's own oracle, not a theorem. On a corpus with
    borderline-similarity pairs the LSH-sourced components can split
    where the exact closure would not; pass exact_jaccard_pairs when
    exact recall at the threshold matters more than scale. The full
    chain — sketch → bucket → verify → propagate — is hash-checked
    against DuckDB's WITH RECURSIVE transitive closure of the
    relationally-computed exact pairs: the iterative Spark propagation
    must reach the exact same fixpoint from sketch-derived edges.

    The pair source threads the session-shared cached shingle-set frame
    (`sets=`): in a 50-entry gate run the tokenize scan was ALREADY
    materialized by an earlier dedup entry, so this entry pays only the
    banding + verify + propagation — the r4 bench outlier (15.9 s vs a
    2.5 s steady capture) was this entry re-tokenizing and pinning a
    second copy of the frame mid-run. Since r10 the pair source itself
    is the session-level MATERIALIZED minhash pair table
    (shared_minhash_pairs, shared with dedup_minhash_lsh), so the
    banding + verify also run once per (session, dataset) and the CC
    iterations propagate over a cached pair-workload-sized frame."""
    pairs = shared_minhash_pairs(spark, sf_dir)
    # unsorted: order-insensitive gate hash
    return connected_components(pairs).select(
        F.col("id"), F.col("component")
    )


# ---------------------------------------------------------------------------
# Exact-substring dedup (the "long exact match" class: two documents
# sharing a verbatim run of >= W consecutive tokens — train-set
# contamination and boilerplate detection use this where set-similarity
# families miss it: a 40-token quote inside two otherwise-unrelated
# documents has near-zero Jaccard but is exactly the leakage a
# pretraining pipeline must find).


def substring_dedup_pairs(
    docs: DataFrame,
    window_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    positions: tuple[DataFrame, DataFrame] | None = None,
    sorted_output: bool = True,
) -> DataFrame:
    """Pairs of docs sharing >= 1 verbatim run of ``window_tokens``
    consecutive tokens, with the shared-window count and the LONGEST
    shared run length (in tokens) per pair.

    Columns: (doc_a, doc_b, n_shared_windows, max_run_tokens),
    doc_a < doc_b, deterministic.

    Shape — hash-banded candidates, then exact verify (the minhash /
    bloom discipline):

      1. one scan explodes each doc into its token windows as POSITIONED
         64-bit hashes (xxhash64 of the joined window) — strings are
         dropped at scan time, the explode carries ~16 B/window;
      2. one shuffle groups window hashes; only buckets holding >= 2
         distinct docs enumerate candidate pairs (_bucket_pairs);
      3. candidates verify EXACTLY: window strings are re-derived for
         candidate docs only (semi-join pushes the candidate set into
         the scan) and equi-joined on the actual string, so a 64-bit
         hash collision can never fabricate a pair;
      4. runs: shared windows at positions (ia, ib) chain along the
         diagonal d = ia - ib; a gaps-and-islands window (row_number
         over (pair, d) ordered by ia) turns each maximal chain into a
         group, and max_run_tokens = longest chain + W - 1.

    At scale the explode is corpus-token-count rows of 16 bytes — the
    same order as the tokenize pass any dedup makes — and steps 3-4
    touch only candidate docs. Ties to the reference's capability set:
    none (the reference stores opaque bytes); this is north-star
    LLM-pipeline surface (SURVEY.md §2.5).

    ``positions``: pass a precomputed _shared_window_positions result
    to share the candidate/verify subplan with a sibling operator
    (e.g. substring_dedup_dropspans over the same docs)."""
    from pyspark.sql.window import Window

    w = window_tokens
    _base, shared = positions or _shared_window_positions(
        docs, w, text_col, id_col
    )

    # 4: gaps-and-islands along each diagonal -> longest run
    diag = shared.withColumn("d", F.col("ia") - F.col("ib"))
    wnd = Window.partitionBy("doc_a", "doc_b", "d").orderBy("ia")
    runs = (
        diag.withColumn("grp", F.col("ia") - F.row_number().over(wnd))
        .groupBy("doc_a", "doc_b", "d", "grp")
        .agg(F.count("*").alias("chain"))
    )
    out = runs.groupBy("doc_a", "doc_b").agg(
        F.sum("chain").alias("n_shared_windows"),
        (F.max("chain") + F.lit(w - 1)).alias("max_run_tokens"),
    )
    return out.orderBy("doc_a", "doc_b") if sorted_output else out


def _shared_window_positions(
    docs: DataFrame,
    w: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Steps 1–3 of the exact-substring family, shared by the pair
    reporter (substring_dedup_pairs) and the span remover
    (substring_dedup_dropspans): returns (all_base, shared) where
    all_base is (doc_id, ts: normalized token array) over ALL docs
    and shared is the exactly-verified (doc_a < doc_b, ia, ib)
    positioned window matches (distinct). Callers running BOTH family
    operators over the same docs should call this once and pass the
    result via each operator's ``positions=`` parameter so the
    candidate/verify subplan is one shared tree (plan-node identity is
    what lets Spark's ReuseExchange fire).

    The tokenize scan deliberately does NOT read text.shared_doc_tokens:
    the positioned-window transform is a heavy HOF over the token
    array, and the A/B (PERF_r09 §2) measured the cached-array feed
    SLOWER than re-tokenizing (3.0 s vs 2.0 s per pass at sf0.1 —
    array<string> batch deserialization plus losing the fused
    tokenize→slice codegen), so there is no pre-tokenized input
    parameter here on purpose."""
    all_base = docs.select(
        F.col(id_col).alias("doc_id"),
            F.split(
                F.regexp_replace(
                    F.lower(F.trim(F.col(text_col))), r"\s+", " "
                ),
                " ",
            ).alias("ts"),
        )
    base = all_base.where(F.size("ts") >= w)
    # positioned windows: (doc_id, i, window-string, 64-bit window
    # hash); i is 1-based. The hash rides along so the verify join can
    # SORT on 8-byte longs instead of full window strings.
    win = (
        base.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - (w - 1)),
                    lambda i: F.array_join(F.slice("ts", i, w), " "),
                )
            ).alias("i0", "ws"),
        )
        .select("doc_id", (F.col("i0") + 1).alias("i"), "ws")
        .withColumn("wh", F.xxhash64("ws"))
    )

    # 1-2: hash-banded candidate pairs (distinct windows per doc so a
    # doc-internal repeat can't self-pair)
    hashed = win.select("doc_id", "wh").distinct()
    cand = (
        _bucket_pairs(hashed, ["wh"], F.struct("doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    # 3: exact verify on the window STRING, candidate docs only.
    # Join-strategy discipline (code-review + 100x-sweep findings):
    # forced broadcasts on the candidate frames OOM the driver on a
    # duplication-heavy corpus; UNHINTED joins let the planner
    # misestimate the exploded windows frame (stats don't survive
    # explode) and try to broadcast THAT — also OOM; and a shuffle-hash
    # self-join must hold a whole partition of window STRINGS in one
    # task's hash map — the 100x sweep blew through it. So: the
    # string-heavy self-join is SORT-MERGE (spillable — the honest
    # large×large strategy), while the id-only candidate semi-joins
    # are shuffle-hash (compact int build sides, no sort).
    cand_docs = cand.select(F.col("doc_a").alias("doc_id")).union(
        cand.select("doc_b")
    ).distinct()
    vw = win.join(cand_docs.hint("shuffle_hash"), "doc_id", "leftsemi")
    # equi-key is the 64-bit hash (compact sort keys for the SMJ); the
    # exact string check runs INSIDE the merge as a residual
    # condition over the rare hash-collision rows, so the sort-merge
    # sorts longs, never window STRINGS, while a collision still
    # can't fabricate a pair. The string check is spelled <= AND >=
    # deliberately: a plain == (or <=>) would be re-extracted into
    # the join keys by ExtractEquiJoinKeys and put the strings back
    # into the sort (verified on the executed plan — SMJ keys became
    # [ws, wh]); the inequality pair is equality the optimizer must
    # leave as a residual.
    shared = (
        vw.alias("x")
        .join(
            vw.alias("y").hint("merge"),
            (F.col("x.wh") == F.col("y.wh"))
            & (F.col("x.ws") <= F.col("y.ws"))
            & (F.col("x.ws") >= F.col("y.ws")),
        )
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .join(
            cand.hint("shuffle_hash"),
            (F.col("x.doc_id") == F.col("doc_a"))
            & (F.col("y.doc_id") == F.col("doc_b")),
            "leftsemi",
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.i").alias("ia"),
            F.col("y.i").alias("ib"),
        )
        .distinct()
    )
    return all_base, shared


def substring_dedup_dropspans(
    docs: DataFrame,
    window_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    positions: tuple[DataFrame, DataFrame] | None = None,
    sorted_output: bool = True,
) -> DataFrame:
    """Exact-substring SPAN REMOVAL — the policy half of long-exact-
    match dedup (the "deduplicating training data" recipe: when a
    verbatim ≥W-token run appears in several documents, keep ONE copy
    and cut the rest). Deterministic keep policy: a span is removed
    from a doc iff the same token run appears in some EARLIER doc
    (lower doc_id) — transitively, exactly one copy (the earliest)
    survives.

    Returns (doc_id, n_tokens, n_tokens_removed, text_clean) for
    EVERY doc, text_clean being the normalized token stream (lowered,
    whitespace-collapsed — the same normalization the matcher uses)
    with removed positions cut; docs with nothing shared pass through
    with n_tokens_removed = 0.

    Shape: reuses the banded candidate + exact verify stages
    (_shared_window_positions), then turns each diagonal island into
    a removal span [ib, ib + chain + W - 2] in the LATER doc, explodes
    spans into distinct (doc_id, pos) rows, anti-joins the positioned
    token stream, and reassembles per doc. Everything keyed and
    partial-aggregated; span explode is O(removed tokens), the token
    reassembly is the one corpus-order shuffle (same order as any
    rewrite of the corpus must pay)."""
    from pyspark.sql.window import Window

    w = window_tokens
    base, shared = positions or _shared_window_positions(
        docs, w, text_col, id_col
    )

    diag = shared.withColumn("d", F.col("ia") - F.col("ib"))
    wnd = Window.partitionBy("doc_a", "doc_b", "d").orderBy("ia")
    spans = (
        diag.withColumn("grp", F.col("ia") - F.row_number().over(wnd))
        .groupBy("doc_a", "doc_b", "d", "grp")
        .agg(F.count("*").alias("chain"), F.min("ib").alias("ib0"))
    )
    removed = (
        spans.select(
            F.col("doc_b").alias("doc_id"),
            F.explode(
                F.sequence(
                    F.col("ib0"), F.col("ib0") + F.col("chain") + F.lit(w - 2)
                )
            ).alias("pos"),
        )
        .distinct()
    )
    toks = base.select(
        "doc_id", F.posexplode("ts").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "tok")
    kept = toks.join(removed, ["doc_id", "pos"], "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("text_clean")
    )
    n_removed = removed.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens_removed")
    )
    out = (
        base.select("doc_id", F.size("ts").alias("n_tokens"))
        .join(clean, "doc_id", "left")
        .join(n_removed, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_tokens_removed", F.lit(0)).alias(
                "n_tokens_removed"
            ),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )
    # sorted_output=False (the registry entry) skips the docs-scale
    # presentation sort — the gate hash is order-insensitive
    return out.orderBy("doc_id") if sorted_output else out
