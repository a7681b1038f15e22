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

import random

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from walrus_spark.catalog import load_table
from walrus_spark.operators.text import tokens
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

_JACCARD_ORACLE = _JACCARD_CTES + """
SELECT p.doc_a, p.doc_b,
       round(p.inter * 1.0 / (sa.n + sb.n - p.inter), 6) AS jaccard
FROM pair p
JOIN sz sa ON sa.doc_id = p.doc_a
JOIN sz sb ON sb.doc_id = p.doc_b
WHERE p.inter * 1.0 / (sa.n + sb.n - p.inter) >= 0.5
ORDER BY doc_a, doc_b
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
ORDER BY doc_a, doc_b
"""


@register(
    "dq19_near_dup_count",
    oracle="SELECT count(*) AS cnt FROM (SELECT DISTINCT lower(text) FROM documents) t",
)
def dq19(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.lower("text").alias("t"))
        .distinct()
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "dedup_exact",
    oracle="SELECT md5(lower(text)) AS fp, min(doc_id) AS canonical_id, "
    "count(*) AS n_copies FROM documents GROUP BY 1 ORDER BY canonical_id",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on content fingerprint, keep min doc_id as the
    canonical representative. One shuffle on a 128-bit key — the same
    plan at 100 TB (fingerprint first so the shuffle never carries
    document bodies)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.encode(F.lower("text"), "UTF-8")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
        .orderBy("canonical_id")
    )


def _spread(df: DataFrame) -> DataFrame:
    """Repartition tiny-file inputs across all cores before CPU-heavy
    per-row work. At production scale inputs arrive in many splits and
    this is a no-op; on single-file fixtures it's the difference between
    1 and N cores doing the tokenization."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, sh: array<string>): per-doc distinct shingle sets.

    Docs with < SHINGLE_N words are dropped: they have no set to
    sketch, and keeping them would put every tiny doc into the same
    degenerate LSH bucket (a skew bomb at 100 TB)."""
    return (
        _spread(docs)
        .select("doc_id", shingles(F.col("text")).alias("sh"))
        .where(F.size("sh") > 0)
    )


def _shingle_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, s, sh64): distinct shingles with a 64-bit hash — joins
    and minhash run on the long, never shuffling shingle strings."""
    return (
        _shingle_sets(docs)
        .select("doc_id", F.explode("sh").alias("s"))
        .withColumn("sh64", F.xxhash64("s"))
    )


def exact_jaccard_pairs(docs: DataFrame, threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Exact n-gram Jaccard pairs via shingle equi-join.

    O(Σ bucket²) in shingle frequency — fine for the exact baseline and
    as the verify stage on LSH candidates, but the standalone form does
    NOT scale to 100 TB (hot shingles blow up the join); minhash_lsh_pairs
    below is the scale path.
    """
    sh = _shingle_rows(docs).select("doc_id", "sh64")
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.sh64") == F.col("b.sh64"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pair.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@register("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_jaccard_pairs(load_table(spark, sf_dir, "documents"))


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id → 64 minhash values over word-3-shingles.

    h_i(s) = (a_i * (xxhash64(s) & 0xFFFFFFFF) + b_i) mod (2^61-1) — a
    fixed deterministic universal-hash family over the 32-bit-reduced
    hash (bounded so ANSI arithmetic never overflows). Explode + one
    partial-aggregated groupBy(doc_id): the 64 mins run inside
    whole-stage codegen with map-side combine, so the one shuffle
    carries only 64 longs per doc. (An array_min/transform formulation
    would avoid even that shuffle, but Spark evaluates higher-order
    lambdas interpreted — measured ~7× slower than this codegen'd
    aggregate.)"""
    sh = _shingle_rows(docs)
    h = F.col("sh64").bitwiseAND(F.lit(0xFFFFFFFF))
    mins = [
        F.min(F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MERSENNE_61))).alias(f"m{i}")
        for i, (a, b) in enumerate(_PERM)
    ]
    return sh.groupBy("doc_id").agg(*mins)


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified.

    signature → LSH_BANDS band hashes → self equi-join on
    (band, band_hash) → distinct candidates → exact Jaccard verify via
    array_intersect on the (distinct-shingle) arrays. Shuffle volume is
    O(n·bands) for candidates + O(candidates) for the verify — no n²
    stage anywhere.
    """
    sig = minhash_signatures(docs)
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
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sets = _shingle_sets(docs)
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@register("dedup_minhash_lsh", oracle=_JACCARD_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle = the exact-Jaccard SQL: LSH + verify must reproduce the
    exact result (recall loss would fail the hash check)."""
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id → 64-bit SimHash sketch (one LONG) over word-3-shingle
    sets (shingles, not unigrams: unigram frequency profiles are too
    similar across documents with a shared vocabulary, collapsing
    Hamming distances).

    Bit b of the sketch is sign(Σ_s ±1 per bit b of xxhash64(s)) over
    the doc's distinct shingles. One explode + ONE partial-aggregated
    groupBy(doc_id), with the 64 per-bit counters PACKED four to a long
    in 16-bit lanes: each input row projects 16 longs whose lanes hold
    bits (4j..4j+3) of the hash, and 16 plain sums accumulate all 64
    counters at once. Versus 64 separate conditional sums this shrinks
    the aggregate buffer (and its generated update/merge code, whose
    janino compile dominated cold-start) by 4×. With p_b the unpacked
    lane count and n the row count, sign(2·p_b − n) gives bit b.

    Lane capacity bounds a doc at 32767 distinct shingles (the top lane
    must stay clear of the long sign bit under ANSI sum); docs are
    capped via slice() before counting, which only affects pathological
    multi-megabyte single documents.

    The sketch long is assembled from two 32-bit halves with shift/OR so
    bit 63 never goes through ANSI `+` (which would overflow-error on
    the sign bit); each shiftleft operand is a long (int shiftleft wraps
    at bit 31)."""
    sh = (
        _shingle_sets(docs)
        .select("doc_id", F.explode(F.slice("sh", 1, 32767)).alias("s"))
        .withColumn("sh64", F.xxhash64("s"))
    )
    packed = [
        sum(
            F.shiftleft(
                F.shiftrightunsigned("sh64", 4 * j + k)
                .bitwiseAND(F.lit(1))
                .cast("long"),
                16 * k,
            )
            for k in range(4)
        ).alias(f"p{j}")
        for j in range(16)
    ]
    sums = (
        sh.select("doc_id", *packed)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            *[F.sum(f"p{j}").alias(f"p{j}") for j in range(16)],
        )
    )

    def bit(b: int) -> Column:
        j, k = b // 4, b % 4
        p = F.shiftrightunsigned(f"p{j}", 16 * k).bitwiseAND(F.lit(0xFFFF))
        return F.when(2 * p > F.col("n"), F.lit(1)).otherwise(F.lit(0)).cast(
            "long"
        )

    lo = sum(F.shiftleft(bit(b), b) for b in range(32))
    hi = sum(F.shiftleft(bit(b + 32), b) for b in range(32))
    sketch = F.shiftleft("hi", 32).bitwiseOR(F.col("lo"))
    return (
        sums.select("doc_id", lo.alias("lo"), hi.alias("hi"))
        .select("doc_id", sketch.alias("sketch"))
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 12) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ max_hamming.

    Block-permuted candidate generation (Manku/Charikar): the 64-bit
    sketch is split into max_hamming+1 chunks; by pigeonhole, any pair
    within the Hamming budget agrees exactly on ≥1 chunk, so an
    equi-join on (chunk_index, chunk_value) has perfect recall — not
    probabilistic. Hamming is then verified with one bit_count(xor) on
    the sketch, so the join carries just (doc_id, sketch).

    Scale note: candidate-bucket entropy is 64/(k+1) bits. The default
    k=12 (5-bit chunks) suits the fixtures' tiny ~50-word docs, whose
    sketches are noisy; web-scale corpora with longer documents should
    use the classic k=3 (16-bit chunks, 65k buckets/band), which keeps
    bucket sizes ~n/65536 and scales to billions of docs."""
    m = max_hamming + 1
    widths = [64 // m + (1 if i < 64 % m else 0) for i in range(m)]
    starts = [sum(widths[:i]) for i in range(m)]
    sig = simhash_signatures(docs)
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
    a, b = chunked.alias("a"), chunked.alias("b")
    ham = F.bit_count(F.col("a.sketch").bitwiseXOR(F.col("b.sketch")))
    return (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(ham <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


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
    style, tests/batch_writes.rs:18-1827)."""
    docs = load_table(spark, sf_dir, "documents")
    found = (
        simhash_pairs(docs)
        .select("doc_a", "doc_b")
        .withColumn("simhash_found", F.lit(True))
    )
    return (
        exact_jaccard_pairs(docs, JACCARD_THRESHOLD)
        .join(found, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.coalesce("simhash_found", F.lit(False)).alias("simhash_found"),
        )
        .orderBy("doc_a", "doc_b")
    )


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
ORDER BY vec_a, vec_b
"""


MAX_REFERENCE_ROWS = 2_000_000  # ~2M×64 float64 ≈ 1 GB broadcast ceiling


def embedding_cosine_pairs(
    spark: SparkSession,
    emb: DataFrame,
    threshold: float = 0.4,
    reference: DataFrame | None = None,
    max_reference_rows: int = MAX_REFERENCE_ROWS,
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
    return (
        emb.select("vec_id", "embedding")
        .mapInPandas(block, out_schema)
        .orderBy("vec_a", "vec_b")
    )


@register("dedup_embedding_cosine", oracle=_EMB_PAIR_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.4; ids only, so float noise
    can't affect the hash)."""
    return embedding_cosine_pairs(
        spark, load_table(spark, sf_dir, "embeddings")
    )


N_HYPERPLANES = 64
EMB_LSH_BANDS = 16  # 16 bands × 4 planes


def embedding_lsh_pairs(
    spark: SparkSession,
    emb: DataFrame,
    threshold: float = 0.4,
    n_planes: int = N_HYPERPLANES,
    bands: int = EMB_LSH_BANDS,
) -> DataFrame:
    """Random-hyperplane LSH near-dup pairs — the 100 TB path when no
    side fits in a broadcast (`embedding_cosine_pairs`' limit).

    Charikar sign-sketch: bit i = sign(v · r_i) for a fixed seeded
    hyperplane matrix (computed once per Arrow batch as a numpy matmul —
    vectorized, no JVM↔Python per-row cost). Candidates = pairs sharing
    any of `bands` sketch bands (equi-join on (band, value): shuffle
    O(n·bands), never O(n²)); exact cosine verification runs only on
    bucket collisions, batch-vectorized with numpy einsum. Recall is
    probabilistic (1-(1-p^r)^b with p = 1-θ/π), so this variant has no
    hash oracle — the exact operators above are the correctness baseline
    and the recall floor is tested against them.

    Candor about thresholds: at the fixture's loose cos ≥ 0.4 (θ≈66°,
    p≈0.64) sign-LSH prunes only ~⅓ of the pair space — the structure,
    not the constant, is what scales. At production near-dup thresholds
    (cos ≥ 0.8, p≈0.8+) the same banding prunes >99%."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    r = n_planes // bands

    def sketch(batches):
        planes = None
        for pdf in batches:
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            if planes is None:
                rng = np.random.RandomState(0xE1B)
                planes = rng.standard_normal((mat.shape[1], n_planes))
            bits = (mat @ planes) > 0  # (n, n_planes)
            out = {"vec_id": pdf["vec_id"].to_numpy(dtype=np.int64)}
            for j in range(bands):
                band_bits = bits[:, j * r : (j + 1) * r]
                out[f"b{j}"] = band_bits @ (1 << np.arange(r, dtype=np.int64))
            yield pd.DataFrame(out)

    sk_schema = StructType(
        [StructField("vec_id", LongType())]
        + [StructField(f"b{j}", LongType()) for j in range(bands)]
    )
    sk = emb.select("vec_id", "embedding").mapInPandas(sketch, sk_schema)
    bucketed = sk.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"), F.col(f"b{j}").alias("bv")
                    )
                    for j in range(bands)
                ]
            )
        ).alias("b"),
    ).select("vec_id", F.col("b.band").alias("band"), F.col("b.bv").alias("bv"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
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

    def verify(batches):
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
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", "e_a", "e_b")
        .mapInPandas(verify, out_schema)
        .orderBy("vec_a", "vec_b")
    )


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
ORDER BY vec_a, vec_b
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
    emb = load_table(spark, sf_dir, "embeddings")
    found = (
        embedding_lsh_pairs(spark, emb, threshold=EMB_LSH_CONTRACT_COS)
        .select("vec_a", "vec_b")
        .withColumn("lsh_found", F.lit(True))
    )
    return (
        embedding_cosine_pairs(spark, emb, threshold=EMB_LSH_CONTRACT_COS)
        .join(found, ["vec_a", "vec_b"], "left")
        .select(
            "vec_a",
            "vec_b",
            F.coalesce("lsh_found", F.lit(False)).alias("lsh_found"),
        )
        .orderBy("vec_a", "vec_b")
    )
