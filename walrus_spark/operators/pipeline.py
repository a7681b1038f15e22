"""Corpus-assembly operators: the steps between "clean documents" and
"training batches" in an LLM data pipeline.

seq_packing — GPT-style sample packing: conceptually concatenate every
document's tokens in doc_id order and split the stream into fixed-size
context windows; each document is annotated with its global token
offset and the window span it lands in. The global running sum is
computed with a TWO-PHASE distributed prefix sum (per-bucket partial
sums + a metadata-scale prefix of the tiny bucket table, broadcast-
joined back + per-bucket window), NOT one global `Window.orderBy` over
the data — a global ordered window collapses to a single task and is
exactly the kind of plan that dies at 100 TB.

train_val_split — deterministic hash split (Knuth multiplicative hash
on doc_id, mod 100): reproducible across engines, runs, and cluster
sizes; no RNG state, no sampling drift. The same arithmetic is
reproduced verbatim in the DuckDB oracle.

Both are hash-checked end-to-end by the correctness gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from walrus_spark.catalog import load_table, spread

# module reference, not a from-import: when the registry package init
# reaches this module, `text` may still be mid-initialization (it is an
# ancestor in the import chain); its attributes are resolved at call
# time instead.
from walrus_spark.operators import text as _text
from walrus_spark.queries.registry import register

CONTEXT_WINDOW = 2048  # tokens per packed training sequence
PACK_BUCKET_SPAN = 256  # doc_ids per prefix-sum bucket (see seq_packing)


def seq_packing(
    docs: DataFrame,
    context_window: int = CONTEXT_WINDOW,
    bucket_span: int = PACK_BUCKET_SPAN,
    tokens_col: str | None = None,
    sorted_output: bool = True,
) -> DataFrame:
    """Assign every document its token offset in the concatenated
    corpus stream and the context windows it spans.

    Distributed prefix sum, two phases:
      1. bucket = doc_id div bucket_span; one groupBy computes each
         bucket's token sum; an exclusive prefix over that TINY table
         (n_docs / bucket_span rows — bounded metadata, size the span
         so this stays ~10⁴-10⁵ rows at target scale) yields each
         bucket's base offset. The prefix is a single-task window over
         metadata-scale rows — the classic two-phase scan shape — and
         the bases re-enter the main plan through a BROADCAST HASH
         JOIN, never as plan literals: a 10⁵-entry literal map would
         be an O(n_buckets) expression tree (plan/codegen killer),
         while the broadcast side here is O(n_buckets) *bytes*.
      2. a per-bucket window (partitionBy bucket — parallel across
         buckets, never a global sort) adds the within-bucket running
         sum to the joined bucket base.

    Output: doc_id, n_tokens, start_tok (exclusive prefix sum),
    first_window / last_window (integer div by context_window; empty
    docs occupy zero windows and report first=last=the window their
    offset falls in).

    ``tokens_col`` names a pre-tokenized array column to count instead
    of re-tokenizing ``text`` — pass the session's cached tokenized
    frame (text.shared_doc_tokens) and the two consumers of ``d``
    below (the bucket agg and the join probe) both read the cache
    instead of regex-scanning the corpus twice; at 100 TB that frame
    is the materialized tokenized corpus a multi-operator pipeline
    persists once. ``sorted_output=False`` elides the final global
    sort for order-insensitive consumers (the gate hash; any groupBy
    downstream)."""
    n_toks = (
        F.size(F.col(tokens_col))
        if tokens_col
        else F.size(_text.tokens(F.col("text")))
    )
    d = docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        (F.col("doc_id") / bucket_span).cast("long").alias("bucket"),
    )
    bw = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = (
        d.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bsum"))
        .select(
            "bucket",
            F.coalesce(F.sum("bsum").over(bw), F.lit(0)).alias(
                "bucket_base"
            ),
        )
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("bucket_base") + F.coalesce(
        F.sum("n_tokens").over(w), F.lit(0)
    )
    out = (
        d.join(F.broadcast(bases), "bucket")
        .withColumn("start_tok", start)
        .select(
            "doc_id",
            "n_tokens",
            "start_tok",
            (F.col("start_tok") / context_window)
            .cast("long")
            .alias("first_window"),
            (
                (
                    F.col("start_tok")
                    + F.greatest(F.col("n_tokens") - 1, F.lit(0))
                )
                / context_window
            )
            .cast("long")
            .alias("last_window"),
        )
    )
    return out.orderBy("doc_id") if sorted_output else out


_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM t
)
, ct AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents WHERE length(trim(text)) > 0
), cn AS (
  SELECT doc_id, toks, len(toks) AS n FROM ct
), cc AS (
  SELECT doc_id, toks, n,
         CAST(greatest(ceil((n - 16) / 48.0), 1) AS BIGINT) AS nch
  FROM cn
), ce AS (
  SELECT doc_id, toks, n, unnest(generate_series(0, nch - 1)) AS i FROM cc
)
SELECT 'pack' AS src, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(start_tok // {CONTEXT_WINDOW} AS BIGINT) AS first_window,
       CAST((start_tok + greatest(n_tokens - 1, 0)) // {CONTEXT_WINDOW}
            AS BIGINT) AS last_window,
       CAST(NULL AS BIGINT) AS chunk_idx, CAST(NULL AS BIGINT) AS tok_start,
       CAST(NULL AS BIGINT) AS n_chunk_tokens,
       CAST(NULL AS VARCHAR) AS chunk_text
FROM c
UNION ALL
SELECT 'chunk' AS src, doc_id, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       i, i * 48, least(64, n - i * 48),
       array_to_string(toks[i * 48 + 1 : i * 48 + 64], ' ')
FROM ce
"""


@register("pipeline_seq_packing", oracle=_PACK_ORACLE)
def pipeline_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both corpus-splitting operators in one tagged entry: GPT-style
    sample packing metadata (two-phase distributed prefix sum) and
    overlapping token chunking (64-token chunks, 16 overlap — sized so
    fixture docs produce multi-chunk cases). chunk_text itself is in
    the hash, so slicing/joining/overlap arithmetic is value-checked
    verbatim."""
    # both branches read the ONE session-cached tokenized frame
    # (text.shared_doc_tokens) — the pack branch used to tokenize the
    # corpus twice (bucket agg + join probe) and the chunk branch a
    # third time; the r14 A/B numbers live in the commit/PERF_r14
    docs = _text.shared_doc_tokens(spark, sf_dir)
    pack = seq_packing(docs, tokens_col="ts", sorted_output=False).select(
        F.lit("pack").alias("src"),
        "doc_id",
        "n_tokens",
        "start_tok",
        "first_window",
        "last_window",
        F.lit(None).cast("long").alias("chunk_idx"),
        F.lit(None).cast("long").alias("tok_start"),
        F.lit(None).cast("long").alias("n_chunk_tokens"),
        F.lit(None).cast("string").alias("chunk_text"),
    )
    chunks = chunk_documents(
        docs, chunk_tokens=64, overlap=16, tokens_col="ts"
    ).select(
        F.lit("chunk").alias("src"),
        "doc_id",
        F.lit(None).cast("long").alias("n_tokens"),
        F.lit(None).cast("long").alias("start_tok"),
        F.lit(None).cast("long").alias("first_window"),
        F.lit(None).cast("long").alias("last_window"),
        F.col("chunk_idx").cast("long"),
        F.col("tok_start").cast("long"),
        F.col("n_chunk_tokens").cast("long"),
        "chunk_text",
    )
    # no final global sort: the gate hash is order-insensitive, and
    # sorting ~n_chunks rows of chunk_text strings was ~30% of the
    # entry wall at sf1 (the text_vocab sorted_output precedent)
    return pack.unionByName(chunks)


# Knuth multiplicative hash: doc_id (≤ ~2^40 at any plausible corpus
# size) × 2654435761 stays under 2^63, so ANSI BIGINT arithmetic is
# exact in both engines.
_SPLIT_MULT = 2654435761
_SPLIT_MOD = 1 << 32


def train_val_split(
    docs: DataFrame, id_col: str = "doc_id", val_pct: int = 5
) -> DataFrame:
    """Deterministic, engine-independent split assignment: bucket =
    Knuth-hash(id) mod 100, split = 'val' iff bucket < val_pct. Fully
    reproducible: re-running over a grown corpus never reassigns an
    existing id (the property RNG sampling lacks)."""
    bucket = F.pmod(
        F.pmod(F.col(id_col) * F.lit(_SPLIT_MULT), F.lit(_SPLIT_MOD)),
        F.lit(100),
    )
    return docs.withColumn(
        "split",
        F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train")),
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int = 8,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the "shuffle
    the corpus, write N shard files" step every training run wants,
    without RNG state: key = md5(seed ":" id) gives an engine-
    independent uniform ordering, shard = key's first 8 hex digits mod
    n_shards, pos = the key's rank within its shard (1-based). Adds
    ``shard`` and ``pos``; re-running with the same seed reproduces the
    exact order on any engine or cluster size.

    Scale: ONE hash shuffle on `shard`; each shard then sorts
    independently in its own task — which is the write path's natural
    unit anyway (one shard = one output file = one writer). Size
    n_shards so a shard fits a task (10⁴–10⁵ at 100 TB), exactly like
    choosing output file counts; there is never a global sort."""
    key = F.md5(
        F.encode(
            F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")),
            "UTF-8",
        )
    )
    out = df.withColumn("_shufkey", key).withColumn(
        "shard",
        F.conv(F.substring("_shufkey", 1, 8), 16, 10).cast("long")
        % n_shards,
    )
    w = Window.partitionBy("shard").orderBy("_shufkey", id_col)
    return out.withColumn("pos", F.row_number().over(w)).drop("_shufkey")


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Split documents into fixed-size token chunks with overlap — the
    pretraining/RAG chunking step. Output: one row per chunk with
    (id, chunk_idx, tok_start, n_chunk_tokens, chunk_text).

    Stride = chunk_tokens - overlap; chunk i covers tokens
    [i·stride, i·stride + chunk_tokens). Entirely JVM-side: tokenize
    once, explode a sequence of chunk indices, slice + rejoin the token
    array per chunk — no Python, no shuffle (a pure scan-stage
    flatMap; the explode multiplies rows ~n_tokens/stride-fold, which
    is the output's inherent size, not a join blow-up). Empty docs
    yield zero chunks."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    # whitespace-only text splits to [''] — treat as zero tokens so
    # empty docs yield zero chunks, not one empty chunk. tokens_col
    # (same contract as seq_packing) reads a pre-tokenized array —
    # the session cache — instead of re-running the regex scan.
    raw_toks = (
        F.col(tokens_col) if tokens_col else _text.tokens(F.col(text_col))
    )
    toks = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<string>")
    ).otherwise(raw_toks)
    d = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.size(toks).alias("_n"),
    ).withColumn(
        "_nchunks",
        # ceil((n - overlap) / stride) chunks cover every token once
        # at least; a doc shorter than one chunk still yields 1
        F.when(F.col("_n") <= 0, F.lit(0)).otherwise(
            F.greatest(
                F.ceil((F.col("_n") - F.lit(overlap)) / F.lit(stride)),
                F.lit(1),
            )
        ),
    )
    c = d.where(F.col("_nchunks") > 0).select(
        id_col,
        "_toks",
        "_n",
        F.explode(
            F.sequence(F.lit(0), F.col("_nchunks") - 1)
        ).alias("chunk_idx"),
    )
    start = c["chunk_idx"] * stride
    return c.select(
        id_col,
        "chunk_idx",
        start.alias("tok_start"),
        F.least(
            F.lit(chunk_tokens), F.col("_n") - start
        ).alias("n_chunk_tokens"),
        F.array_join(
            F.slice(F.col("_toks"), start + 1, chunk_tokens), " "
        ).alias("chunk_text"),
    )


def write_shard_files(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    seed: int = 42,
    id_col: str = "doc_id",
) -> None:
    """Materialize shuffle_shards as training shard files: one
    ``shard=N`` parquet directory per shard, rows physically ordered
    by ``pos`` (the deterministic global permutation) so a data loader
    streams each file sequentially in training order.

    Plan: ONE hash shuffle routes each shard to exactly one task
    (repartition on shard), sortWithinPartitions orders it in that
    task's spill-backed sort, and partitionBy writes the directory
    layout — no global sort, no driver involvement. At 100 TB, pick
    n_shards so one shard ≈ one task/file of a few GB, same as any
    partitioned write."""
    sharded = shuffle_shards(docs, n_shards, seed, id_col)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(out_dir)
    )


_SPLIT_ORACLE = f"""
WITH sp AS (
  SELECT text,
         CASE WHEN ((doc_id * {_SPLIT_MULT}) % {_SPLIT_MOD}) % 100 < 5
              THEN 'val' ELSE 'train' END AS split
  FROM documents
), keyed AS (
  SELECT doc_id, md5('42:' || doc_id) AS key FROM documents
), sh AS (
  SELECT doc_id, ('0x' || substring(key, 1, 8))::BIGINT % 8 AS shard, key
  FROM keyed
), pos AS (
  SELECT doc_id, shard,
         row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) AS pos
  FROM sh
), mcounts AS (
  SELECT source, count(*) AS n_total,
         CAST(1 + (CAST(substring(source, 4) AS INT) % 4) AS BIGINT)
             AS weight
  FROM documents GROUP BY 1
), mt AS (
  SELECT min(n_total // weight) AS t_base FROM mcounts
), mplan AS (
  SELECT source, n_total, weight,
         ({_SPLIT_MOD}::BIGINT * mt.t_base * weight) // n_total AS cutoff
  FROM mcounts, mt
), mkept AS (
  SELECT d.doc_id, d.source
  FROM documents d JOIN mplan p USING (source)
  WHERE (d.doc_id * {_SPLIT_MULT}) % {_SPLIT_MOD} < p.cutoff
)
SELECT 'split' AS src, split AS key, count(*) AS n_docs,
       CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\\s+')))
            AS BIGINT) AS n_tokens,
       CAST(NULL AS BIGINT) AS ord_checksum
FROM sp GROUP BY split
UNION ALL
SELECT 'shard' AS src, CAST(shard AS VARCHAR) AS key, count(*) AS n_docs,
       CAST(NULL AS BIGINT) AS n_tokens,
       CAST(sum(pos * doc_id) AS BIGINT) AS ord_checksum
FROM pos GROUP BY shard
UNION ALL
SELECT 'mix_plan' AS src, source AS key, n_total AS n_docs,
       weight AS n_tokens, cutoff AS ord_checksum
FROM mplan
UNION ALL
SELECT 'mix_kept' AS src, source AS key, count(*) AS n_docs,
       CAST(NULL AS BIGINT) AS n_tokens,
       CAST(sum(doc_id) AS BIGINT) AS ord_checksum
FROM mkept GROUP BY source
"""


@register("pipeline_split_shards", oracle=_SPLIT_ORACLE)
def pipeline_split_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged super-schema over the two deterministic-assignment
    operators: per-split doc/token budgets (train_val_split) and
    per-shard sizes plus an order checksum (shuffle_shards). The
    checksum Σ pos·doc_id pins the exact within-shard permutation —
    any divergence in hash, shard routing, or rank order flips it.

    The checksum is a GATE device, exact in int64 at fixture scale
    (pos·id ≤ ~10¹⁰ here); a 100 TB corpus would overflow it (and
    DuckDB's int128 SUM would diverge from Spark's ANSI int64 before
    that). Production consumes shuffle_shards' (shard, pos) columns
    directly — written out as shard files — never this scalar."""
    # NOT spread (r16 A/B): unlike its siblings, this entry's wall is
    # the shard-rank exchange, not the scan-stage tokenize — spreading
    # the docs read measured flat at sf1 c32 (1.09 → 1.08 s) and +10%
    # at sf0.1 (0.63 → 0.69 s, the added text-carrying exchange).
    docs = load_table(spark, sf_dir, "documents")
    split_side = (
        train_val_split(docs)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(_text.tokens(F.col("text")))).alias("n_tokens"),
        )
        .select(
            F.lit("split").alias("src"),
            F.col("split").alias("key"),
            "n_docs",
            "n_tokens",
            F.lit(None).cast("long").alias("ord_checksum"),
        )
    )
    shard_side = (
        shuffle_shards(docs)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("pos") * F.col("doc_id")).alias("ord_checksum"),
        )
        .select(
            F.lit("shard").alias("src"),
            F.col("shard").cast("string").alias("key"),
            "n_docs",
            F.lit(None).cast("long").alias("n_tokens"),
            "ord_checksum",
        )
    )
    # domain-mix branches (merged tagged entry — the registry is
    # pinned at 50): 'mix_plan' pins counts/weights/cutoffs, 'mix_kept'
    # pins the achieved per-source sizes AND the exact surviving
    # membership via the Σ doc_id checksum.
    mix_plan, mix_kept = domain_mix(docs, F.expr(_MIX_W_SQL))
    plan_side = mix_plan.select(
        F.lit("mix_plan").alias("src"),
        F.col("source").alias("key"),
        F.col("n_total").alias("n_docs"),
        F.col("weight").alias("n_tokens"),
        F.col("cutoff").alias("ord_checksum"),
    )
    kept_side = (
        mix_kept.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("ord_checksum"),
        )
        .select(
            F.lit("mix_kept").alias("src"),
            F.col("source").alias("key"),
            "n_docs",
            F.lit(None).cast("long").alias("n_tokens"),
            "ord_checksum",
        )
    )
    # unsorted: order-insensitive gate hash; presentation sort elided
    return (
        split_side.unionByName(shard_side)
        .unionByName(plan_side)
        .unionByName(kept_side)
    )


# ---------------------------------------------------------------------------
# Decontamination: n-gram overlap between the training corpus and an
# eval/benchmark set. The standard pre-training hygiene step: any train
# document sharing too many word shingles with an eval document must be
# flagged (and typically dropped) so benchmark numbers stay honest.


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    frac_threshold: float = 0.5,
    sorted_output: bool = True,
) -> DataFrame:
    """Per-train-document overlap with the eval set's shingle inventory.

    Scale shape (the asymmetry is the whole design): eval suites are
    small (10^4-10^6 docs) while train corpora are 100 TB, so the eval
    side is reduced to its DISTINCT shingle hashes (64-bit xxhash64 —
    ~8 bytes each, comfortably broadcastable) and the train side makes
    ONE pass: tokenize → explode → broadcast LEFT join against the eval
    hashes → partial-aggregated groupBy(doc_id). No shuffle ever
    carries eval data or shingle strings; the only exchange is the
    per-doc count rollup. Compare the reference's exact-pattern
    integrity checks (tests/batch_writes.rs:18) — the oracle recomputes
    the same overlap relationally over shingle strings.

    Output: one row per train doc — n_shingles, n_overlap (distinct
    shingles also present in eval), overlap_frac, contaminated flag.
    Docs with < SHINGLE_N words have no shingles: frac/flag are NULL.
    """
    from walrus_spark.operators.dedup import shingles

    ev = (
        eval_docs.select(F.explode(shingles(F.col(text_col))).alias("s"))
        .select(F.xxhash64("s").alias("ev64"))
        .distinct()
    )
    ex = (
        train.select(F.col(id_col).alias("doc_id"), shingles(F.col(text_col)).alias("sh"))
        # one generate over the projected array: the shingle regex runs
        # once per row; explode_outer keeps shingle-less docs (s NULL
        # never matches the broadcast side)
        .select("doc_id", F.size("sh").alias("n_shingles"), F.explode_outer("sh").alias("s"))
    )
    m = ex.join(F.broadcast(ev), F.xxhash64("s") == F.col("ev64"), "left")
    frac = F.col("n_overlap") / F.nullif(F.col("n_shingles"), F.lit(0))
    out = (
        m.groupBy("doc_id")
        .agg(
            F.first("n_shingles").alias("n_shingles"),
            F.sum(
                F.when(F.col("ev64").isNotNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_overlap"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_overlap",
            F.round(frac, 6).alias("overlap_frac"),
            (frac >= frac_threshold).alias("contaminated"),
        )
    )
    # sorted_output=False (the registry entry) skips the docs-scale
    # presentation sort — the gate hash is order-insensitive
    return out.orderBy("doc_id") if sorted_output else out


_DECON_ORACLE = f"""
WITH tagged AS (
  SELECT doc_id, text,
         ((doc_id * {_SPLIT_MULT}) % {_SPLIT_MOD}) % 100 < 5 AS is_eval
  FROM documents
), words AS (
  SELECT doc_id, is_eval,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
  FROM tagged
), idx AS (
  SELECT doc_id, is_eval, ws, unnest(generate_series(1, len(ws)-2)) AS i
  FROM words WHERE len(ws) >= 3
), sh AS (
  SELECT DISTINCT doc_id, is_eval,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM idx
), ev AS (
  SELECT DISTINCT s FROM sh WHERE is_eval
), tr AS (
  SELECT doc_id, count(*) AS n_shingles FROM sh WHERE NOT is_eval GROUP BY 1
), hits AS (
  SELECT t.doc_id, count(*) AS n_overlap
  FROM sh t JOIN ev USING (s) WHERE NOT t.is_eval GROUP BY 1
)
SELECT a.doc_id,
       CAST(COALESCE(t.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       round(COALESCE(h.n_overlap, 0) * 1.0
             / nullif(COALESCE(t.n_shingles, 0), 0), 6) AS overlap_frac,
       COALESCE(h.n_overlap, 0) * 1.0
           / nullif(COALESCE(t.n_shingles, 0), 0) >= 0.5 AS contaminated
FROM (SELECT doc_id FROM tagged WHERE NOT is_eval) a
LEFT JOIN tr t USING (doc_id)
LEFT JOIN hits h USING (doc_id)
"""


@register("pipeline_decontamination", oracle=_DECON_ORACLE)
def pipeline_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: the val split (same Knuth-hash arithmetic as
    train_val_split) stands in for the eval benchmark; every train doc
    is scored against it."""
    # spread: both sides shingle (tokenize + slide + explode + hash)
    # inside the scan stage; on the single-split fixture that work is
    # otherwise serial regardless of core count (guide §2.5). No-op
    # once inputs arrive in >= defaultParallelism splits.
    d = train_val_split(spread(load_table(spark, sf_dir, "documents")))
    return decontaminate(
        d.where(F.col("split") == "train").drop("split"),
        d.where(F.col("split") == "val").drop("split"),
        sorted_output=False,  # entry output is unsorted (gate hash)
    )


def stratified_sample(
    docs: DataFrame,
    stratum_col: str = "lang",
    n_per_stratum: int = 50,
    id_col: str = "doc_id",
    sorted_output: bool = True,
) -> DataFrame:
    """Deterministic exact-N sample per stratum: rank rows inside each
    stratum by the Knuth hash of their id and keep the first N. Same
    reproducibility story as train_val_split — no RNG, stable under
    corpus growth for the unsampled remainder, identical on any engine.

    Scale shape: the naive plan — row_number over
    Window.partitionBy(stratum) — sorts ENTIRE strata, and a stratum is
    one task: a billion-doc language becomes a single-task sort. Two
    phases fix that:

      1. per-stratum counts (tiny partial-agg rollup, one row per
         stratum — bounded metadata, collected like a broadcast dim);
      2. keep only rows whose hash falls below a per-stratum cutoff
         sized for ~4× the sample (binomial tail makes undershoot
         astronomically rare; an exact count-check loop doubles the
         cutoff and retries if it ever happens), THEN window-rank the
         ~4N survivors.

    The sort each stratum task does is over O(N) rows regardless of
    stratum size; everything before it is scan + partial agg. The
    result is provably identical to the full-stratum ranking: if ≥ N
    rows clear the cutoff, the N smallest hashes all do."""
    h = F.pmod(F.col(id_col) * F.lit(_SPLIT_MULT), F.lit(_SPLIT_MOD))
    hashed = docs.withColumn("_h", h)
    counts = {
        r["s"]: r["n"]
        for r in hashed.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    over = 4
    while True:
        cutoff = F.create_map(
            *[
                x
                for s, n in sorted(counts.items())
                for x in (
                    F.lit(s),
                    F.lit(
                        min(
                            _SPLIT_MOD,
                            (_SPLIT_MOD * n_per_stratum * over) // max(n, 1) + 1,
                        )
                    ),
                )
            ]
        )
        surv = hashed.where(F.col("_h") < cutoff[F.col(stratum_col)])
        got = {
            r["s"]: r["n"]
            for r in surv.groupBy(F.col(stratum_col).alias("s"))
            .agg(F.count("*").alias("n"))
            .collect()
        }
        if all(
            got.get(s, 0) >= min(n_per_stratum, n) for s, n in counts.items()
        ):
            break
        over *= 2  # unreachable in practice; exactness guard
    w = Window.partitionBy(stratum_col).orderBy("_h", id_col)
    out = (
        surv.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_per_stratum)
        .select(id_col, stratum_col, F.col("rn").cast("long").alias("rn"))
    )
    # sorted_output=True is the interactive default; the registry
    # entry opts out (order-insensitive gate hash, 5d25d5e contract)
    return out.orderBy(stratum_col, "rn") if sorted_output else out


_STRAT_ORACLE = f"""
SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * {_SPLIT_MULT}) % {_SPLIT_MOD}, doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 50
"""


@register("pipeline_stratified_sample", oracle=_STRAT_ORACLE)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unsorted: order-insensitive gate hash (oracle ORDER BY dropped
    # symmetrically — the 5d25d5e elision contract)
    return stratified_sample(
        load_table(spark, sf_dir, "documents"), sorted_output=False
    )


def corpus_filter(
    docs: DataFrame,
    min_tokens: int = 10,
    max_punct_ratio: float = 0.2,
    max_dup_word_frac: float = 0.3,
    semantic_drop: DataFrame | None = None,
) -> DataFrame:
    """The end-to-end "clean corpus" step: compose the quality /
    repetition / exact-dedup filters into one keep-set — the pipeline a
    pre-training run actually executes over raw documents.

    Kept = canonical copy (smallest doc_id per md5 fingerprint) AND
    token count ≥ min_tokens AND punctuation density ≤ max_punct_ratio
    AND duplicate-word fraction ≤ max_dup_word_frac AND (optionally)
    NOT in ``semantic_drop`` — the SemDeDup prune set
    (similarity.semantic_dedup's kept=false ids, mapped to this
    corpus's doc_id), composed as a broadcast ANTI-join: the DROP side
    is the small one (semantic dedup prunes a minority of a corpus),
    so the semantic conjunct adds zero exchanges at 100 TB where a
    semi-join on the (huge) keep side would shuffle the world.

    Scale shape: ONE scan computes every per-doc signal (tokens, punct,
    dup-word fraction, fingerprint — all codegen expressions), and
    canonical election is a min-over-fingerprint window, so the ENTIRE
    pipeline is exactly one exchange (hash partition on the 128-bit
    fingerprint; fp groups are duplicate clusters — tiny — so no skew),
    asserted in tests. No signal is recomputed per filter, no text ever
    shuffles (the fingerprint is hashed before the exchange). The
    groupBy-then-semi-join alternative re-shuffles both sides on doc_id
    for the join — two more exchanges for the same answer."""
    from pyspark.sql.window import Window

    from walrus_spark.operators.text import tokens

    ws = tokens(F.col("text"))
    # empty text is legal input here (upstream span removal can empty
    # a doc entirely). Two guards: split('') yields [''] so a blank
    # doc would otherwise report the phantom n_tokens=1 and survive
    # min_tokens=1 with a fabricated token; and under ANSI mode the
    # punct ratio's division by length(text)=0 would kill the whole
    # pipeline on one such doc.
    blank = F.length(F.trim("text")) == 0
    sig = docs.select(
        "doc_id",
        F.when(blank, F.lit(0)).otherwise(F.size(ws)).alias("n_tokens"),
        F.when(blank, F.lit(0))
        .otherwise(F.size(F.array_distinct(ws)))
        .alias("n_distinct"),
        F.round(
            F.when(
                F.length("text") > 0,
                F.length(
                    F.regexp_replace(F.col("text"), r"[^.,;:!?]", "")
                )
                / F.length("text"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("punct_ratio"),
        F.md5(F.encode(F.lower("text"), "UTF-8")).alias("fp"),
    )
    is_canonical = (
        F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")) == 1
    )
    # same zero-token guard as punct_ratio (ANSI divide-by-zero)
    dup_frac = F.round(
        F.when(
            F.col("n_tokens") > 0,
            1 - F.col("n_distinct") / F.col("n_tokens"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    out = (
        sig.withColumn("_canon", is_canonical)
        .where(
            F.col("_canon")
            & (F.col("n_tokens") >= min_tokens)
            & (F.col("punct_ratio") <= max_punct_ratio)
            & (dup_frac <= max_dup_word_frac)
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "punct_ratio",
            dup_frac.alias("dup_word_frac"),
        )
    )
    if semantic_drop is not None:
        out = out.join(
            F.broadcast(semantic_drop.select("doc_id").distinct()),
            "doc_id",
            "left_anti",
        )
    return out


# The 'semantic' branch oracle re-derives the SemDeDup prune set
# RELATIONALLY — the same quantized k-means chain sim_ann_ivf's
# 'semdedup' branch already proves (integer Lloyd, k=8, 2 rounds,
# first-8 seeding), then the within-cluster exact-cosine drop set —
# so the composed keep-set is hash-checked end to end, not just the
# base conjuncts (r12 verdict directive #5).
_FILTER_ORACLE = """
WITH s AS (
  SELECT doc_id,
         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens,
         len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')))
             AS n_distinct,
         round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0
               / length(text), 6) AS punct_ratio,
         md5(lower(text)) AS fp
  FROM documents
), canon AS (
  SELECT min(doc_id) AS doc_id FROM s GROUP BY fp
), filt AS (
  SELECT s.doc_id, CAST(s.n_tokens AS BIGINT) AS n_tokens, s.punct_ratio,
         round(1 - s.n_distinct * 1.0 / s.n_tokens, 6) AS dup_word_frac
  FROM s JOIN canon USING (doc_id)
  WHERE s.n_tokens >= 10 AND s.punct_ratio <= 0.2
    AND round(1 - s.n_distinct * 1.0 / s.n_tokens, 6) <= 0.3
), nrm AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::DOUBLE) AS v,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
             AS nv
  FROM embeddings
), kq AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(x::DOUBLE * 1000, 0) AS BIGINT) + 10000) AS qv
  FROM embeddings
), km0 AS (
  SELECT vec_id AS cluster, qv AS m FROM kq ORDER BY vec_id LIMIT 8
), ka1 AS (
  SELECT vec_id, cluster FROM (
    SELECT kq.vec_id, km0.cluster,
           row_number() OVER (PARTITION BY kq.vec_id ORDER BY
             list_sum(list_transform(generate_series(1, len(kq.qv)),
               i -> (kq.qv[i] - km0.m[i]) * (kq.qv[i] - km0.m[i]))),
             km0.cluster) AS rn
    FROM kq CROSS JOIN km0
  ) t WHERE rn = 1
), ku1 AS (
  SELECT a.cluster, i.i AS dim_i, count(*) AS n, sum(kq.qv[i.i]) AS s
  FROM ka1 a JOIN kq USING (vec_id)
  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) i
  GROUP BY 1, 2
), km1 AS (
  SELECT cluster,
         array_agg(CAST((2*s + n) // (2*n) AS BIGINT) ORDER BY dim_i) AS m
  FROM ku1 GROUP BY 1
), ka2 AS (
  SELECT vec_id, cluster FROM (
    SELECT kq.vec_id, km1.cluster,
           row_number() OVER (PARTITION BY kq.vec_id ORDER BY
             list_sum(list_transform(generate_series(1, len(kq.qv)),
               i -> (kq.qv[i] - km1.m[i]) * (kq.qv[i] - km1.m[i]))),
             km1.cluster) AS rn
    FROM kq CROSS JOIN km1
  ) t WHERE rn = 1
), ku2 AS (
  SELECT a.cluster, i.i AS dim_i, count(*) AS n, sum(kq.qv[i.i]) AS s
  FROM ka2 a JOIN kq USING (vec_id)
  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) i
  GROUP BY 1, 2
), km2 AS (
  SELECT cluster,
         array_agg(CAST((2*s + n) // (2*n) AS BIGINT) ORDER BY dim_i) AS m
  FROM ku2 GROUP BY 1
), ka3 AS (
  SELECT vec_id, cluster FROM (
    SELECT kq.vec_id, km2.cluster,
           row_number() OVER (PARTITION BY kq.vec_id ORDER BY
             list_sum(list_transform(generate_series(1, len(kq.qv)),
               i -> (kq.qv[i] - km2.m[i]) * (kq.qv[i] - km2.m[i]))),
             km2.cluster) AS rn
    FROM kq CROSS JOIN km2
  ) t WHERE rn = 1
), sdd AS (
  SELECT DISTINCT a.vec_id
  FROM ka3 a JOIN ka3 b USING (cluster)
  JOIN nrm na ON na.vec_id = a.vec_id
  JOIN nrm nb ON nb.vec_id = b.vec_id
  WHERE b.vec_id < a.vec_id
    AND list_sum(list_transform(generate_series(1, len(na.v)),
                 i -> na.v[i] * nb.v[i])) / (na.nv * nb.nv) >= 0.4
)
SELECT 'base' AS src, doc_id, n_tokens, punct_ratio, dup_word_frac
FROM filt
UNION ALL
SELECT 'semantic', f.doc_id, f.n_tokens, f.punct_ratio, f.dup_word_frac
FROM filt f WHERE NOT EXISTS (SELECT 1 FROM sdd WHERE sdd.vec_id = f.doc_id)
"""


@register("pipeline_corpus_filter", oracle=_FILTER_ORACLE)
def pipeline_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry, tagged (merged — registry pinned at 50):

    'base' rows: the composed quality/repetition/exact-dedup keep-set,
    hash-checked signal-by-signal (any drift in tokenization, punct
    counting, dup-word math, fingerprinting, or canonical election
    flips the hash).
    'semantic' rows (r12): the SAME keep-set with the SemDeDup
    semantic_drop conjunct applied — the prune set comes from
    semantic_dedup over the aligned embeddings table (vec_id and
    doc_id share the fixture id space, standing in for the
    embedding-per-document join a production pipeline has), reusing
    the session's fitted quantizer (shared_kmeans_fit) and composed
    as the broadcast anti-join corpus_filter documents. The oracle
    recomputes the prune set relationally, so the conjunct's exact
    membership is hash-checked, not just its row count."""
    from walrus_spark.operators.similarity import (
        semantic_dedup,
        shared_kmeans_fit,
    )

    # spread: corpus_filter computes every per-doc signal (tokenize,
    # array_distinct, punct regex, md5 fingerprint) in the scan stage;
    # single-split fixture → single task without it (guide §2.5).
    # Canonical election is unaffected (row_number orders by doc_id
    # within each fp partition — partition-layout independent).
    docs = spread(load_table(spark, sf_dir, "documents"))
    base = corpus_filter(docs)
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _state = shared_kmeans_fit(spark, sf_dir, emb)
    sem_drop = (
        semantic_dedup(spark, emb, assigned=assigned)
        .where(~F.col("kept"))
        .select(F.col("vec_id").alias("doc_id"))
        .distinct()
        .withColumn("_sem_dropped", F.lit(True))
    )
    # ONE pass over the base keep-set (a union of base and
    # base-anti-join-drop would scan documents and run the canonical-
    # election exchange twice): a broadcast LEFT join marks prune-set
    # membership, and exploding the tag array emits each row as
    # 'base' always plus 'semantic' iff it survives the conjunct —
    # identical rows to corpus_filter(docs, semantic_drop=sem_drop)
    # for the semantic branch, zero added corpus-scale exchanges.
    return (
        base.join(F.broadcast(sem_drop), "doc_id", "left")
        .select(
            F.explode(
                F.when(
                    F.col("_sem_dropped").isNotNull(),
                    F.array(F.lit("base")),
                ).otherwise(F.array(F.lit("base"), F.lit("semantic")))
            ).alias("src"),
            "doc_id",
            "n_tokens",
            "punct_ratio",
            "dup_word_frac",
        )
    )  # unsorted: order-insensitive gate hash; docs-scale sort elided


# ---------------------------------------------------------------------------
# Domain mixing: deterministic proportional downsampling so the output
# corpus matches target per-source weights — the "data mixture" step
# every pre-training run executes (web 50% / books 20% / code 30%...).


def domain_mix(
    docs: DataFrame,
    weight_col: Column,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """(plan, kept) for hash-cutoff downsampling to a target mixture.

    ``weight_col`` gives each source's UNNORMALIZED target weight (any
    positive integers — only ratios matter). The feasible scale is set
    by the scarcest source: t_base = min_s floor(n_s / w_s); each
    source keeps ~t_base * w_s docs via the same Knuth multiplicative
    hash cutoff the train/val split uses — keep doc iff
    (doc_id * 2654435761) mod 2^32 < floor(2^32 * t_base * w_s / n_s).
    Deterministic (re-runs and engine-independent re-implementations
    agree doc-for-doc), stable under reordering, and growing a source
    only widens its cutoff monotonically.

    Scale shape: per-source counts are a tiny partial-aggregated
    groupBy; the global min and the cutoffs live in a frame of
    #sources rows that BROADCAST-joins back to the corpus — one corpus
    scan, zero shuffles of document rows, no driver collect, no
    literal plan constants. Cutoff arithmetic is int64:
    2^32 * t_base * w must stay < 2^63 (t_base*w < 2^31 ≈ 2.1e9 docs
    per source); past that, swap the multiply to decimal(38,0) — the
    comparison side is unchanged.

    Returns ``plan`` = (source, n_total, weight, cutoff) and ``kept`` =
    the surviving (id, source) rows."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")
    )
    counts = (
        base.groupBy("source")
        .agg(F.count("*").alias("n_total"))
        .withColumn("weight", weight_col.cast("long"))
    )
    t = counts.agg(
        F.min(F.expr("n_total DIV weight")).alias("t_base")
    )
    plan = counts.crossJoin(F.broadcast(t)).select(
        "source",
        "n_total",
        "weight",
        F.expr(
            f"(CAST({_SPLIT_MOD} AS BIGINT) * t_base * weight) DIV n_total"
        ).alias("cutoff"),
    )
    kept = base.join(F.broadcast(plan), "source").where(
        F.pmod(F.col("doc_id") * F.lit(_SPLIT_MULT), F.lit(_SPLIT_MOD))
        < F.col("cutoff")
    )
    return plan, kept


# weight derived from the source name itself (src0→1, src1→2, src2→3,
# src3→4, src4→1, ...) so both engines compute it from data, not a map
_MIX_W_SQL = "1 + (CAST(substring(source, 4) AS INT) % 4)"



# ---------------------------------------------------------------------------
# Distribution-matched resampling: reshape a corpus so a numeric
# column's histogram matches target per-bin weights — length-balancing
# a pre-training mix, matching a reference corpus's length profile,
# flattening a skewed source. Composes the fixed-grid histogram sketch
# (operators/sketch.py) with the domain_mix hash-cutoff machinery.


def distribution_matched_sample(
    docs: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int,
    target: dict[int, int] | None = None,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """(plan, kept): downsample so ``value_col``'s histogram matches
    ``target`` (bin -> unnormalized weight; default: uniform over the
    corpus's occupied bins, i.e. flatten the distribution).

    Mechanics: bin on the declared grid (clamped, identical to
    histogram_registers), count per bin (one partial-aggregated
    groupBy), then compute per-bin hash cutoffs from the EXACT
    rational feasible scale s = min_b count_b / target_b on the
    driver — the count table is <= nbins rows of bounded metadata (the
    k-means-update contract) and Fraction arithmetic avoids both
    overflow and float drift. Keep doc iff
    (id * 2654435761) mod 2^32 < floor(2^32 * s * t_b / c_b).
    Deterministic, engine-independent, one corpus scan; the cutoffs
    re-enter via a broadcast join, never literals.

    Returns plan = (bin, n_total, weight, cutoff) and kept = the
    surviving rows of ``docs`` (all original columns)."""
    from fractions import Fraction

    width = (hi - lo) / nbins
    b = (
        F.least(
            F.greatest(
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
                F.lit(0),
            ),
            F.lit(nbins - 1),
        )
        .cast("long")
        .alias("__dms_bin")
    )
    if "__dms_bin" in docs.columns:
        raise ValueError("docs already has a __dms_bin column")
    binned = docs.withColumn("__dms_bin", b)
    counts = {
        int(r["__dms_bin"]): int(r["n"])
        for r in binned.groupBy("__dms_bin")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    tgt = target if target is not None else {bn: 1 for bn in counts}
    # Degrade loudly (the module convention): an explicit target that
    # asks for a bin the corpus cannot supply would otherwise silently
    # fall out of the feasible-scale computation and the achieved
    # histogram would deviate from the request with no error.
    infeasible = sorted(
        bn for bn, w in tgt.items() if w > 0 and not counts.get(bn)
    )
    if infeasible:
        raise ValueError(
            "distribution_matched_sample: target requests bins with no "
            f"available rows: {infeasible}"
        )
    occupied = [bn for bn, w in sorted(tgt.items()) if w > 0]
    if not occupied:
        raise ValueError("no occupied target bins")
    s = min(Fraction(counts[bn], tgt[bn]) for bn in occupied)
    plan_rows = []
    for bn in occupied:
        cutoff = (_SPLIT_MOD * s * tgt[bn]) // counts[bn]  # exact Fraction
        plan_rows.append((bn, counts[bn], tgt[bn], int(cutoff)))
    plan = docs.sparkSession.createDataFrame(
        plan_rows, "__dms_bin long, n_total long, weight long, cutoff long"
    )
    kept = (
        binned.join(F.broadcast(plan), "__dms_bin")
        .where(
            F.pmod(F.col(id_col) * F.lit(_SPLIT_MULT), F.lit(_SPLIT_MOD))
            < F.col("cutoff")
        )
        # the contract is "the surviving rows of docs, all original
        # columns" — internal plumbing columns must not leak
        .drop("n_total", "weight", "cutoff", "__dms_bin")
    )
    return plan.withColumnRenamed("__dms_bin", "bin"), kept
