"""Corpus-assembly operators: the steps between "clean documents" and
"training batches" in an LLM data pipeline.

seq_packing — GPT-style sample packing: conceptually concatenate every
document's tokens in doc_id order and split the stream into fixed-size
context windows; each document is annotated with its global token
offset and the window span it lands in. The global running sum is
computed with a TWO-PHASE distributed prefix sum (per-bucket partial
sums + driver-side prefix of the tiny bucket table + per-bucket window),
NOT one global `Window.orderBy` — a global ordered window collapses to
a single task and is exactly the kind of plan that dies at 100 TB.

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

from walrus_spark.catalog import load_table

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
) -> DataFrame:
    """Assign every document its token offset in the concatenated
    corpus stream and the context windows it spans.

    Distributed prefix sum, two phases:
      1. bucket = doc_id div bucket_span; one groupBy computes each
         bucket's token sum; the driver prefix-sums that TINY table
         (n_docs / bucket_span rows — bounded metadata, size the span
         so this stays ~10⁴-10⁵ rows at target scale).
      2. a per-bucket window (partitionBy bucket — parallel across
         buckets, never a global sort) adds the within-bucket running
         sum to the broadcast bucket base.

    Output: doc_id, n_tokens, start_tok (exclusive prefix sum),
    first_window / last_window (integer div by context_window; empty
    docs occupy zero windows and report first=last=the window their
    offset falls in)."""
    d = docs.select(
        "doc_id",
        F.size(_text.tokens(F.col("text"))).alias("n_tokens"),
        (F.col("doc_id") / bucket_span).cast("long").alias("bucket"),
    )
    bucket_sums = (
        d.groupBy("bucket").agg(F.sum("n_tokens").alias("bsum")).collect()
    )
    base, bases = 0, {}
    for r in sorted(bucket_sums, key=lambda r: int(r["bucket"])):
        bases[int(r["bucket"])] = base
        base += int(r["bsum"])
    base_col = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in sorted(bases.items()) for x in kv]
        ),
        F.col("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = base_col + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        d.withColumn("start_tok", start)
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
        .orderBy("doc_id")
    )


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
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(start_tok // {CONTEXT_WINDOW} AS BIGINT) AS first_window,
       CAST((start_tok + greatest(n_tokens - 1, 0)) // {CONTEXT_WINDOW}
            AS BIGINT) AS last_window
FROM c ORDER BY doc_id
"""


@register("pipeline_seq_packing", oracle=_PACK_ORACLE)
def pipeline_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seq_packing(load_table(spark, sf_dir, "documents"))


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


_SPLIT_ORACLE = f"""
SELECT split, count(*) AS n_docs,
       CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\\s+')))
            AS BIGINT) AS n_tokens
FROM (
  SELECT text,
         CASE WHEN ((doc_id * {_SPLIT_MULT}) % {_SPLIT_MOD}) % 100 < 5
              THEN 'val' ELSE 'train' END AS split
  FROM documents
) t GROUP BY split ORDER BY split
"""


@register("pipeline_train_val_split", oracle=_SPLIT_ORACLE)
def pipeline_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split summary (docs + token budget per split) — the shape a
    training-data report wants, and a hash-stable aggregate."""
    d = train_val_split(load_table(spark, sf_dir, "documents"))
    return (
        d.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(_text.tokens(F.col("text")))).alias("n_tokens"),
        )
        .orderBy("split")
    )
