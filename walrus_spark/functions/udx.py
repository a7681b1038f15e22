"""UDAF + UDTF examples (SURVEY.md §2.6) as first-class queries.

Rules of engagement at 100 TB (enforced by the shapes used here):

 - UDAFs are *grouped-agg pandas UDFs* — Arrow ships each group's
   column as one vector, the kernel is a numpy/pandas reduction, and
   Spark still does the partial-shuffle-final aggregation dance around
   it. Never a row-at-a-time Python accumulator.
 - UDTFs (one row → many rows) run per-partition with Arrow transfer;
   they're for generators the relational algebra can't express. Plain
   tokenization COULD be `explode(split(...))` — it's used here so the
   oracle can cross-check the UDTF machinery itself; prefer the
   built-in form in production pipelines.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType

from walrus_spark.catalog import load_table
from walrus_spark.queries.registry import register


# explicit DataType, not a DDL string: string return types are parsed at
# decoration (import) time, which requires an active SparkSession
@pandas_udf(DoubleType())
def median_udaf(v: pd.Series) -> float:
    """Exact median as a grouped-agg pandas UDAF (linear-interpolated
    on even counts, matching DuckDB's `median`). Median is genuinely
    non-algebraic — unlike sum/avg it has no built-in exact form that
    avoids a full sort, so a UDAF is the honest implementation. For
    100 TB pipelines prefer `percentile_approx` (t-digest sketch,
    mergeable, bounded memory); this exact form is for the ≤ group-fits-
    in-memory regime the Arrow group transfer implies."""
    return float(v.median())


@udtf(returnType="word: string")
class SplitWords:
    """Whitespace tokenizer UDTF: one document row → one row per token.
    Stateless per-row generator, so partitions stream through it with
    no skew sensitivity beyond document length."""

    def eval(self, text: str):  # noqa: D102
        if text:
            for w in text.split():
                yield (w,)


@register(
    "udx_median_split",
    oracle="SELECT 'median' AS part, lang AS key, "
    "CAST(NULL AS VARCHAR) AS word, median(n_chars) AS med "
    "FROM documents GROUP BY lang "
    "UNION ALL SELECT 'split' AS part, CAST(doc_id AS VARCHAR) AS key, "
    "word, CAST(NULL AS DOUBLE) AS med FROM (SELECT doc_id, "
    "unnest(string_split_regex(text, '\\s+')) AS word FROM documents "
    "WHERE doc_id < 200) t WHERE word <> ''",
)
def udx_median_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom-function surface (§2.6), both machineries in one
    tagged hash-checked entry:

      part='median' — per-language exact median document length via the
        grouped-agg pandas UDAF. (Grouped-agg pandas UDFs can't share an
        `agg` with JVM aggregates — Spark plans them as a separate
        physical aggregation.)
      part='split'  — a capped slice of `documents` tokenized through
        the UDTF (capped because the oracle compares full token
        multisets; the operator itself streams any size).

    The union is column-aligned: `med` stays a native double (never
    stringified) so the hash check keeps full float sensitivity."""
    docs = load_table(spark, sf_dir, "documents")
    median_side = (
        docs.groupBy("lang")
        .agg(median_udaf("n_chars").alias("med"))
        .select(
            F.lit("median").alias("part"),
            F.col("lang").alias("key"),
            F.lit(None).cast("string").alias("word"),
            "med",
        )
    )
    spark.udtf.register("walrus_split_words", SplitWords)
    docs.where(F.col("doc_id") < 200).createOrReplaceTempView("__udtf_docs")
    split_side = spark.sql(
        "SELECT 'split' AS part, CAST(doc_id AS STRING) AS key, s.word, "
        "CAST(NULL AS DOUBLE) AS med FROM __udtf_docs, "
        "LATERAL walrus_split_words(text) AS s"
    )
    # unsorted: order-insensitive gate hash
    return median_side.unionByName(split_side)
