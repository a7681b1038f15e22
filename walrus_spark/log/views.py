"""Typed views over topic logs — the log→relational bridge.

The reference's payloads are opaque bytes end-to-end (SURVEY.md §1.2);
its consumers decode client-side. Our engine instead registers a
*typed view* per topic (SURVEY.md §7 stage 4): `from_json` with an
explicit schema decodes the BINARY payload into columns INSIDE the
scan stage, so Catalyst sees real columns — predicates on decoded
fields prune, projections drop the raw payload immediately, and every
relational operator (joins, windows, dedup) composes on top.

Scale notes:
 - decode is a codegen'd JVM expression (JsonToStructs), not a UDF;
 - an explicit schema is REQUIRED (no sampling inference — schema
   inference would scan 100 TB twice and freeze a possibly-wrong guess);
 - undecodable payloads yield NULL structs (PERMISSIVE) — they are kept,
   countable via `decoded IS NULL`, never dropped silently.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from walrus_spark.log.wal import WalrusLog

LOG_COLS = ("topic", "segment", "offset", "ts")


def typed_topic_view(
    log: WalrusLog, topic: str, schema: StructType | str
) -> DataFrame:
    """Decode one topic's JSON payloads into typed columns. Output is
    the log spine (segment, offset, ts) + one column per schema field;
    rows whose payload fails to decode keep NULLs in the decoded
    columns (count them with `WHERE <field> IS NULL` before trusting
    an aggregate)."""
    return (
        log.topic_df(topic)
        .select(
            "segment",
            "offset",
            "ts",
            F.from_json(
                F.col("value").cast("string"), schema
            ).alias("__decoded"),
        )
        .select("segment", "offset", "ts", "__decoded.*")
    )


def typed_log_view(
    log: WalrusLog,
    schema: StructType | str,
    topics: list[str] | None = None,
) -> DataFrame:
    """Decode MANY topics in one pass — one scan of the log, not one
    scan per topic. A per-topic `typed_topic_view` union re-reads the
    same files once per topic (Spark cannot merge N filtered subplans
    over one source); when every topic shares a payload schema — the
    common case for a homogeneous event log — this is the operator to
    use. Output = `topic` + log spine + decoded columns; an optional
    topic list becomes a pushed-down IN filter (partition/row-group
    pruning at scale)."""
    df = log.df()
    if topics is not None:
        df = df.where(F.col("topic").isin(list(topics)))
    return df.select(
        "topic",
        "segment",
        "offset",
        "ts",
        F.from_json(F.col("value").cast("string"), schema).alias("__decoded"),
    ).select("topic", "segment", "offset", "ts", "__decoded.*")


def register_topic_view(
    spark: SparkSession,
    log: WalrusLog,
    topic: str,
    schema: StructType | str,
    view_name: str | None = None,
) -> str:
    """Register the typed view in the session catalog so `spark.sql`
    queries (and the whole DQ11+ relational layer) can reference the
    topic as a table. Returns the view name."""
    name = view_name or f"topic_{topic}"
    typed_topic_view(log, topic, schema).createOrReplaceTempView(name)
    return name
