"""walrus_spark — a PySpark-native log/streaming + analytics engine.

Re-expresses the capabilities of the reference system (nubskr/walrus, a
Rust distributed WAL/message-log engine — see SURVEY.md) on idiomatic
Spark primitives, and extends it with the relational/LLM-data-pipeline
operators declared in SURVEY.md §2.5.

Layout:
  session    — tuned SparkSession factory
  catalog    — fixture table loading / view registration
  log        — WalrusLog: topic log with atomic batch append, cursors,
               segments, metadata ops (the reference's core API), plus
               typed views decoding payloads into queryable columns
  queries    — declared query surface (DQ1–DQ26 + extensions) as
               DataFrame builders with DuckDB oracle SQL
  operators  — dedup / similarity / text-analysis / multimodal ops,
               as-of join, bucketed co-located joins
  functions  — UDAF/UDTF surface (grouped-agg pandas, Python UDTF)
  streaming  — Structured Streaming plane (sources, sinks, windowed aggs)
"""

from walrus_spark.session import get_spark  # noqa: F401
from walrus_spark.log.wal import WalrusLog  # noqa: F401

__version__ = "0.1.0"
