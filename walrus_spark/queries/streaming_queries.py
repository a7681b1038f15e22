"""Streaming queries surfaced in the CORRECTNESS gate.

The streaming plane (walrus_spark.streaming) is pytest-covered, but a
driver-checked contract is stronger: these entries run REAL Structured
Streaming jobs (readStream → availableNow trigger → sink) inside a
`queries()` callable and return the sink contents as a DataFrame, so
the driver hash-compares an actual streaming execution against DuckDB
computing the same answer relationally. Any loss, duplication, window
misassignment, or decode corruption anywhere in the streaming path
flips the hash.

stream_windowed_counts — the reference has no event time at all
(SURVEY.md §2.4); this is the Spark-native windowed aggregate the
engine adds (§7 stage 3), executed as a stream and checked batch-wise.

stream_consume_once — D3/§2.4 delivery semantics: ingest the whole
events fixture into a WalrusLog (manifest commit), consume it through
the streaming reader exactly once, and hand the per-topic delivered
counts to the gate. Delivered == stored is precisely the reference's
"no loss, no duplication" test surface (tests/batch_read.rs:596,
tests/configuration.rs:18-618) in streaming form.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from walrus_spark.catalog import load_table
from walrus_spark.queries.registry import register


@register(
    "stream_windowed_counts",
    oracle="SELECT event_type, date_trunc('hour', ts) AS w, count(*) AS n "
    "FROM events GROUP BY 1,2 ORDER BY 1,2",
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts run AS A STREAM (file source,
    availableNow, complete-mode memory sink), hashed against DuckDB's
    batch aggregation — the stream and the batch must agree exactly.
    Complete mode (not append) so end-of-stream windows still inside
    the watermark are emitted too; the late-drop behavior is covered by
    tests/test_streaming.py::test_watermark_drops_late_data."""
    from walrus_spark.streaming import windowed_counts

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # the file-stream source wants a directory or glob, not a bare file
    stream = spark.readStream.schema(schema).parquet(f"{sf_dir}/events.*")
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        # plain TIMESTAMP here (not NTZ): watermarks require an event
        # time with timezone; the session is UTC so the wall-clock value
        # is identical, and the output window is cast back to NTZ below
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        # Spark 4 reads the fixture's parquet ts as TIMESTAMP_NTZ, which
        # withWatermark rejects (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE);
        # the session TZ is UTC so casting to TIMESTAMP preserves the
        # wall-clock instant, and the window start is cast back to NTZ
        # on output so the oracle schema is unchanged
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = windowed_counts(
        stream, window="1 hour", watermark="2 hours", key_col="event_type"
    )
    name = f"stream_wc_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .select(
            "event_type",
            F.col("w.start").cast("timestamp_ntz").alias("w"),
            "n",
        )
        .orderBy("event_type", "w")
    )


@register(
    "stream_consume_once",
    oracle="SELECT event_type AS topic, count(*) AS delivered "
    "FROM events GROUP BY 1 ORDER BY 1",
)
def stream_consume_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → WalrusLog.ingest → streaming consume (availableNow) →
    per-topic delivered counts. The gate's hash proves the streaming
    reader delivered every committed entry exactly once — no orphan
    dirs, no double-delivery from compaction mirrors, no gaps."""
    from walrus_spark.log import WalrusLog
    from walrus_spark.streaming import consume_stream

    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="walrus_scq_")
    delivered: dict[str, int] = {}
    try:
        log = WalrusLog(spark, os.path.join(base, "log"))
        log.ingest(
            ev.select(
                "event_type",
                F.encode(F.col("props"), "UTF-8").alias("payload"),
            ),
            topic_col="event_type",
            payload_col="payload",
        )

        def sink(batch: DataFrame, _batch_id: int) -> None:
            for r in batch.groupBy("topic").count().collect():
                delivered[r["topic"]] = (
                    delivered.get(r["topic"], 0) + int(r["count"])
                )

        q = consume_stream(
            spark, log, os.path.join(base, "ckpt"), sink
        )
        q.awaitTermination()
        log.close()  # stop the background fsync worker with the tmpdir
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return (
        spark.createDataFrame(
            sorted(delivered.items()), "topic string, delivered long"
        )
        .orderBy("topic")
    )


@register(
    "stream_dedup",
    oracle="SELECT event_id, event_type, value FROM events ORDER BY event_id",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact deduplication: the events fixture is streamed
    TWICE (a union of two identical file streams — the classic
    duplicated-delivery shape of an at-least-once upstream) through
    ``dropDuplicates(event_id)`` into an append-mode memory sink. The
    gate hashes the sink against the plain table: every event must come
    out exactly once, so the state store must have dropped exactly one
    copy of each.

    State is one entry per key with no watermark — exact forever, but
    unbounded; the production variant for time-bounded duplicate
    windows is ``dropDuplicatesWithinWatermark`` (semantics covered in
    tests/test_streaming.py), which evicts keys once the watermark
    passes. Key-hash partitioning spreads the state store across
    executors; nothing here is driver-resident."""
    from walrus_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema

    def src() -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .parquet(f"{sf_dir}/events.*")
            .select("event_id", "event_type", "value")
        )

    deduped = src().union(src()).dropDuplicates(["event_id"])
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("event_id")
