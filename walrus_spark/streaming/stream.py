"""Structured Streaming wrappers over the WalrusLog layout.

The reference's streaming semantics (SURVEY.md §2.4) map onto built-in
Structured Streaming machinery:

  consume-once shared cursor (WalIndex)  → checkpointLocation offset/commit log
  StrictlyAtOnce                          → exactly-once file sink / idempotent
                                            foreachBatch (replay-safe)
  AtLeastOnce{persist_every}              → replayable source, at-least-once
                                            foreach sink
  high_watermark (rpc.rs:17-20)           → per-batch max(offset) progress
  segment rollover (monitor.rs)           → segment column assigned in-stream
  no event-time in reference              → we ADD watermarks + windows
                                            (DQ8's streaming form)

A streaming read is `readStream` over the log's STREAM MIRROR
(<root>/stream/): a hardlinked directory per batch, created only after
the manifest commit and appearing atomically via directory rename. The
mirror is what makes streaming reads honor the manifest protocol — a
crashed uncommitted write never reaches data/'s mirror, and compaction
output (a re-pack of already-delivered entries) is never mirrored, so
each entry is stream-visible exactly once. Each micro-batch is thus an
atomic visibility step exactly like the reference's publish of
``cur_offset`` (src/wal/runtime/writer.rs:341).

Maintenance interplay: vacuum/compact retire fully-processed mirror
dirs; a stream that is mid-catch-up over files being reclaimed fails
loudly rather than duplicating or dropping (the log-retention contract).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from walrus_spark.log.wal import LOG_SCHEMA, WalrusLog


def read_log_stream(spark: SparkSession, log: WalrusLog) -> DataFrame:
    """Streaming view of a WalrusLog (all topics): lists the manifest-
    committed stream mirror, never raw data/ (see module docstring)."""
    return (
        spark.readStream.schema(LOG_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(f"{log._stream_dir}/*/")
    )


def read_topic_stream(
    spark: SparkSession, log: WalrusLog, topic: str
) -> DataFrame:
    """Streaming view of one topic (predicate prunes at the source)."""
    return read_log_stream(spark, log).where(F.col("topic") == topic)


def write_log_stream(
    df: DataFrame,
    log: WalrusLog,
    checkpoint_dir: str,
    topic_col: str = "topic",
    payload_col: str = "value",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Stream-ingest into a WalrusLog: each micro-batch is one atomic
    log commit (foreachBatch → WalrusLog.ingest), giving the reference's
    batch-append atomicity (O2). Exactly-once is real, not assumed:
    foreachBatch is at-least-once, so the (checkpoint, batch_id) txn id
    is recorded in the manifest and a replayed micro-batch is skipped —
    idempotent commit, the StrictlyAtOnce analog."""

    txn_scope = os.path.abspath(checkpoint_dir)

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        log.ingest(
            batch_df,
            topic_col=topic_col,
            payload_col=payload_col,
            txn=f"{txn_scope}#{batch_id}",
        )

    writer = (
        df.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def consume_stream(
    spark: SparkSession,
    log: WalrusLog,
    checkpoint_dir: str,
    sink: "callable",
    topic: str | None = None,
) -> StreamingQuery:
    """Consume-once delivery: the checkpointLocation IS the shared
    persistent cursor (WalIndex analog) — restarts resume after the last
    committed micro-batch with no re-delivery (StrictlyAtOnce)."""
    src = (
        read_topic_stream(spark, log, topic)
        if topic
        else read_log_stream(spark, log)
    )

    def deliver(batch_df: DataFrame, batch_id: int) -> None:
        sink(batch_df, batch_id)

    return (
        src.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "topic",
) -> DataFrame:
    """DQ8's streaming form: watermarked tumbling-window counts.
    Late data beyond the watermark is dropped; state is bounded."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"))
    )


def latest_per_key_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming dedup / latest-per-key (DQ9/DQ10 live form) via
    dropDuplicates with watermark — bounded state, no custom store."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(
        key_cols + [ts_col]
    )


def topic_stats_stream(stream: DataFrame) -> DataFrame:
    """Per-topic running (high_watermark, entries, bytes) with an
    explicit custom state store — the live form of O9–O11 and the
    WalIndex-style per-topic state the reference persists
    (src/wal/runtime/index.rs:6-14, walrus.rs:129-178).

    Implemented with `applyInPandasWithState`: state is keyed by topic,
    stored in Spark's checkpointed state store (surviving restarts the
    way WalIndex survives process crashes), and each micro-batch folds
    only its new rows into the running totals — O(batch) work, O(topics)
    state, no re-scan of history. This is the §7-stage-6 "custom state
    store" pattern; extend the same shape for consume-once cursors or
    streaming dedup keyed on content hashes."""
    import pandas as pd  # noqa: F401  (arrow batches arrive as pandas)
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "topic string, high_watermark long, entries long, bytes long"
    )
    state_schema = "hw long, entries long, bytes long"

    def update(key, pdfs, state):
        hw, n, b = (
            tuple(state.get) if state.exists else (0, 0, 0)
        )
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            hw = max(hw, int(pdf["offset"].max()))
            n += len(pdf)
            b += int(pdf["value"].map(lambda v: len(v) if v is not None else 0).sum())
        state.update((int(hw), int(n), int(b)))
        yield pd.DataFrame(
            {
                "topic": [key[0]],
                "high_watermark": [int(hw)],
                "entries": [int(n)],
                "bytes": [int(b)],
            }
        )

    return stream.groupBy("topic").applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def high_watermark_progress(query: StreamingQuery) -> dict:
    """METRICS/high-watermark analog from lastProgress."""
    p = query.lastProgress
    if not p:
        return {}
    return {
        "batchId": p.get("batchId"),
        "numInputRows": p.get("numInputRows"),
        "sources": [s.get("endOffset") for s in p.get("sources", [])],
    }
