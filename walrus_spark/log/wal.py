"""WalrusLog — the reference's embedded log API on a Spark-native layout.

Semantics mirrored from the reference (SURVEY.md §2.1-§2.2; citations
into /root/reference):

  append_for_topic / batch_append_for_topic  (src/wal/runtime/walrus_write.rs:4-18)
      → append(), batch_append(): all-or-nothing multi-entry append,
        ≤2000 entries / ≤10 GiB per batch (src/wal/config.rs:42-43).
  read_next / batch_read_for_topic           (src/wal/runtime/walrus_read.rs:24-1198)
      → read_next(), batch_read(): shared persistent per-topic cursor,
        checkpoint=True consumes, False peeks; byte budget with the
        "always ≥1 entry" rule; hard 2000-entry cap; stateless
        start_offset reads.
  ReadConsistency StrictlyAtOnce / AtLeastOnce{persist_every}
                                              (src/wal/runtime/walrus.rs:20-24)
      → cursor persisted every read vs every N reads; crash replays
        at-most `persist_every` entries (at-least-once).
  get_topic_entry_count(s) / get_topic_size   (src/wal/runtime/walrus.rs:129-178)
  mark_topic_dirty/clean + generation counter (src/wal/runtime/topic_clean.rs)
  startup_chore recovery                      (src/wal/runtime/walrus.rs:240-425)
      → recover(): rebuild per-topic high watermarks from committed data
        when the metadata sidecar is stale/missing.
  Segments (distributed-walrus/src/monitor.rs:16-24): segment =
      floor((offset-1)/max_segment_entries), assigned at append —
      the rollover analog; compact() clusters files by it.

Architecture (Spark-first, NOT a port):
  * Data: parquet files under <root>/data/, one directory per committed
    batch, files sorted by (topic, offset) so parquet row-group min/max
    stats prune both topic and offset predicates at scan time. Atomicity = manifest commit protocol —
    a batch's files are invisible until a manifest record is atomically
    renamed into <root>/manifest/ (the Delta-style txn log in miniature;
    replaces the reference's io_uring write-plan + header-zeroing
    rollback, src/wal/runtime/writer.rs:135-528 — a crashed batch simply
    never gets a manifest record).
  * Offsets: per-topic contiguous, assigned by the single writer from
    the persisted high watermark — the exact analog of the reference's
    one-leader-per-segment write fencing (distributed-walrus/src/
    bucket.rs:110-118). Reads are fully distributed Spark scans.
  * Cursors: tiny JSON sidecar written via tmp+atomic-rename, mirroring
    WalIndex's fsync+rename (src/wal/runtime/index.rs:70-83).

Driver-side state is O(topics) metadata only — no data ever passes
through the driver except the payloads handed to the embedded append API
itself (at scale, ingestion runs through walrus_spark.streaming instead).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import threading
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

LOG_SCHEMA = StructType(
    [
        StructField("topic", StringType(), False),
        StructField("segment", LongType(), False),
        StructField("offset", LongType(), False),
        StructField("value", BinaryType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

MAX_BATCH_ENTRIES = 2000  # src/wal/config.rs:42
MAX_BATCH_BYTES = 10 * 1024**3  # src/wal/config.rs:43
ENTRY_HEADER_BYTES = 256  # PREFIX_META_SIZE, src/wal/config.rs:40
DEFAULT_MAX_SEGMENT_ENTRIES = 1_000_000  # monitor.rs:16


@dataclass(frozen=True)
class ReadConsistency:
    """StrictlyAtOnce → persist_every=1; AtLeastOnce → persist_every=N."""

    persist_every: int = 1

    @classmethod
    def strictly_at_once(cls) -> "ReadConsistency":
        return cls(1)

    @classmethod
    def at_least_once(cls, persist_every: int) -> "ReadConsistency":
        return cls(max(1, persist_every))


@dataclass(frozen=True)
class FsyncSchedule:
    """Durability knob analog (src/wal/config.rs:29-34). With a
    manifest-commit protocol every commit is already durable at rename;
    kept for API parity and for tuning sidecar flush frequency."""

    milliseconds: int = 200

    @classmethod
    def sync_each(cls) -> "FsyncSchedule":
        return cls(0)


def _atomic_write_json(path: str, obj) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


class WalrusLog:
    """Embedded topic-log engine over parquet + manifest commit log."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        consistency: ReadConsistency | None = None,
        fsync: FsyncSchedule | None = None,
        max_segment_entries: int = DEFAULT_MAX_SEGMENT_ENTRIES,
    ) -> None:
        self.spark = spark
        self.root = root
        self.consistency = consistency or ReadConsistency.strictly_at_once()
        self.fsync = fsync or FsyncSchedule()
        self.max_segment_entries = max_segment_entries
        self._data_dir = os.path.join(root, "data")
        self._manifest_dir = os.path.join(root, "manifest")
        self._meta_path = os.path.join(root, "meta.json")
        self._cursor_path = os.path.join(root, "cursors.json")
        os.makedirs(self._data_dir, exist_ok=True)
        os.makedirs(self._manifest_dir, exist_ok=True)
        # volatile state hydrated from sidecars (WalIndex hydrate-once,
        # walrus_read.rs:62-92)
        self._hw: dict[str, int] = {}
        self._cursors: dict[str, int] = {}
        self._dirty: dict[str, dict] = {}
        self._unpersisted_reads: dict[str, int] = {}
        # Serializes offset assignment + manifest commit across threads —
        # the coarse-grained analog of the reference's per-key async
        # mutex (distributed-walrus/src/bucket.rs:60-118). Reads are
        # lock-free Spark scans.
        self._write_lock = threading.Lock()
        self.recover()

    @classmethod
    def for_key(
        cls, spark: SparkSession, base_root: str, key: str, **kwargs
    ) -> "WalrusLog":
        """Namespace-isolated instance (new_for_key /
        WALRUS_INSTANCE_KEY analog, src/wal/paths.rs:11-36): the key is
        sanitized to a filesystem-safe directory under base_root, so
        tenants share nothing — not data, not cursors, not metadata."""
        safe = re.sub(r"[^A-Za-z0-9._-]", "_", key) or "_"
        return cls(spark, os.path.join(base_root, safe), **kwargs)

    # ------------------------------------------------------------------
    # recovery (startup_chore analog, walrus.rs:240-425)
    # ------------------------------------------------------------------
    def recover(self) -> None:
        meta = {}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                meta = json.load(f)
        self._hw = {k: int(v) for k, v in meta.get("hw", {}).items()}
        self._dirty = meta.get("dirty", {})
        if os.path.exists(self._cursor_path):
            with open(self._cursor_path) as f:
                self._cursors = {k: int(v) for k, v in json.load(f).items()}
        else:
            self._cursors = {}
        # If a manifest was committed after the last meta flush (crash
        # window), fold the committed batches' ranges back in — manifest
        # records carry (topic, first, last), so recovery is O(#batches)
        # metadata, never a data scan.
        for rec in self._manifest_records():
            for topic, rng in rec["topics"].items():
                self._hw[topic] = max(self._hw.get(topic, 0), int(rng["last"]))

    def _manifest_records(self) -> list[dict]:
        """Committed batch records, minus any replaced by a compaction.

        A compact record lists the batch ids it `replaces`; filtering
        them here (rather than deleting their files before the compact
        commit) makes compaction crash-safe: until the compact record's
        atomic rename the old records serve reads, after it they are
        dead regardless of whether their cleanup finished."""
        recs = []
        for name in sorted(os.listdir(self._manifest_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self._manifest_dir, name)) as f:
                    recs.append(json.load(f))
        replaced = {b for r in recs for b in r.get("replaces", [])}
        return [r for r in recs if r["batch"] not in replaced]

    def _flush_meta(self) -> None:
        _atomic_write_json(
            self._meta_path, {"hw": self._hw, "dirty": self._dirty}
        )

    def _flush_cursors(self) -> None:
        _atomic_write_json(self._cursor_path, self._cursors)

    # ------------------------------------------------------------------
    # write path (O1/O2)
    # ------------------------------------------------------------------
    def append(self, topic: str, payload: bytes) -> int:
        """Append one entry; returns its offset."""
        return self.batch_append(topic, [payload])[0]

    def batch_append(self, topic: str, payloads: list[bytes]) -> tuple[int, int]:
        """Atomic all-or-nothing append; returns (first, last) offsets.

        Mirrors batch_append_for_topic limits and atomicity (writer.rs:
        135-341): the parquet files exist before the manifest rename, but
        are unreadable until it — a crash mid-write leaves no visible
        trace (the rollback-by-header-zeroing analog)."""
        if not payloads:
            raise ValueError("empty batch")
        if len(payloads) > MAX_BATCH_ENTRIES:
            raise ValueError(f"batch exceeds {MAX_BATCH_ENTRIES} entries")
        total = sum(len(p) for p in payloads)
        if total > MAX_BATCH_BYTES:
            raise ValueError(f"batch exceeds {MAX_BATCH_BYTES} bytes")
        return self.multi_append({topic: payloads})[topic]

    def multi_append(
        self, batches: dict[str, list[bytes]]
    ) -> dict[str, tuple[int, int]]:
        """Atomically append to several topics in ONE commit.

        Thread-safe: concurrent appenders serialize on the write lock,
        so offsets stay per-topic contiguous (the single-writer-per-
        segment invariant, TLA+ InvSeqOrder)."""
        with self._write_lock:
            return self._multi_append_locked(batches)

    def _multi_append_locked(
        self, batches: dict[str, list[bytes]]
    ) -> dict[str, tuple[int, int]]:
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        rows: list[Row] = []
        ranges: dict[str, tuple[int, int]] = {}
        for topic, payloads in batches.items():
            base = self._hw.get(topic, 0)
            for i, p in enumerate(payloads):
                off = base + 1 + i
                rows.append(
                    Row(
                        topic=topic,
                        segment=(off - 1) // self.max_segment_entries,
                        offset=off,
                        value=bytes(p),
                        ts=now,
                    )
                )
            ranges[topic] = (base + 1, base + len(payloads))
        batch_id = f"{len(os.listdir(self._manifest_dir)):012d}_{uuid.uuid4().hex[:8]}"
        path = os.path.join(self._data_dir, batch_id)
        df = (
            self.spark.createDataFrame(rows, LOG_SCHEMA)
            .coalesce(1)
            .sortWithinPartitions("topic", "offset")
        )
        df.write.mode("overwrite").parquet(path)
        # commit point: atomic manifest rename
        _atomic_write_json(
            os.path.join(self._manifest_dir, f"{batch_id}.json"),
            {
                "batch": batch_id,
                "path": path,
                "topics": {
                    t: {"first": r[0], "last": r[1]} for t, r in ranges.items()
                },
            },
        )
        for topic, (_, last) in ranges.items():
            self._hw[topic] = last
            self.mark_topic_dirty(topic, flush=False)
        self._flush_meta()
        return ranges

    def ingest(self, df: DataFrame, topic_col: str, payload_col: str) -> None:
        """Bulk-ingest a DataFrame as log entries (one atomic commit).

        The distributed ingestion path: offsets are assigned with a
        per-topic row_number on top of the persisted high watermark —
        one shuffle by topic, no driver data movement (SURVEY.md §7
        "monotonic offset assignment under parallelism")."""
        with self._write_lock:
            self._ingest_locked(df, topic_col, payload_col)

    def _ingest_locked(
        self, df: DataFrame, topic_col: str, payload_col: str
    ) -> None:
        from pyspark.sql.window import Window

        hw_rows = [
            Row(topic=t, _hw_base=h) for t, h in self._hw.items()
        ] or None
        w = Window.partitionBy(topic_col).orderBy(F.monotonically_increasing_id())
        staged = (
            df.select(
                F.col(topic_col).alias("topic"),
                F.col(payload_col).cast("binary").alias("value"),
            )
            .withColumn("_rn", F.row_number().over(w))
        )
        if hw_rows:
            hw_df = F.broadcast(self.spark.createDataFrame(hw_rows))
            staged = staged.join(hw_df, "topic", "left").withColumn(
                "_hw_base", F.coalesce(F.col("_hw_base"), F.lit(0))
            )
        else:
            staged = staged.withColumn("_hw_base", F.lit(0))
        staged = staged.select(
            "topic",
            ((F.col("_hw_base") + F.col("_rn") - 1) / self.max_segment_entries)
            .cast("long")
            .alias("segment"),
            (F.col("_hw_base") + F.col("_rn")).alias("offset"),
            "value",
            F.current_timestamp().alias("ts"),
        )
        batch_id = f"{len(os.listdir(self._manifest_dir)):012d}_{uuid.uuid4().hex[:8]}"
        path = os.path.join(self._data_dir, batch_id)
        staged.sortWithinPartitions("topic", "offset").write.mode(
            "overwrite"
        ).parquet(path)
        committed = self.spark.read.parquet(path)
        ranges = {
            r["topic"]: (int(r["first"]), int(r["last"]))
            for r in committed.groupBy("topic")
            .agg(F.min("offset").alias("first"), F.max("offset").alias("last"))
            .collect()
        }
        _atomic_write_json(
            os.path.join(self._manifest_dir, f"{batch_id}.json"),
            {
                "batch": batch_id,
                "path": path,
                "topics": {
                    t: {"first": r[0], "last": r[1]} for t, r in ranges.items()
                },
            },
        )
        for topic, (_, last) in ranges.items():
            self._hw[topic] = max(self._hw.get(topic, 0), last)
            self.mark_topic_dirty(topic, flush=False)
        self._flush_meta()

    # ------------------------------------------------------------------
    # read path (O3/O4)
    # ------------------------------------------------------------------
    def df(self) -> DataFrame:
        """The committed log as a DataFrame. Files are (topic, offset)-
        sorted, so topic/offset predicates prune at row-group level."""
        paths = [rec["path"] for rec in self._manifest_records()]
        if not paths:
            return self.spark.createDataFrame([], LOG_SCHEMA)
        return self.spark.read.schema(LOG_SCHEMA).parquet(*paths)

    def topic_df(self, topic: str) -> DataFrame:
        return self.df().where(F.col("topic") == topic)

    def read_next(self, topic: str, checkpoint: bool = True) -> bytes | None:
        """Next entry at the shared cursor; consume or peek
        (walrus_read.rs:24-345)."""
        out = self.batch_read(
            topic, max_bytes=1, checkpoint=checkpoint, max_entries=1
        )
        return out[0] if out else None

    def batch_read(
        self,
        topic: str,
        max_bytes: int = MAX_BATCH_BYTES,
        checkpoint: bool = True,
        start_offset: int | None = None,
        max_entries: int = MAX_BATCH_ENTRIES,
    ) -> list[bytes]:
        """Read ≤2000 entries within a payload-byte budget (always ≥1
        entry if available), from the shared cursor or a stateless
        start_offset (walrus_read.rs:368-1198).

        The scan is a distributed TakeOrdered over `offset > cursor` —
        offset and topic predicates push down to parquet (min/max row-
        group pruning), so at scale this touches only the tail files."""
        cursor = (
            int(start_offset)
            if start_offset is not None
            else self._cursors.get(topic, 0)
        )
        from pyspark.sql.window import Window

        w = Window.orderBy("offset")
        cand = (
            self.topic_df(topic)
            .where(F.col("offset") > cursor)
            .select("offset", "value")
            .orderBy("offset")
            .limit(min(max_entries, MAX_BATCH_ENTRIES))
            .withColumn("cum", F.sum(F.length("value")).over(w))
            .withColumn("rn", F.row_number().over(w))
            .where(
                (F.col("cum") <= max_bytes)
                | (F.col("rn") == 1)  # always deliver ≥1
            )
        )
        rows = cand.collect()
        if rows and checkpoint and start_offset is None:
            self._checkpoint_read(topic, int(rows[-1]["offset"]), len(rows))
        return [bytes(r["value"]) if r["value"] is not None else b"" for r in rows]

    def _checkpoint_read(self, topic: str, new_cursor: int, n_read: int) -> None:
        """Persist per ReadConsistency (should_persist, walrus_read.rs:
        347-366): every read for StrictlyAtOnce, every persist_every
        entries for AtLeastOnce (crash → bounded re-delivery)."""
        self._cursors[topic] = new_cursor
        pend = self._unpersisted_reads.get(topic, 0) + n_read
        if pend >= self.consistency.persist_every:
            self._flush_cursors()
            pend = 0
        self._unpersisted_reads[topic] = pend

    # ------------------------------------------------------------------
    # metadata ops (O9-O12, D4, high_watermark)
    # ------------------------------------------------------------------
    def high_watermark(self, topic: str) -> int:
        return self._hw.get(topic, 0)

    def topic_entry_count(self, topic: str) -> int:
        """Unconsumed entries (walrus.rs:129-135)."""
        return max(0, self._hw.get(topic, 0) - self._cursors.get(topic, 0))

    def topic_entry_counts(self) -> dict[str, int]:
        return {t: self.topic_entry_count(t) for t in sorted(self._hw)}

    def topic_size(self, topic: str, include_headers: bool = True) -> int:
        """Topic bytes = Σ payload + per-entry header analog
        (walrus.rs:144-178 counts block bytes incl 256 B headers)."""
        row = (
            self.topic_df(topic)
            .agg(
                F.coalesce(F.sum(F.length("value")), F.lit(0)).alias("b"),
                F.count("*").alias("n"),
            )
            .collect()[0]
        )
        return int(row["b"]) + (ENTRY_HEADER_BYTES * int(row["n"]) if include_headers else 0)

    def topics(self) -> list[str]:
        return sorted(self._hw)

    def state(self, topic: str) -> dict:
        """STATE analog (controller/mod.rs:189-195)."""
        hw = self._hw.get(topic, 0)
        return {
            "topic": topic,
            "high_watermark": hw,
            "current_segment": max(0, (hw - 1)) // self.max_segment_entries,
            "cursor": self._cursors.get(topic, 0),
            "unconsumed": self.topic_entry_count(topic),
            "dirty": self._dirty.get(topic, {}).get("dirty", False),
        }

    # dirty flags (O12, topic_clean.rs)
    def mark_topic_dirty(self, topic: str, flush: bool = True) -> None:
        rec = self._dirty.setdefault(topic, {"dirty": False, "gen": 0})
        rec["dirty"] = True
        rec["gen"] += 1
        if flush:
            self._flush_meta()

    def mark_topic_clean(self, topic: str) -> None:
        rec = self._dirty.setdefault(topic, {"dirty": False, "gen": 0})
        rec["dirty"] = False
        rec["gen"] += 1
        self._flush_meta()

    def topic_is_clean(self, topic: str) -> bool:
        return not self._dirty.get(topic, {}).get("dirty", False)

    # ------------------------------------------------------------------
    # maintenance (O6 reclamation / D6 rollover analogs)
    # ------------------------------------------------------------------
    def vacuum(self) -> int:
        """Delete batch dirs fully below every consumer cursor — the
        file-reclamation analog (allocator.rs:188-200): a batch is
        removable when all its topics' last offsets are consumed."""
        removed = 0
        for rec in self._manifest_records():
            if all(
                int(rng["last"]) <= self._cursors.get(t, 0)
                for t, rng in rec["topics"].items()
            ):
                shutil.rmtree(rec["path"], ignore_errors=True)
                os.remove(
                    os.path.join(self._manifest_dir, f"{rec['batch']}.json")
                )
                removed += 1
        return removed

    def compact(self, target_dir: str | None = None) -> None:
        """Rewrite committed batches into one partition-sorted layout —
        the segment-compaction analog of D6/OPTIMIZE. Produces one file
        set partitioned by (topic, segment), sorted by offset."""
        out = target_dir or os.path.join(
            self._data_dir, f"compact_{uuid.uuid4().hex[:8]}"
        )
        df = self.df()
        (
            df.repartition("topic", "segment")
            .sortWithinPartitions("topic", "offset")
            .write.mode("overwrite")
            .parquet(out)
        )
        ranges = {
            r["topic"]: (int(r["first"]), int(r["last"]))
            for r in self.spark.read.parquet(out)
            .groupBy("topic")
            .agg(F.min("offset").alias("first"), F.max("offset").alias("last"))
            .collect()
        }
        old = self._manifest_records()
        batch_id = (
            f"{len(os.listdir(self._manifest_dir)):012d}_compact_"
            f"{uuid.uuid4().hex[:8]}"
        )
        # Commit point: after this rename the old records are dead (they
        # are filtered via `replaces`), so the cleanup below is pure
        # garbage collection — a crash anywhere leaves a correct log.
        _atomic_write_json(
            os.path.join(self._manifest_dir, f"{batch_id}.json"),
            {
                "batch": batch_id,
                "path": out,
                "topics": {
                    t: {"first": r[0], "last": r[1]} for t, r in ranges.items()
                },
                "replaces": [rec["batch"] for rec in old],
            },
        )
        for rec in old:
            p = os.path.join(self._manifest_dir, f"{rec['batch']}.json")
            if os.path.exists(p):
                os.remove(p)
            shutil.rmtree(rec["path"], ignore_errors=True)
