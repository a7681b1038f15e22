#!/usr/bin/env python
"""Micro-batch cost profile for the streaming entries (r16 item 1).

Registers a StreamingQueryListener and runs the named entries; every
micro-batch's durationMs breakdown (triggerExecution, queryPlanning,
walCommit = offset-log write, commitOffsets = commit-log write,
addBatch, getBatch, latestOffset) plus state-store commit times is
captured, so the checkpoint/commit-log share of each entry's wall is
measured, not guessed (guide §1).

Usage: python tools/stream_profile.py <sf_dir> entry1 [entry2 ...]
Env:   SPARK_GRAFT_CPUS (default 32), PROFILE_REPS (default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from walrus_spark.session import get_spark  # noqa: E402


class Collector(StreamingQueryListener):
    def __init__(self) -> None:
        self.batches: list[dict] = []

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rec = {
            "query": p.name or str(p.id)[:8],
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "durationMs": dict(p.durationMs),
        }
        try:
            rec["stateOperators"] = [
                {
                    "commitTimeMs": getattr(so, "commitTimeMs", None),
                    "numStateStoreInstances": getattr(
                        so, "numStateStoreInstances", None
                    ),
                }
                for so in p.stateOperators
            ]
        except Exception:  # noqa: BLE001
            pass
        self.batches.append(rec)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    reps = int(os.environ.get("PROFILE_REPS", "2"))
    spark = get_spark(
        "walrus-stream-profile",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    from walrus_spark.queries import QUERIES

    col = Collector()
    spark.streams.addListener(col)
    out: dict = {}
    for n in names:
        runs = []
        for i in range(reps):
            col.batches = []
            t0 = time.perf_counter()
            QUERIES[n](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            # listener delivery is async; give it a beat
            time.sleep(0.5)
            runs.append(
                {"wall_sec": round(dt, 3), "batches": list(col.batches)}
            )
        out[n] = runs
    print(json.dumps(out, indent=1, default=str))


if __name__ == "__main__":
    main()
