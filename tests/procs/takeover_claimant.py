"""Process B of the multi-process takeover e2e (r5 directive #1).

Opens a WalrusLog on the SAME root as the running writer process A —
the constructor claims writership under the flock fence
(wal.py _claim_writership), which atomically fences A — then continues
appending where A's committed history ends, and dumps the final store
for the parent's invariants check (offsets contiguous, nothing lost or
duplicated: the InvSeqOrder analog,
distributed-walrus/spec/DistributedWalrus.tla:174-177).

Protocol with the parent test:
  <rv>/b_result.json — {"ranges": [[first,last],...], "hw": int,
                        "entries": [[offset, payload-as-utf8], ...]}
"""

from __future__ import annotations

import json
import os
import sys


def _atomic(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def main() -> None:
    root, rv = sys.argv[1], sys.argv[2]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("takeover-claimant-b")
        .getOrCreate()
    )
    from walrus_spark.log import WalrusLog

    # Opening the log IS the takeover: claim-before-recover means the
    # recovered high watermark can never miss a batch A committed
    # before losing the fence.
    log = WalrusLog(spark, root)
    committed: list[list[int]] = []
    for i in range(8):
        first, last = log.batch_append(
            "t", [f"b-{i}-{j}".encode() for j in range(5)]
        )
        committed.append([int(first), int(last)])

    rows = (
        log.topic_df("t")
        .select("offset", "value")
        .orderBy("offset")
        .collect()
    )
    _atomic(
        os.path.join(rv, "b_result.json"),
        {
            "ranges": committed,
            "hw": log.high_watermark("t"),
            "entries": [
                [int(r["offset"]), bytes(r["value"]).decode("utf-8")]
                for r in rows
            ],
        },
    )
    log.close()
    spark.stop()


if __name__ == "__main__":
    main()
