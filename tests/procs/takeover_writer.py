"""Process A of the multi-process takeover e2e (r5 directive #1).

Serves the wire protocol over a WalrusLog on a SHARED data dir while
appending batches in a loop, until a second OS process seizes the
flock-fenced writership (tests/procs/takeover_claimant.py) — at which
point the next commit here MUST fail with NotLeaderError and nothing
from the failed batch may be visible. The repo analog of the
reference's cluster resilience e2e (distributed-walrus/scripts/
resilience_test.py, recovery_test.py; Makefile:22-47) at single-storage
scope.

Protocol with the parent test (all files atomic-renamed into place):
  <rv>/a_port.json       — {"host", "port"} once the wire server is up
  <rv>/a_committed.json  — {"ranges": [[first,last],...], "fenced": bool}
                           rewritten after EVERY successful commit
  <rv>/a_stop            — parent's signal that A may shut down
"""

from __future__ import annotations

import json
import os
import sys
import time


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
        .appName("takeover-writer-a")
        .getOrCreate()
    )
    from walrus_spark.log import CommandServer, NotLeaderError, WalrusLog

    log = WalrusLog(spark, root)
    server = CommandServer(log)
    host, port = server.start_background()
    _atomic(os.path.join(rv, "a_port.json"), {"host": host, "port": port})

    committed: list[list[int]] = []
    state = os.path.join(rv, "a_committed.json")
    deadline = time.monotonic() + 300
    i = 0
    while time.monotonic() < deadline:
        batch = [f"a-{i}-{j}".encode() for j in range(5)]
        try:
            first, last = log.batch_append("t", batch)
        except NotLeaderError:
            _atomic(state, {"ranges": committed, "fenced": True})
            break
        committed.append([int(first), int(last)])
        _atomic(state, {"ranges": committed, "fenced": False})
        i += 1
        # pace the stream: with the driver-side small-batch fast path an
        # unpaced loop commits ~600 batches/s and the takeover test
        # spends its time scanning thousands of tiny files instead of
        # exercising the fence
        time.sleep(0.05)
    else:
        _atomic(state, {"ranges": committed, "fenced": False, "timeout": True})

    # Keep serving the wire plane until the parent has finished its
    # post-fencing assertions (PUT through a fenced writer must ERR).
    stop = os.path.join(rv, "a_stop")
    wait_until = time.monotonic() + 120
    while not os.path.exists(stop) and time.monotonic() < wait_until:
        time.sleep(0.1)
    server.shutdown()
    log.close()
    spark.stop()


if __name__ == "__main__":
    main()
