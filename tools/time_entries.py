#!/usr/bin/env python
"""Time a subset of registered entries (warm, min-of-N) at a given SF
dir — the per-entry A/B harness bench.py is too coarse for: touched
entries only, same noop-force protocol, one JSON line out.

Usage: python tools/time_entries.py <sf_dir> entry1 entry2 ...
Env:   TIME_MIN_OF (default 2), SPARK_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from walrus_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    min_of = int(os.environ.get("TIME_MIN_OF", "2"))
    spark = get_spark(
        "walrus-time-entries",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    from walrus_spark.queries import QUERIES

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")

    out: dict[str, float] = {}
    for n in names:
        fn = QUERIES[n]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(min_of):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[n] = round(best, 3)
    print(json.dumps({"sf_dir": sf_dir, "min_of": min_of, "queries": out}))


if __name__ == "__main__":
    main()
