#!/usr/bin/env python
"""Pairable ISOLATION capture for named entries (r12 verdict #2).

tools/time_entries.py times entries inside a shared session (suite
context), and perf_audit.py pairs DuckDB against a bench.py suite run —
neither isolates one entry with a same-window oracle, so a "the plan is
fine, the suite context isn't" claim was unfalsifiable. This tool makes
the pair: for each named entry it

  1. spawns a FRESH python process that builds its own Spark session,
     runs the standard disk-artifact warmups (buckets/index — built
     once per source dir, exactly bench.py's contract), executes the
     entry once unmeasured (codegen warm), then measures min-of-2
     noop-forced executions — a dedicated session, no other entry's
     cached frames, shuffle files, or GC debt in the JVM;
  2. immediately times the SAME entry's oracle SQL in DuckDB in this
     process (one unmeasured run, then min-of-2 — perf_audit's exact
     protocol) — same window, same box, same fixture.

Prints one JSON line:
  {"metric": "isolation_pair", "sf_dir": ..., "entries":
   {name: {"spark_sec": s, "duck_sec": d, "ratio": s/d}}}

Usage: python tools/isolation_pair.py <sf_dir> <entry> [entry...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
from walrus_spark.session import get_spark
spark = get_spark("walrus-isolation")
sf_dir, name = sys.argv[2], sys.argv[3]
from walrus_spark.catalog import load_table
from walrus_spark.queries import QUERIES
from walrus_spark.queries.infra import ensure_buckets
from walrus_spark.operators.index import ensure_index, ensure_index_with_delta
load_table(spark, sf_dir, "region").count()  # JVM warmup
ensure_buckets(spark, sf_dir)
ensure_index(spark, sf_dir)
ensure_index_with_delta(spark, sf_dir)

def force(df):
    df.write.format("noop").mode("overwrite").save()

force(QUERIES[name](spark, sf_dir))  # codegen warm, unmeasured
best = None
for _ in range(2):
    t0 = time.perf_counter()
    force(QUERIES[name](spark, sf_dir))
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print("ISOPAIR_SPARK_SEC=%.4f" % best, flush=True)
spark.stop()
"""


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        raise SystemExit("usage: isolation_pair.py <sf_dir> <entry>...")

    import duckdb

    from walrus_spark.catalog import TABLES
    from walrus_spark.queries import ORACLES

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out: dict[str, dict] = {}
    for name in names:
        # 1. dedicated-session Spark side (fresh process)
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, repo, sf_dir, name],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        spark_sec = None
        for ln in proc.stdout.splitlines():
            if ln.startswith("ISOPAIR_SPARK_SEC="):
                spark_sec = float(ln.split("=", 1)[1])
        if spark_sec is None:
            out[name] = {
                "error": (proc.stderr.strip()[-300:] or "no metric line")
            }
            continue

        # 2. same-window DuckDB side (perf_audit protocol: warm 1,
        # min-of-2) — fresh connection per entry so neither side
        # carries cross-entry state
        sql = ORACLES.get(name)
        if sql is None:
            out[name] = {"spark_sec": spark_sec, "duck_sec": None}
            continue
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        con.execute(sql).fetchall()  # warm, unmeasured
        duck = None
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            duck = dt if duck is None else min(duck, dt)
        con.close()
        out[name] = {
            "spark_sec": round(spark_sec, 4),
            "duck_sec": round(duck, 4),
            "ratio": round(spark_sec / duck, 3) if duck else None,
        }
    print(
        json.dumps(
            {"metric": "isolation_pair", "sf_dir": sf_dir, "entries": out}
        )
    )


if __name__ == "__main__":
    main()
