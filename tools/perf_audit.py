#!/usr/bin/env python
"""Spark-vs-DuckDB per-entry audit table (PERF_r{N}.md evidence).

Times every registered entry's ORACLE SQL in DuckDB on the same sf0.1
parquet (warm: one unmeasured run, then min of 2), joins with a Spark
steady bench JSON (bench.py output), and prints the ratio table sorted
by Spark time. Entries without an oracle (rows-only) are skipped.

Usage: python tools/perf_audit.py <bench_steady.json> [sf_dir]
Env:   PERF_AUDIT_ORACLE_TIMEOUT (seconds, default none) — per-oracle
       wall cap for derived-SF audits: some oracles are deliberately
       brute-force restatements (all-pairs cosine, bucket-quadratic
       Jaccard) that are fine at sf0.1 but explode quadratically at
       sf1; a capped entry is reported as TIMEOUT and EXCLUDED from
       both sides of the ratio (never counted as a win).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

HARNESS = {
    # oracle restates the answer (~ms), Spark runs the actual log /
    # streaming / bucketed-layout machinery — adjudicated in PERF_r03
    "stream_consume_replay",
    "stream_late_drop",
    "stream_dedup",
    "stream_windowed_counts",
    "dq28_topic_view_roundtrip",
    "dq27_colocated_join",
}


def main() -> None:
    bench_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    bench = json.load(open(bench_path))
    spark_t = bench["queries"]

    from walrus_spark.catalog import TABLES
    from walrus_spark.queries import ORACLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    cap = float(os.environ.get("PERF_AUDIT_ORACLE_TIMEOUT", "0")) or None

    def run_capped(sql: str) -> bool:
        """Execute with an optional wall cap; True = completed."""
        if cap is None:
            con.execute(sql).fetchall()
            return True
        done = threading.Event()

        def watchdog() -> None:
            if not done.wait(cap):
                con.interrupt()

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        try:
            con.execute(sql).fetchall()
            return True
        except duckdb.InterruptException:
            return False
        finally:
            done.set()
            w.join()

    duck_t: dict[str, float] = {}
    timed_out: list[str] = []
    for name, sql in sorted(ORACLES.items()):
        if sql is None:
            continue
        if not run_capped(sql):  # warm
            timed_out.append(name)
            continue
        best = float("inf")
        ok = True
        for _ in range(2):
            t0 = time.perf_counter()
            if not run_capped(sql):
                ok = False
                break
            best = min(best, time.perf_counter() - t0)
        if not ok:
            timed_out.append(name)
            continue
        duck_t[name] = round(best, 3)

    rows = [
        (n, spark_t.get(n), duck_t.get(n))
        for n in duck_t
        if spark_t.get(n) is not None
    ]
    rows.sort(key=lambda r: -r[1])
    print("| Query | Spark s | DuckDB s | Ratio | Note |")
    print("|---|---|---|---|---|")
    tot_s = tot_d = ana_s = ana_d = 0.0
    for n, s, d in rows:
        note = (
            "harness — oracle restates the answer, not the work"
            if n in HARNESS
            else ""
        )
        print(f"| {n} | {s:.2f} | {d:.3f} | {s / d:.1f}x | {note} |")
        tot_s += s
        tot_d += d
        if n not in HARNESS:
            ana_s += s
            ana_d += d
    print(
        f"\nAll {len(rows)} oracle-timed entries: Spark {tot_s:.1f} s, "
        f"DuckDB {tot_d:.1f} s, {tot_s / tot_d:.2f}x"
    )
    print(
        f"Analytic subset ({len(rows) - len(HARNESS & set(duck_t))} entries): "
        f"Spark {ana_s:.1f} s, DuckDB {ana_d:.1f} s, {ana_s / ana_d:.2f}x"
    )
    if timed_out:
        print(
            f"\nDuckDB oracle TIMEOUT (> {cap:.0f} s, excluded from "
            f"BOTH sides): {', '.join(timed_out)}"
        )
    print(
        json.dumps(
            {
                "spark_total": round(tot_s, 2),
                "duckdb_total": round(tot_d, 2),
                "ratio_all": round(tot_s / tot_d, 3),
                "ratio_analytic": round(ana_s / ana_d, 3),
                "sf_dir": sf_dir,
                "oracle_timeouts": timed_out,
            }
        )
    )


if __name__ == "__main__":
    main()
