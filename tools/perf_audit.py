#!/usr/bin/env python
"""Spark-vs-DuckDB per-entry audit table (PERF_r{N}.md evidence).

Times every registered entry's ORACLE SQL in DuckDB on the same sf0.1
parquet (warm: one unmeasured run, then min of 2), joins with a Spark
steady bench JSON (bench.py output), and prints the ratio table sorted
by Spark time. Entries without an oracle (rows-only) are skipped.

Usage: python tools/perf_audit.py <bench_steady.json> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
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

    duck_t: dict[str, float] = {}
    for name, sql in sorted(ORACLES.items()):
        if sql is None:
            continue
        con.execute(sql).fetchall()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
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
    print(
        json.dumps(
            {
                "spark_total": round(tot_s, 2),
                "duckdb_total": round(tot_d, 2),
                "ratio_all": round(tot_s / tot_d, 3),
                "ratio_analytic": round(ana_s / ana_d, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
