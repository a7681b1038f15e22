#!/usr/bin/env python
"""Per-entry variance harness (PERF_r{N}.md evidence).

The driver's per-round bench is a single execution per entry; three
rounds of ±40% spread between driver and quiet-window captures made
outliers (r4's dedup_clusters 15.9 s vs 2.5 s steady) indistinguishable
from machine noise. This harness runs each requested entry N times in
one session (one unmeasured warmup, then N measured executions, noop
sink — bench.py's measurement discipline) and reports min/median/max,
so a future regression is separable from noise in one table.

Usage: python tools/variance.py [entry ...]   (default: the heaviest 5)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), VARIANCE_N=5
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from walrus_spark.session import get_spark  # noqa: E402

DEFAULT_ENTRIES = [
    "dedup_clusters",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_fingerprints",
    "sim_knn_join",
    "ingest_events",
    # r6 verdict "what's wrong" #3: unbanded movers — dq17 drifted
    # 2.26x code-unchanged with no band to adjudicate against, and
    # text_vocab keeps gaining scope (bm25/bm25b branches)
    "dq17_set_ops",
    "text_vocab",
    # r8 verdict: the two entries graded `weak` (bimodal runtimes) and
    # the unbanded 3.1× driver-window mover
    "dedup_ngram_jaccard",
    "udx_median_split",
    # r9 verdict #3: the similarity family had no bands when the
    # driver window read sim_ann_ivf at 5.5x its steady value, and
    # nothing committed could adjudicate host noise vs regression
    "sim_ann_ivf",
    "dedup_embedding_cosine",
]


def _ingest_trial(spark, sf_dir: str) -> float:
    """One ingest_events trial: events → canonical log table in one
    atomic commit to a FRESH root (bench.py's measurement, r5 directive
    #6 — the driver's single ingest number needs an in-suite N=5 band
    so it stops being the arbiter of throughput drift)."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from walrus_spark.catalog import load_table
    from walrus_spark.log import WalrusLog

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("topic"),
        F.encode(F.col("props"), "UTF-8").alias("value"),
    )
    root = tempfile.mkdtemp(prefix="wal_var_ingest_")
    try:
        log = WalrusLog(spark, root)
        t0 = time.perf_counter()
        log.ingest(ev, "topic", "value")
        dt = time.perf_counter() - t0
        log.close()
        return dt
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("VARIANCE_N", "5"))
    entries = sys.argv[1:] or DEFAULT_ENTRIES
    spark = get_spark("walrus-spark-variance")
    from walrus_spark.catalog import load_table
    from walrus_spark.queries import QUERIES

    load_table(spark, sf_dir, "region").count()  # JVM warmup

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    results = {}
    for name in entries:
        if name == "ingest_events":
            _ingest_trial(spark, sf_dir)  # warmup (codegen + JVM paths)
            times = [
                round(_ingest_trial(spark, sf_dir), 3) for _ in range(n)
            ]
            ev_rows = load_table(spark, sf_dir, "events").count()
            results[name] = {
                "n": n,
                "min": min(times),
                "median": round(statistics.median(times), 3),
                "max": max(times),
                "times": times,
                "rows_per_sec_at_median": round(
                    ev_rows / statistics.median(times), 1
                ),
            }
            print(f"# {name}: {results[name]}", file=sys.stderr)
            continue
        force(QUERIES[name](spark, sf_dir))  # codegen warmup
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            force(QUERIES[name](spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
        results[name] = {
            "n": n,
            "min": min(times),
            "median": round(statistics.median(times), 3),
            "max": max(times),
            "times": times,
        }
        print(f"# {name}: {results[name]}", file=sys.stderr)

    print("| entry | n | min s | median s | max s |")
    print("|---|---|---|---|---|")
    for name, r in results.items():
        print(
            f"| {name} | {r['n']} | {r['min']} | {r['median']} | {r['max']} |"
        )
    print(json.dumps({"sf_dir": sf_dir, "variance": results}))
    spark.stop()


if __name__ == "__main__":
    main()
