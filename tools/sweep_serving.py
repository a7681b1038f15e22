#!/usr/bin/env python
"""Serving-plane Q-scaling sweep (r14 verdict directive #7).

The one-plan batched serving operators claim their cost is dominated
by shared stages, not per-query DAG floors — so wall-clock must grow
STRONGLY sub-linearly in the batch size Q:

  * ivf_batch_topk — the gate's 'ivfb' batch is 8 stored queries; its
    docstring claims the decontamination-sweep shape (thousands of
    queries in one plan). Swept at Q = 8 / 80 / 800 (100×): the
    assignment projection, the broadcast probe/query joins, and the
    single partitionBy(query) rank window are all shared; candidate
    rows grow ~linearly in Q but carry no per-query stage cost.
  * bm25_topk_indexed_multi — the gate fuses 3 specs; swept at
    N = 1 / 10 / 100 single-spec lookups (each 2 terms drawn from the
    corpus' most frequent words, all distinct per N so the IN-pruned
    postings scan genuinely widens): per-term df, the ordered fold,
    and the rank window are keyed by (tag, query) and shared.

Protocol: one unmeasured warm run at the smallest size (JIT/fit/
artifact warmup — production serves from a resident index), then each
size measured twice, min taken. Prints one JSON line per family plus
a growth summary; exits non-zero if either 100× growth factor exceeds
SUBLINEAR_CEILING (a 100× batch must cost far less than 100× — the
ceiling is deliberately generous to stay noise-proof; observed ~2-6×).

Usage: python tools/sweep_serving.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBLINEAR_CEILING = 20.0  # 100× batch must cost < 20× wall


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import duckdb

    from walrus_spark.catalog import load_table
    from walrus_spark.operators.index import bm25_topk_indexed_multi, ensure_index
    from walrus_spark.operators.similarity import ivf_batch_topk
    from walrus_spark.session import get_spark

    spark = get_spark("walrus-sweep-serving", cpus=32)
    results: dict[str, dict] = {}

    # ---- ivf_batch_topk: Q = 8 / 80 / 800 stored queries ----
    emb = load_table(spark, sf_dir, "embeddings")
    all_ids = sorted(
        int(r[0]) for r in emb.select("vec_id").collect()
    )  # 2k ids at sf0.1 — bounded driver metadata
    sizes = [8, 80, 800]
    batches = {q: all_ids[:: max(1, len(all_ids) // q)][:q] for q in sizes}
    # warmup: quantizer fit + JVM/python worker spin-up on the smallest
    ivf_batch_topk(emb, batches[8], model_key=sf_dir).count()
    ivf = {}
    for q in sizes:
        times = []
        for _ in range(2):
            t0 = time.time()
            n = ivf_batch_topk(emb, batches[q], model_key=sf_dir).count()
            times.append(time.time() - t0)
        ivf[q] = {"sec": round(min(times), 3), "rows": n}
        print(f"ivf_batch_topk Q={q}: {ivf[q]}", flush=True)
    results["ivf_batch_topk"] = ivf

    # ---- bm25_topk_indexed_multi: N = 1 / 10 / 100 lookups ----
    path = ensure_index(spark, sf_dir)
    vocab = [
        w
        for (w,) in duckdb.connect()
        .execute(
            "SELECT w FROM (SELECT unnest(regexp_split_to_array("
            f"lower(text), '\\s+')) AS w FROM '{sf_dir}/documents.parquet')"
            " WHERE length(w) >= 3 GROUP BY w ORDER BY count(*) DESC, w"
            " LIMIT 300"
        )
        .fetchall()
    ]
    sizes_n = [1, 10, 100]

    def specs_for(n: int):
        queries = []
        for i in range(n):
            # 2 distinct terms per query, all DISTINCT across the
            # batch (300-word pool ≥ 2×100), so the postings IN-scan
            # widens with N instead of re-reading the same terms
            queries.append((f"s{i}", vocab[(2 * i) % len(vocab)]))
            queries.append((f"s{i}", vocab[(2 * i + 1) % len(vocab)]))
        return [("swp", path, queries, None, None)]

    bm25_topk_indexed_multi(
        spark, specs_for(1), sorted_output=False
    ).count()  # artifact + scan warmup
    bm = {}
    for n in sizes_n:
        times = []
        for _ in range(2):
            t0 = time.time()
            c = bm25_topk_indexed_multi(
                spark, specs_for(n), sorted_output=False
            ).count()
            times.append(time.time() - t0)
        bm[n] = {"sec": round(min(times), 3), "rows": c}
        print(f"bm25_topk_indexed_multi N={n}: {bm[n]}", flush=True)
    results["bm25_topk_indexed_multi"] = bm

    g_ivf = ivf[800]["sec"] / max(ivf[8]["sec"], 1e-9)
    g_bm = bm[100]["sec"] / max(bm[1]["sec"], 1e-9)
    summary = {
        "sf_dir": sf_dir,
        "ivf_growth_100x": round(g_ivf, 2),
        "bm25_growth_100x": round(g_bm, 2),
        "ceiling": SUBLINEAR_CEILING,
        "results": results,
    }
    print(json.dumps(summary), flush=True)
    if g_ivf > SUBLINEAR_CEILING or g_bm > SUBLINEAR_CEILING:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
