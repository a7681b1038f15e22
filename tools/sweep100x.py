#!/usr/bin/env python
"""100x scaling sweep for the banded dedup family (PERF_r{N} evidence,
r5 directive #2: the stated bar is a 100x scale-up; sweep10x stopped
at 10x).

Corpus construction (sf1-equivalent from $SPARK_GRAFT_SF_DIR docs,
default sf0.1): 100x = 10 DISTINCT variants x 10-member near-dup
cliques. Variant v>0 prefixes every token with 'v<v>:' — a disjoint
shingle space, i.e. genuinely new documents; within each variant, 10
copies with a single-token mutation each form a near-dup clique (the
same clique shape as sweep10x). This grows the CORPUS 100x while
holding duplication depth fixed — the realistic scale path: a 100x
bigger crawl has ~100x more near-dup groups, not 100-deep duplicate
chains. Pair workload therefore grows ~100x; an all-pairs approach
would grow ~10,000x.

Measures 1x vs 100x warm (one unmeasured run, then one measured — the
100x runs are minutes, far above this box's noise floor) on the banded
family: minhash_lsh_pairs, simhash_pairs, dedup_clusters (propagate),
minhash_lsh_cross, bloom_decontaminate funnel. Sub-linear-in-100x time
growth at fixed cores is the property that matters.

Usage: python tools/sweep100x.py [--keep]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from tools.sweep10x import _write_multi, stage_1x  # noqa: E402

VARIANTS = 10  # distinct-document expansion
CLIQUE = 10  # near-dup copies per variant


def gen_100x(sf_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    parts = []
    for v in range(VARIANTS):
        if v == 0:
            base = docs.copy()
        else:
            base = docs.copy()
            base["text"] = base["text"].map(
                lambda t, v=v: " ".join(f"v{v}:{w}" for w in t.split())
            )
        for c in range(CLIQUE):
            cc = base.copy()
            cc["doc_id"] = (cc["doc_id"] * VARIANTS + v) * CLIQUE + c
            if c > 0:

                def mut(t: str, c: int = c) -> str:
                    w = t.split()
                    if not w:
                        return t
                    w[(c * 7) % len(w)] = f"mut{c}"
                    return " ".join(w)

                cc["text"] = cc["text"].map(mut)
            cc["n_chars"] = cc["text"].str.len()
            parts.append(cc)
    _write_multi(
        pd.concat(parts, ignore_index=True),
        os.path.join(out_dir, "documents.parquet"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    keep = "--keep" in sys.argv
    big_dir = tempfile.mkdtemp(prefix="sweep100x_")
    one_dir = tempfile.mkdtemp(prefix="sweep1x_")
    print(
        f"staging 1x ({one_dir}) and generating 100x ({big_dir}) ...",
        file=sys.stderr,
    )
    stage_1x(sf_dir, one_dir)
    gen_100x(sf_dir, big_dir)

    import pyspark.sql.functions as F  # noqa: E402

    from walrus_spark.catalog import load_table
    from walrus_spark.operators.dedup import (
        connected_components,
        minhash_lsh_cross,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from walrus_spark.operators.pipeline import train_val_split
    from walrus_spark.queries.sketch_queries import bloom_decontaminate
    from walrus_spark.session import get_spark

    spark = get_spark("sweep100x")

    def docs(d):
        return load_table(spark, d, "documents")

    def _bloom(d):
        dd = train_val_split(docs(d))
        _, perdoc, _ = bloom_decontaminate(
            dd.where(F.col("split") == "train").drop("split"),
            dd.where(F.col("split") == "val").drop("split"),
        )
        return perdoc

    from walrus_spark.operators.dedup import substring_dedup_pairs
    from walrus_spark.operators.text import bm25_batch_topk

    from tools.bench_fixtures import make_bm25_queries

    def _bm25_batch(d):
        return bm25_batch_topk(
            docs(d), make_bm25_queries(docs(d).sparkSession)
        )

    from walrus_spark.operators.index import bm25_topk_indexed, ensure_index

    from tools.bench_fixtures import make_bm25_query_list

    def _bm25_indexed(d):
        # ensure_index is idempotent: the warm (unmeasured) run builds
        # the artifact, the measured run queries it — build charged to
        # ingest, exactly the production split
        return bm25_topk_indexed(
            spark, ensure_index(spark, d), make_bm25_query_list()
        )

    CASES = {
        "minhash_lsh_pairs": lambda d: minhash_lsh_pairs(docs(d)),
        "simhash_pairs (auto budget)": lambda d: simhash_pairs(docs(d)),
        "dedup_clusters (LSH chain, propagate)": lambda d: (
            connected_components(
                minhash_lsh_pairs(docs(d)).select("doc_a", "doc_b")
            )
        ),
        "minhash_lsh_cross (odd vs even)": lambda d: minhash_lsh_cross(
            docs(d).where(F.col("doc_id") % 2 == 1),
            docs(d).where(F.col("doc_id") % 2 == 0),
        ),
        "bloom_decontaminate (funnel)": _bloom,
        "substring_dedup_pairs (w=8)": lambda d: substring_dedup_pairs(
            docs(d)
        ),
        "bm25_batch_topk (100 queries)": _bm25_batch,
        "bm25_indexed_query (100 queries, prebuilt)": _bm25_indexed,
    }
    # optional case-name filters (substring match), like plan_dump
    filters = [a for a in sys.argv[1:] if a != "--keep"]
    if filters:
        CASES = {
            k: v
            for k, v in CASES.items()
            if any(f in k for f in filters)
        }

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    load_table(spark, sf_dir, "region").count()  # JVM warmup

    from walrus_spark.session import release_session_caches

    results = {}
    for name, fn in CASES.items():
        row = {}
        for label, d in (("1x", one_dir), ("100x", big_dir)):
            force(fn(d))  # warm (codegen compile per plan shape)
            t0 = time.perf_counter()
            force(fn(d))
            row[label] = round(time.perf_counter() - t0, 2)
        # between-cases hygiene (r6 capstone finding): release each
        # case's memoized/cached/checkpoint blocks so the next case
        # starts with the storage pool it would see in isolation
        release_session_caches(spark)
        row["ratio"] = round(row["100x"] / row["1x"], 1)
        results[name] = row
        print(
            f"{name:42s} {row['1x']:7.2f}s {row['100x']:8.2f}s "
            f"{row['ratio']:6.1f}x",
            file=sys.stderr,
        )

    print("\n| Operator | 1x (sf0.1) | 100x (sf1-equiv) | time ratio |")
    print("|---|---|---|---|")
    for name, row in results.items():
        print(
            f"| {name} | {row['1x']:.2f} s | {row['100x']:.2f} s |"
            f" {row['ratio']}x |"
        )
    print(json.dumps({"sweep100x": results}))

    if keep:
        print(f"data kept: 1x {one_dir}, 100x {big_dir}", file=sys.stderr)
    else:
        # also remove the bm25 index artifacts keyed to these mkdtemp
        # corpora — their content-hashed tags are unique per run, so
        # leaving them would accumulate corpus-sized orphans in /tmp
        from walrus_spark.operators.index import index_cache_path

        for d in (big_dir, one_dir):
            shutil.rmtree(index_cache_path(d), ignore_errors=True)
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
