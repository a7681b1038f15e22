#!/usr/bin/env python
"""10x scaling sweep for the heavy operators (PERF_r{N}.md evidence).

Generates a synthetic 10x dataset from $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) into a temp dir —

  * documents: each doc copied 10x with a single-token mutation per
    copy (so every doc's 10 variants form a near-dup clique: the pair
    workload grows ~1000x, far harsher than the 10x row count),
  * embeddings: 10x fresh hash-derived unit vectors (new points, not
    copies — ANN bucket occupancy grows 10x),
  * events: 10x with shifted ids and +i-second jitter at the SAME
    user cardinality (sessions get denser, state keys constant),

— then times each heavy operator warm (one unmeasured execution, then
min of 2 measured) at 1x and 10x and prints a markdown table plus one
JSON line. Sub-linear time growth at fixed cores is the property that
matters: it means per-row cost is flat and fixed overheads amortize,
i.e. the plan shape survives a cluster scale-out.

Usage: python tools/sweep10x.py [--keep]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

MULT = 10


N_FILES = 32  # one scan task per core at BOTH scales


def _write_multi(frame, path: str) -> None:
    """Write a table as N_FILES parquet files. A single small file is
    below maxPartitionBytes, so Spark would scan the whole table as
    ONE partition and every scan-stage operator would serialize onto
    one core — the ratio would then measure file-layout skew, not the
    operator. Real 100 TB tables are many files; mirror that at BOTH
    scales so the 1x/10x ratio is work growth at fixed parallelism."""
    os.makedirs(path, exist_ok=True)
    for i, part in enumerate(np.array_split(frame, N_FILES)):
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            os.path.join(path, f"part-{i:03d}.parquet"),
        )


def stage_1x(sf_dir: str, out_dir: str) -> None:
    """Re-stage the 1x fixture tables in the same N_FILES layout."""
    os.makedirs(out_dir, exist_ok=True)
    for t in ("documents", "embeddings", "events"):
        frame = pq.read_table(os.path.join(sf_dir, f"{t}.parquet")).to_pandas()
        _write_multi(frame, os.path.join(out_dir, f"{t}.parquet"))


def gen_10x(sf_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    doc_parts = []
    for i in range(MULT):
        c = docs.copy()
        c["doc_id"] = c["doc_id"] * MULT + i
        if i > 0:
            # one-token mutation, position varies per copy
            def mut(t: str, i: int = i) -> str:
                w = t.split()
                if not w:
                    return t
                w[(i * 7) % len(w)] = f"mut{i}"
                return " ".join(w)

            c["text"] = c["text"].map(mut)
        c["n_chars"] = c["text"].str.len()
        doc_parts.append(c)
    _write_multi(
        pd.concat(doc_parts, ignore_index=True),
        os.path.join(out_dir, "documents.parquet"),
    )

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    dim = len(emb["embedding"].iloc[0])
    n = len(emb) * MULT
    rng = np.random.default_rng(0xC0FFEE)  # hash-derived, deterministic
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    big_emb = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(mat),
            "label": np.tile(emb["label"].to_numpy(), MULT)[:n],
        }
    )
    _write_multi(big_emb, os.path.join(out_dir, "embeddings.parquet"))

    ev = pq.read_table(os.path.join(sf_dir, "events.parquet")).to_pandas()
    ev_parts = []
    for i in range(MULT):
        c = ev.copy()
        c["event_id"] = c["event_id"] * MULT + i
        c["ts"] = c["ts"] + pd.to_timedelta(i, unit="s")
        ev_parts.append(c)
    _write_multi(
        pd.concat(ev_parts, ignore_index=True),
        os.path.join(out_dir, "events.parquet"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    keep = "--keep" in sys.argv
    ten_dir = tempfile.mkdtemp(prefix="sweep10x_")
    one_dir = tempfile.mkdtemp(prefix="sweep1x_")
    print(f"staging 1x ({one_dir}) and generating 10x ({ten_dir}) ...",
          file=sys.stderr)
    stage_1x(sf_dir, one_dir)
    gen_10x(sf_dir, ten_dir)

    from walrus_spark.session import get_spark

    spark = get_spark("sweep10x")

    import pyspark.sql.functions as F

    from walrus_spark.catalog import load_table
    from walrus_spark.operators.dedup import (
        connected_components,
        embedding_lsh_pairs,
        minhash_lsh_cross,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from walrus_spark.operators.pipeline import (
        chunk_documents,
        corpus_filter,
        shuffle_shards,
    )
    from walrus_spark.operators.similarity import ivf_topk
    from tools.bench_fixtures import make_bm25_queries
    from walrus_spark.operators.text import (
        bm25_batch_topk,
        ngram_lm_perplexity,
        pii_scrub,
        repetition_signals,
    )

    def docs(d):
        return load_table(spark, d, "documents")

    def emb(d):
        return load_table(spark, d, "embeddings")

    def events(d):
        return load_table(spark, d, "events")

    from walrus_spark.operators.dedup import substring_dedup_pairs

    CASES = {
        "minhash_lsh_pairs": lambda d: minhash_lsh_pairs(docs(d)),
        "substring_dedup_pairs (w=8)": lambda d: substring_dedup_pairs(
            docs(d)
        ),
        "ngram_lm_perplexity (self)": lambda d: ngram_lm_perplexity(
            docs(d)
        ),
        "bm25_batch_topk (100 queries)": lambda d: bm25_batch_topk(
            docs(d), make_bm25_queries(docs(d).sparkSession)
        ),
        "simhash_pairs (auto budget)": lambda d: simhash_pairs(docs(d)),
        "dedup_clusters (LSH chain, propagate)": lambda d: connected_components(
            minhash_lsh_pairs(docs(d)).select("doc_a", "doc_b")
        ),
        "dedup_clusters (LSH chain, star)": lambda d: connected_components(
            minhash_lsh_pairs(docs(d)).select("doc_a", "doc_b"), method="star"
        ),
        "minhash_lsh_cross (odd vs even)": lambda d: minhash_lsh_cross(
            docs(d).where(F.col("doc_id") % 2 == 1),
            docs(d).where(F.col("doc_id") % 2 == 0),
        ),
        "repetition_signals": lambda d: repetition_signals(docs(d)),
        "corpus_filter": lambda d: corpus_filter(docs(d)),
        "pii_scrub": lambda d: pii_scrub(docs(d)).select(
            "doc_id", "n_email", "n_ipv4", "n_phone", "text_scrubbed"
        ),
        "chunk_documents (64/16)": lambda d: chunk_documents(
            docs(d), chunk_tokens=64, overlap=16
        ),
        "shuffle_shards (64 shards)": lambda d: shuffle_shards(
            docs(d), n_shards=64
        ),
        "embedding_lsh_pairs": lambda d: embedding_lsh_pairs(spark, emb(d)),
        "ivf_topk": lambda d: ivf_topk(emb(d), query_vec_id=0, k=10),
        "tumbling_window_agg": lambda d: events(d)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v")),
        "sessionization": lambda d: events(d)
        .groupBy("user_id", F.session_window("ts", "5 minutes"))
        .agg(F.count("*").alias("n")),
    }

    from walrus_spark.operators.cluster import kmeans_quantized
    from walrus_spark.operators.similarity import semantic_dedup
    from walrus_spark.operators.pipeline import (
        _MIX_W_SQL,
        domain_mix,
        train_val_split,
    )
    from walrus_spark.operators.sketch import (
        cms_registers,
        histogram_registers,
    )
    from walrus_spark.operators.text import tokens
    from walrus_spark.queries.sketch_queries import bloom_decontaminate

    def _bloom(d):
        dd = train_val_split(docs(d))
        _, perdoc, _ = bloom_decontaminate(
            dd.where(F.col("split") == "train").drop("split"),
            dd.where(F.col("split") == "val").drop("split"),
        )
        return perdoc

    CASES.update(
        {
            "bloom_decontaminate (funnel)": _bloom,
            "cms_registers (corpus tokens)": lambda d: cms_registers(
                docs(d)
                .select(F.explode(tokens(F.col("text"))).alias("t"))
                .where(F.col("t") != "")
                .groupBy("t")
                .agg(F.count("*").alias("c")),
                "t",
                "c",
            ),
            "histogram_registers (n_chars)": lambda d: histogram_registers(
                docs(d), "n_chars", 0.0, 2000.0, 200
            ),
            "domain_mix (kept side)": lambda d: domain_mix(
                docs(d), F.expr(_MIX_W_SQL)
            )[1],
            "kmeans_quantized (k=8, 2 rounds)": lambda d: kmeans_quantized(
                emb(d)
            )[0],
            # r11: cluster-then-prune semantic dedup — fit + per-cluster
            # BLAS prune end-to-end (no session memo here: each timed
            # call passes a fresh frame, so the measurement covers the
            # full fit+prune work at both scales)
            "semantic_dedup (k=8, cos>=0.4)": lambda d: semantic_dedup(
                spark, emb(d)
            ),
        }
    )

    from walrus_spark.operators.bpe import apply_bpe, learn_bpe_merges

    # learning runs eagerly inside the timed call (it IS the work);
    # the returned encode frame is forced like every other case, so
    # the measurement covers learn + encode end-to-end
    CASES["bpe_learn_encode (8 merges)"] = lambda d: apply_bpe(
        docs(d), learn_bpe_merges(docs(d), 8)
    ).select("doc_id", "n_subwords")

    # r6 directive #2 evidence: a REALISTIC merge count. The driver-
    # local loop makes this O(1) Spark jobs; the old distributed loop
    # would schedule ~400 sequential jobs here and the scheduling
    # floor, not the data, would dominate.
    CASES["bpe_learn_encode (200 merges)"] = lambda d: apply_bpe(
        docs(d), learn_bpe_merges(docs(d), 200)
    ).select("doc_id", "n_subwords")

    # optional case-name filters (substring match), like sweep100x
    filters = [a for a in sys.argv[1:] if a != "--keep"]
    if filters:
        CASES = {
            k: v for k, v in CASES.items() if any(f in k for f in filters)
        }

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    load_table(spark, sf_dir, "region").count()  # JVM warmup

    results = {}
    for name, fn in CASES.items():
        row = {}
        for label, d in (("1x", one_dir), ("10x", ten_dir)):
            force(fn(d))  # warm (codegen compile per plan shape)
            # min of 2 measured runs: this box's run-to-run noise is
            # larger than the small entries themselves
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                force(fn(d))
                best = min(best, time.perf_counter() - t0)
            row[label] = round(best, 2)
        row["ratio"] = round(row["10x"] / row["1x"], 1)
        results[name] = row
        print(f"{name:42s} {row['1x']:7.2f}s {row['10x']:7.2f}s {row['ratio']:5.1f}x",
              file=sys.stderr)

    print("\n| Operator | 1x (sf0.1) | 10x | time ratio |")
    print("|---|---|---|---|")
    for name, row in results.items():
        print(f"| {name} | {row['1x']:.2f} s | {row['10x']:.2f} s | {row['ratio']}x |")
    print(json.dumps({"sweep10x": results}))

    if keep:
        print(f"data kept: 1x {one_dir}, 10x {ten_dir}", file=sys.stderr)
    else:
        shutil.rmtree(ten_dir, ignore_errors=True)
        shutil.rmtree(one_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
