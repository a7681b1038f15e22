"""Sketch-family semantics: Bloom (no false negatives, exact-after-
verify), Count-Min (containment + mergeability), domain mixing
(determinism + mixture arithmetic)."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from tests.conftest import SF_DIR_ORACLE
from walrus_spark.catalog import load_table
from walrus_spark.operators.pipeline import (
    _SPLIT_MOD,
    _SPLIT_MULT,
    domain_mix,
    decontaminate,
    train_val_split,
)
from walrus_spark.operators.sketch import cms_registers
from walrus_spark.queries.sketch_queries import bloom_decontaminate


def _split(spark, sf_dir):
    d = train_val_split(load_table(spark, sf_dir, "documents"))
    return (
        d.where(F.col("split") == "train").drop("split"),
        d.where(F.col("split") == "val").drop("split"),
    )


def test_bloom_decontam_equals_exact(spark, sf_dir):
    """Bloom-then-verify is EXACT: candidates ⊇ truth (no false
    negatives — every member's k probe bits were set by construction)
    and the verify join removes exactly the false positives. So the
    contaminated set equals decontaminate()'s, and on eval-vs-eval
    every probed shingle bloom-passes."""
    train, ev = _split(spark, sf_dir)
    _, perdoc, contaminated = bloom_decontaminate(train, ev)
    got = {r["doc_id"] for r in contaminated.collect()}
    exact = {
        r["doc_id"]
        for r in decontaminate(train, ev).collect()
        if r["contaminated"]
    }
    assert got == exact

    # membership has no false negatives: probe the eval set against
    # its own filter — every shingle must pass all k probes
    _, self_funnel, _ = bloom_decontaminate(ev, ev)
    tot = self_funnel.agg(
        F.sum("n_probe").alias("p"), F.sum("n_pass").alias("b")
    ).collect()[0]
    assert tot["p"] == tot["b"] and tot["p"] > 0

    # scale shape: the probe side never shuffles — k register joins +
    # the verify join are all broadcast; the ONLY train-sized exchange
    # is the per-doc rollup
    plan = perdoc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 6, plan
    assert plan.count("hashpartitioning(doc_id") == 1, plan


def _md5_positions(token: str, d: int, w: int) -> list[int]:
    h = hashlib.md5(token.encode()).hexdigest()
    h1, h2 = int(h[:12], 16), int(h[12:24], 16)
    return [(h1 + i * h2) % w for i in range(d)]


def test_cms_estimate_bounds_and_merge(spark, sf_dir):
    """Containment: estimate(key) >= true count for every key, with a
    tiny width forcing real collisions (some estimate strictly above).
    Mergeability: registers of two disjoint halves, merged by
    per-(row,bucket) SUM, equal the whole-corpus registers."""
    from walrus_spark.operators.text import tokens

    d, w = 3, 8
    tc = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    regs = {
        (r["row_i"], r["bucket"]): r["cnt"]
        for r in cms_registers(tc, "token", "cnt", d=d, w=w).collect()
    }
    exact = {r["token"]: r["cnt"] for r in tc.collect()}
    assert len(exact) > w  # collisions are forced
    over = 0
    for tok, cnt in exact.items():
        est = min(
            regs[(i, b)] for i, b in enumerate(_md5_positions(tok, d, w))
        )
        assert est >= cnt, (tok, est, cnt)
        over += est > cnt
    assert over > 0  # at least one collision inflated an estimate

    halves = [
        tc.where(F.xxhash64("token") % 2 == 0),
        tc.where(F.xxhash64("token") % 2 != 0),
    ]
    merged: dict[tuple[int, int], int] = {}
    for h in halves:
        for r in cms_registers(h, "token", "cnt", d=d, w=w).collect():
            k = (r["row_i"], r["bucket"])
            merged[k] = merged.get(k, 0) + r["cnt"]
    assert merged == regs


def test_domain_mix_determinism_and_arithmetic(spark):
    """Cutoffs match the int-exact formula, kept sets are reproducible,
    kept ⊆ corpus per source, and a heavier weight never gets a smaller
    cutoff at equal availability."""
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    wexpr = F.expr("1 + (CAST(substring(source, 4) AS INT) % 4)")
    plan, kept = domain_mix(docs, wexpr)
    rows = {r["source"]: r for r in plan.collect()}
    t_base = min(r["n_total"] // r["weight"] for r in rows.values())
    for r in rows.values():
        assert (
            r["cutoff"]
            == (_SPLIT_MOD * t_base * r["weight"]) // r["n_total"]
        )
    k1 = sorted((r["doc_id"], r["source"]) for r in kept.collect())
    _, kept2 = domain_mix(docs, wexpr)
    assert k1 == sorted((r["doc_id"], r["source"]) for r in kept2.collect())
    per_src = {}
    for did, src in k1:
        per_src[src] = per_src.get(src, 0) + 1
        assert (did * _SPLIT_MULT) % _SPLIT_MOD < rows[src]["cutoff"]
    for src, n in per_src.items():
        assert n <= rows[src]["n_total"]
    # uniform availability here → cutoff strictly increases with weight
    by_w = {}
    for r in rows.values():
        by_w.setdefault(r["weight"], set()).add(r["cutoff"])
    ws = sorted(by_w)
    for a, b in zip(ws, ws[1:]):
        assert max(by_w[a]) < min(by_w[b])


def test_histogram_quantiles_accuracy_and_merge(spark):
    """Interpolated estimates land within one bin width of the true
    percentile, and registers of two disjoint halves merged by per-bin
    SUM equal the whole-table registers."""
    import numpy as np

    from walrus_spark.operators.sketch import (
        histogram_quantiles,
        histogram_registers,
    )

    li = load_table(spark, SF_DIR_ORACLE, "lineitem")
    reg = histogram_registers(li, "l_extendedprice")
    regs = {r["bin"]: r["cnt"] for r in reg.collect()}
    ps = [0.25, 0.5, 0.75, 0.9, 0.99]
    est = {
        r["p"]: r["est"] for r in histogram_quantiles(reg, ps).collect()
    }
    vals = np.array(
        [r["l_extendedprice"] for r in li.select("l_extendedprice").collect()]
    )
    for p in ps:
        true = float(np.quantile(vals, p))
        assert abs(est[p] - true) <= 100.0 + 1e-6, (p, est[p], true)

    merged: dict[int, int] = {}
    for half in (
        li.where(F.col("l_orderkey") % 2 == 0),
        li.where(F.col("l_orderkey") % 2 != 0),
    ):
        for r in histogram_registers(half, "l_extendedprice").collect():
            merged[r["bin"]] = merged.get(r["bin"], 0) + r["cnt"]
    assert merged == regs


def test_cms_incremental_maintenance_over_stream(spark, sf_dir, tmp_path):
    """The production sketch loop: per-micro-batch registers merged by
    SUM equal the whole-corpus registers — a stream maintains the
    sketch incrementally, no re-scan of history. Forces >1 micro-batch
    via maxFilesPerTrigger over a multi-file copy of the corpus."""
    from walrus_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs_stream")
    docs.repartition(4).write.parquet(src)

    def batch_regs(df):
        tc = (
            df.select(F.explode(tokens(F.col("text"))).alias("token"))
            .where(F.col("token") != "")
            .groupBy("token")
            .agg(F.count("*").alias("cnt"))
        )
        return cms_registers(tc, "token", "cnt")

    merged: dict[tuple[int, int], int] = {}
    batches = [0]

    def sink(df, _bid):
        batches[0] += 1
        for r in batch_regs(df).collect():
            k = (r["row_i"], r["bucket"])
            merged[k] = merged.get(k, 0) + r["cnt"]

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    whole = {
        (r["row_i"], r["bucket"]): r["cnt"]
        for r in batch_regs(docs).collect()
    }
    assert batches[0] > 1
    assert merged == whole


def test_kmeans_quantized_semantics(spark, sf_dir):
    """Determinism (re-run identical), completeness (every vector
    assigned, sizes sum to n), nearest-centroid consistency (each
    vector's cluster is the argmin over the returned means, python-
    recomputed), and Lloyd improvement (final SSE <= initial SSE)."""
    from walrus_spark.catalog import load_table as lt
    from walrus_spark.operators.cluster import (
        kmeans_quantized,
        quantize_vectors,
    )

    emb = lt(spark, sf_dir, "embeddings")
    assigned, state = kmeans_quantized(emb)
    a1 = sorted((r["vec_id"], r["cluster"]) for r in assigned.collect())
    assigned2, state2 = kmeans_quantized(emb)
    assert a1 == sorted(
        (r["vec_id"], r["cluster"]) for r in assigned2.collect()
    )
    assert state == state2

    qv = {r["vec_id"]: list(r["qv"]) for r in quantize_vectors(emb).collect()}
    assert len(a1) == len(qv)
    means = {c: m for c, _n, m in state}

    def sse(assign_pairs, mdict):
        tot = 0
        for vid, c in assign_pairs:
            tot += sum((x - y) ** 2 for x, y in zip(qv[vid], mdict[c]))
        return tot

    for vid, c in a1:
        d_best = min(
            (sum((x - y) ** 2 for x, y in zip(qv[vid], m)), cid)
            for cid, m in means.items()
        )
        assert d_best[1] == c or d_best[0] == sum(
            (x - y) ** 2 for x, y in zip(qv[vid], means[c])
        )

    init = {
        vid: qv[vid] for vid in qv if vid < len(means)
    }
    init_assign = [
        (
            vid,
            min(
                (sum((x - y) ** 2 for x, y in zip(qv[vid], m)), cid)
                for cid, m in init.items()
            )[1],
        )
        for vid in qv
    ]
    assert sse(a1, means) <= sse(init_assign, init)


def test_kmeans_arrow_equals_fold_assignment(spark, sf_dir):
    """The Arrow (numpy int64) and fold (JVM literal) assignment paths
    are bit-identical — integer arithmetic has no summation-order
    freedom, so the fast path IS the oracle-mirrored path."""
    from walrus_spark.catalog import load_table as lt
    from walrus_spark.operators.cluster import (
        KM_K,
        kmeans_assign,
        quantize_vectors,
    )

    q = quantize_vectors(lt(spark, sf_dir, "embeddings"))
    init = q.where(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("c"), "qv"
    ).collect()
    means = [(int(r["c"]), list(r["qv"])) for r in init]
    a = {r["vec_id"]: r["cluster"] for r in kmeans_assign(q, means, "arrow").collect()}
    f = {r["vec_id"]: r["cluster"] for r in kmeans_assign(q, means, "fold").collect()}
    assert a == f and len(a) == q.count()


def test_kmeans_degenerate_inputs(spark):
    """k > distinct points: duplicate-point centroids keep their ids,
    clusters that lose every member drop from the state (documented
    drop-empty semantics), and every vector still gets assigned."""
    import pandas as pd

    from walrus_spark.operators.cluster import kmeans_quantized

    pdf = pd.DataFrame(
        {
            "vec_id": list(range(6)),
            # two tight groups far apart; ids 0-5 all initial centroids
            # at k=8 > n=6
            "embedding": [
                [0.1, 0.1], [0.1, 0.1], [0.1, 0.11],
                [0.9, 0.9], [0.9, 0.9], [0.9, 0.91],
            ],
        }
    )
    emb = spark.createDataFrame(pdf)
    assigned, state = kmeans_quantized(emb, k=8, iters=2)
    rows = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert len(rows) == 6
    # identical points share a cluster; the two groups never merge
    assert rows[0] == rows[1] and rows[3] == rows[4]
    assert rows[0] != rows[3]
    assert sum(n for _, n, _ in state) == 6
    assert len(state) <= 6  # empty initial clusters dropped


def test_sketch_frame_memo_lifecycle(spark):
    """The sketch register frames are memoized per (session, dataset):
    repeated entry runs return identical handles (no per-call frame
    leak — the r5 PERF §8 finding), a dataset switch evicts the stale
    generation, and clear_sketch_frames() empties the memo (the
    explicit lifecycle hook bench.py calls between phases)."""
    from tests.conftest import SF_DIR

    from walrus_spark.queries.sketch_queries import (
        _FRAME_CACHE,
        _memo_frame,
        clear_sketch_frames,
    )

    clear_sketch_frames()
    build = lambda: spark.range(5).toDF("n")  # noqa: E731
    a = _memo_frame(spark, SF_DIR_ORACLE, "probe", build)
    b = _memo_frame(spark, SF_DIR_ORACLE, "probe", build)
    assert a is b
    c = _memo_frame(spark, SF_DIR_ORACLE, "probe2", build)
    assert c is not a and len(_FRAME_CACHE) == 2
    d = _memo_frame(spark, SF_DIR, "probe", build)  # dataset switch
    assert d is not a and len(_FRAME_CACHE) == 1
    clear_sketch_frames()
    assert len(_FRAME_CACHE) == 0


def test_kmeans_update_plan_is_dim_independent(spark):
    """The centroid update at embedding dim 512: the posexplode cell
    formulation keeps the plan O(1) in dim — exactly one sum aggregate
    and one explode regardless of dimensionality (the per-dimension
    SUM-column formulation would put 512 aggregate expressions in the
    plan) — and the means still match a python recomputation."""
    import pandas as pd

    from walrus_spark.operators.cluster import (
        _update,
        _update_cells,
        kmeans_quantized,
        quantize_vectors,
    )

    dim, n = 512, 12
    rows = [
        {
            "vec_id": i,
            "embedding": [((i * 31 + j * 7) % 19) / 10.0 for j in range(dim)],
        }
        for i in range(n)
    ]
    emb = spark.createDataFrame(pd.DataFrame(rows))

    q = quantize_vectors(emb).withColumn("cluster", F.col("vec_id") % 3)
    plan = _update_cells(q)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("sum(") == 1, plan
    assert plan.count("count(") == 1, plan
    assert "s511" not in plan and "qv[511]" not in plan

    # means agree with a literal python recompute of floor((2S+n)/(2n))
    state = _update(q)
    qv = {r["vec_id"]: list(r["qv"]) for r in quantize_vectors(emb).collect()}
    for c, cn, mean in state:
        members = [qv[i] for i in qv if i % 3 == c]
        assert cn == len(members)
        assert len(mean) == dim
        for j in range(dim):
            s = sum(m[j] for m in members)
            assert mean[j] == (2 * s + cn) // (2 * cn)

    # the full iteration still runs at dim 512 (no literal-plan blowup
    # in the update path; assignment uses the Arrow matrix path)
    assigned, st = kmeans_quantized(emb, k=3, iters=1)
    assert assigned.count() == n and sum(x for _, x, _ in st) == n


def test_kmeans_empty_input_raises_value_error(spark):
    """Empty input raises the intended ValueError, not a TypeError from
    probing dim on a None row (ADVICE r5)."""
    import pytest
    from pyspark.sql.types import ArrayType, DoubleType, LongType
    from pyspark.sql.types import StructField, StructType

    from walrus_spark.operators.cluster import kmeans_quantized

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    empty = spark.createDataFrame([], schema)
    with pytest.raises(ValueError, match="empty input"):
        kmeans_quantized(empty)


def test_text_edge_cases_match_python(spark):
    """shingles/tokens on messy input (tabs, newlines, multi-space,
    unicode, empty, whitespace-only) agree with a literal python
    reimplementation of the declared semantics — the regexes carry the
    cross-engine contract, so pin them against an independent model."""
    import re as _re

    from walrus_spark.operators.dedup import shingles
    from walrus_spark.operators.text import tokens

    texts = [
        "a b c d",
        "  leading and  double  spaces ",
        "tab\tsep\tand\nnewline mix",
        "ünïcode wörds hére too",
        "",
        "   ",
        "one",
        "two words",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got_tok = {
        r["doc_id"]: list(r["t"])
        for r in df.select("doc_id", tokens(F.col("text")).alias("t")).collect()
    }
    got_sh = {
        r["doc_id"]: sorted(r["s"])
        for r in df.select(
            "doc_id", shingles(F.col("text")).alias("s")
        ).collect()
    }
    for i, t in enumerate(texts):
        want_tok = _re.split(r"\s+", t.strip().lower())
        assert got_tok[i] == want_tok, (i, got_tok[i], want_tok)
        ws = [w for w in want_tok if w]
        want_sh = sorted(
            {" ".join(ws[j : j + 3]) for j in range(len(ws) - 2)}
        )
        assert got_sh[i] == want_sh, (i, got_sh[i], want_sh)


def test_simhash_caller_supplied_count_skips_count_job(spark, sf_dir):
    """n_docs= lets a caller that knows its corpus size keep the
    auto-budget decision plan-only (no count() job), and the result
    equals the counted path."""
    from walrus_spark.operators.dedup import (
        SIMHASH_WIDE_BUDGET_MAX_DOCS,
        simhash_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = simhash_pairs(docs, n_docs=n)  # build: must launch no job
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
    got = sorted((r["doc_a"], r["doc_b"]) for r in df.collect())
    want = sorted(
        (r["doc_a"], r["doc_b"]) for r in simhash_pairs(docs).collect()
    )
    assert got == want
    # narrow budget kicks in for a claimed-huge corpus
    wide_cols = simhash_pairs(docs, n_docs=n).columns
    narrow = simhash_pairs(
        docs, n_docs=SIMHASH_WIDE_BUDGET_MAX_DOCS + 1
    )
    assert narrow.columns == wide_cols


def test_distribution_matched_sample_flattens(spark):
    """Uniform-target resampling flattens the length distribution:
    deterministic, per-bin kept <= available, cutoffs exact per the
    Fraction formula, and the occupied-bin imbalance (max/min) shrinks
    toward 1 while the scarcest bin keeps everything (cutoff = 2^32)."""
    from fractions import Fraction

    from walrus_spark.operators.pipeline import (
        distribution_matched_sample,
    )

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    plan, kept = distribution_matched_sample(
        docs, "n_chars", 0.0, 2000.0, 10
    )
    rows = {r["bin"]: r for r in plan.collect()}
    s = min(Fraction(r["n_total"], r["weight"]) for r in rows.values())
    full = 0
    for r in rows.values():
        assert (
            r["cutoff"]
            == (_SPLIT_MOD * s * r["weight"]) // r["n_total"]
        )
        full += r["cutoff"] == _SPLIT_MOD
    assert full >= 1  # the scarcest bin is kept wholesale

    k1 = sorted(r["doc_id"] for r in kept.collect())
    _, kept2 = distribution_matched_sample(docs, "n_chars", 0.0, 2000.0, 10)
    assert k1 == sorted(r["doc_id"] for r in kept2.collect())

    def imbalance(counts):
        vals = [v for v in counts.values() if v > 0]
        return max(vals) / min(vals)

    before = {b: r["n_total"] for b, r in rows.items()}
    # kept returns ONLY the original columns — recompute bins
    assert sorted(kept.columns) == sorted(docs.columns)
    bin_expr = F.least(
        F.greatest(F.floor((F.col("n_chars") - 0.0) / 200.0), F.lit(0)),
        F.lit(9),
    ).cast("long")
    after = {}
    for r in kept.groupBy(bin_expr.alias("b")).count().collect():
        after[r["b"]] = r["count"]
    for b, n in after.items():
        assert n <= before[b]
    assert imbalance(after) < imbalance(before)
    assert imbalance(after) < 2.0  # roughly flat at this corpus size


def test_distribution_matched_sample_infeasible_target_raises(spark):
    """An explicit target requesting a bin the corpus cannot supply
    degrades LOUDLY (ADVICE r5) — the infeasible bins are named in the
    error instead of silently dropping out of the feasible scale."""
    import pytest

    from walrus_spark.operators.pipeline import (
        distribution_matched_sample,
    )

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    # discover the occupied bins from a default (flatten) run
    base_plan, _ = distribution_matched_sample(docs, "n_chars", 0.0, 2000.0, 10)
    occupied = sorted(r["bin"] for r in base_plan.collect())
    assert occupied
    # ask also for bin 999 (outside the grid — cannot exist)
    target = {b: 1 for b in occupied}
    target[999] = 5
    with pytest.raises(ValueError, match="999"):
        distribution_matched_sample(
            docs, "n_chars", 0.0, 2000.0, 10, target=target
        )
    # weight-0 bins remain legal (explicitly excluded, not infeasible)
    target0 = {b: 1 for b in occupied[:1]}
    target0[999] = 0
    plan, kept = distribution_matched_sample(
        docs, "n_chars", 0.0, 2000.0, 10, target=target0
    )
    assert {r["bin"] for r in plan.collect()} == {occupied[0]}
    assert kept.count() > 0
