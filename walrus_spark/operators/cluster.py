"""Deterministic embedding clustering: quantized Lloyd k-means.

The iterative-algorithm operator class, made CROSS-ENGINE EXACT so the
gate can hash-check it (MLlib's KMeans is seeded/parallel-reduction
nondeterministic — right for production, unverifiable for a gate):

- vectors quantize to integers first (round(x * 1000) — ~1e-3 grid on
  unit-ish embeddings, ample for cluster geometry), so every distance
  is an EXACT int64 sum of squares: no float summation-order drift
  between engines, no argmin flips on ULP-close distances;
- centroid means use round-half-up implemented as floor((2S+n)/(2n))
  — Python's // and DuckDB's // are both floor division, so the
  driver-side update and the SQL oracle agree bit-for-bit;
- ties (equal distance) assign to the LOWEST cluster id; empty
  clusters drop (both engines derive them from the same group-by).

Scale shape: each Lloyd round is ONE scan + one k×dim aggregate
(map-side combined; the shuffle is O(k·dim) cells, never rows), with
centroids collected to the driver between rounds — k·dim ints, the
same bounded-metadata contract as the IVF quantizer
(similarity.py:136). Assignment is a per-row fold over a literal
centroid array (fine for gate-scale k; past the literal-plan ceiling
reuse the IVF pattern: broadcast centroid matrix + Arrow argmin,
similarity.py:171). int64 headroom: dim·(2·SCALE·max|x|)² per distance
and 2·S·count per mean — overflow needs |S| ≳ 4.6e18, i.e. ~10^12 rows
per cluster at this scale; past that, widen the update to decimal.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

KM_SCALE = 1000
# Uniform offset keeps every quantized coordinate (and so every sum)
# NON-NEGATIVE: Python's // floors while DuckDB's // truncates toward
# zero — they agree only on non-negative operands, and the mean
# formula floor((2S+n)/(2n)) must be bit-identical across engines.
# Distances are differences, so the offset cancels out of the geometry.
KM_OFFSET = 10 * KM_SCALE  # supports |x| <= 10
KM_K = 8
KM_ITERS = 2


def quantize_vectors(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(vec_id, qv array<long>): round(x * SCALE) + OFFSET per element."""
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * KM_SCALE, 0).cast("long")
        + F.lit(KM_OFFSET),
    )
    return emb.select(F.col(id_col).alias("vec_id"), qv.alias("qv"))


def _sq_dist(qv: Column, mean: list[int]) -> Column:
    marr = F.array(*[F.lit(int(v)) for v in mean])
    return F.aggregate(
        F.zip_with(qv, marr, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kmeans_assign(
    q: DataFrame,
    means: list[tuple[int, list[int]]],
    method: str = "arrow",
) -> DataFrame:
    """Add 'cluster' = argmin over means of exact int squared L2
    (ties -> lowest cluster id).

    method='arrow' (default): one numpy broadcast per Arrow batch —
    all-int64, so bit-identical to the fold path (asserted in
    test_kmeans_quantized_semantics) at a fraction of the cost; the
    IVF literal-vs-matrix strategy (similarity.py:171) applied here.
    method='fold': JVM-side zip_with/aggregate literal expressions —
    the formulation the SQL oracle mirrors term by term."""
    if not means:
        raise ValueError("kmeans_assign: no centroids")
    if method == "fold":
        cands = F.array(
            *[
                F.struct(
                    _sq_dist(F.col("qv"), m).alias("d"),
                    F.lit(int(cid)).cast("long").alias("c"),
                )
                for cid, m in means
            ]
        )
        return q.withColumn("cluster", F.array_min(cands)["c"])

    import numpy as np

    ms = sorted(means)  # ascending cluster id: np.argmin's first-hit
    cids = np.array([c for c, _ in ms], dtype=np.int64)  # = lowest id
    M = np.array([m for _, m in ms], dtype=np.int64)

    def fn(it):
        for pdf in it:
            Q = np.array(pdf["qv"].tolist(), dtype=np.int64)
            if len(Q):
                d2 = ((Q[:, None, :] - M[None, :, :]) ** 2).sum(axis=2)
                pdf = pdf.assign(cluster=cids[np.argmin(d2, axis=1)])
            else:
                pdf = pdf.assign(cluster=np.array([], dtype=np.int64))
            yield pdf

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        list(q.schema.fields) + [StructField("cluster", LongType())]
    )
    return q.mapInPandas(fn, schema)


def _update_cells(assigned: DataFrame) -> DataFrame:
    """Per-(cluster, dim_i) sum/count cells — the dim-scalable update.

    posexplode keeps the plan's expression count O(1) in dim (one
    explode + two aggregates, vs one SUM column per dimension, which at
    embedding dim 768+ puts hundreds of aggregate expressions in a
    single plan). The shuffle is O(k·dim) cells after map-side combine;
    n rides along per cell (identical within a cluster) so one pass
    yields both count and sums."""
    return (
        assigned.select("cluster", F.posexplode("qv").alias("i", "v"))
        .groupBy("cluster", "i")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )


def _update(assigned: DataFrame) -> list[tuple[int, int, list[int]]]:
    """Collect per-cluster (cluster, n, mean[dim]) — k·dim cells of
    bounded metadata (the IVF-centroid contract). mean =
    floor((2S+n)/(2n)), exact round-half-up in integer arithmetic."""
    rows = _update_cells(assigned).collect()
    by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
    for r in rows:
        cells = by_cluster.setdefault(int(r["cluster"]), {})
        cells[int(r["i"])] = (int(r["n"]), int(r["s"]))
    out = []
    for c in sorted(by_cluster):
        cells = by_cluster[c]
        n = cells[0][0]
        mean = [(2 * cells[i][1] + n) // (2 * n) for i in range(len(cells))]
        out.append((c, n, mean))
    return out


def kmeans_quantized(
    emb: DataFrame,
    k: int = KM_K,
    iters: int = KM_ITERS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[tuple[int, int, list[int]]]]:
    """Lloyd k-means on quantized vectors. Init = the vectors with the
    k smallest ids (the deterministic IVF-quantizer convention,
    similarity.py:136). Returns (final assignment DataFrame under the
    final means, [(cluster, size, mean_vector)])."""
    # CACHE the quantized working set: Lloyd reads it once per
    # iteration plus init and the final assignment (iters+2 passes),
    # and without the cache every pass re-scans the source and re-runs
    # the quantize expressions — the textbook iterative-algorithm
    # persist. Spark's cache manager is plan-keyed, so repeated fits
    # over the same source share ONE storage entry;
    # release_session_caches drains it between pipeline stages.
    # REPARTITION to the cluster's parallelism first: a single-file
    # embeddings table scans as 1–2 input partitions, which makes
    # every Lloyd pass a one-straggler-task stage (measured at derived
    # sf1: 9 stages × ~1.5 s each, all wall in one task). The shuffle
    # moves a few MB once; every subsequent pass then uses the full
    # executor width — the partitioning-follows-iteration-count rule
    # any at-scale k-means obeys.
    spark = emb.sparkSession
    q = (
        quantize_vectors(emb, vec_col, id_col)
        .repartition(spark.sparkContext.defaultParallelism)
        .cache()
    )
    # the k SMALLEST ids — not `vec_id < k`, which silently under-seeds
    # (or matches nothing) when ids are sparse or not 0-based. The init
    # collect doubles as the empty-input check and the dim source — no
    # separate first() probe job.
    init = (
        q.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cluster"), "qv")
        .collect()
    )
    if not init:
        raise ValueError("kmeans_quantized: empty input")
    means = [(int(r["cluster"]), list(r["qv"])) for r in init]
    state: list[tuple[int, int, list[int]]] = []
    for _ in range(iters):
        assigned = kmeans_assign(q, means)
        state = _update(assigned)
        means = [(c, m) for c, _n, m in state]
    return kmeans_assign(q, means), state
