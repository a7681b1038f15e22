"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k is the exact baseline (DQ20): one broadcast of
the query vector, one scan, a heap-bounded TakeOrdered — no shuffle of
the embedding column at all. The IVF variant is the scale path: a
deterministic coarse quantizer bucketizes vectors once (write-time at
100 TB), then queries probe only nprobe buckets — the scan shrinks by
~nlist/nprobe.

All arithmetic is JVM-side (zip_with/aggregate fold over array<double>).
Higher-order folds evaluate interpreted, but at 64 dims the per-row cost
is trivial and the sequential fold order matches the oracle's list fold
exactly, so cosines are byte-identical doubles (an explode+sum would be
codegen'd but float-nondeterministic in summation order).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from walrus_spark.catalog import load_table
from walrus_spark.queries.registry import register

N_CENTROIDS = 16
N_PROBE = 4


def _dbl(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    emb: DataFrame, query_vec_id: int, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine against one stored vector. The 1-row query
    side is broadcast; ties broken by vec_id."""
    e = emb.select("vec_id", _dbl("embedding").alias("e"))
    q = e.where(F.col("vec_id") == query_vec_id).select(
        F.col("e").alias("q"), _norm("e").alias("nq")
    )
    cos = _dot("e", "q") / (_norm("e") * F.col("nq"))
    return (
        e.crossJoin(broadcast(q))
        .select("vec_id", cos.alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(k)
        .select("vec_id")
    )


_DQ20_ORACLE = """
WITH q AS (
  SELECT list_transform(embedding, x -> x::DOUBLE) AS e,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nq
  FROM embeddings WHERE vec_id = 1
), s AS (
  SELECT v.vec_id,
         list_sum(list_transform(generate_series(1, len(v.embedding)),
                                 i -> v.embedding[i]::DOUBLE * q.e[i])) /
         (sqrt(list_sum(list_transform(v.embedding, x -> x::DOUBLE * x::DOUBLE)))
          * q.nq) AS cos
  FROM embeddings v, q
)
SELECT vec_id FROM s ORDER BY cos DESC, vec_id LIMIT 10
"""


@register("dq20_similarity_topk", oracle=_DQ20_ORACLE)
def dq20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ20: top-10 vec_id by cosine vs vec_id=1 (ids only hashed —
    rank-deterministic, FIXTURES.md)."""
    return cosine_topk(load_table(spark, sf_dir, "embeddings"), query_vec_id=1)


def ivf_assign(emb: DataFrame, n_centroids: int = N_CENTROIDS) -> DataFrame:
    """Assign every vector to its nearest coarse centroid.

    Deterministic quantizer: centroids are the vectors with the
    n_centroids smallest vec_ids (a fixed, reproducible "training" —
    at 100 TB this would be a k-means fit persisted once; assignment is
    the same broadcast-argmin either way). Output: vec_id, cluster, e.
    """
    e = emb.select("vec_id", _dbl("embedding").alias("e"))
    cents = broadcast(
        e.where(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cluster"), F.col("e").alias("c")
        )
    )
    sim = _dot("e", "c") / (_norm("e") * _norm("c"))
    ranked = (
        e.crossJoin(cents)
        .withColumn("sim", sim)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("sim").desc(), F.col("cluster")
                )
            ),
        )
        .where(F.col("rn") == 1)
    )
    return ranked.select("vec_id", "cluster", "e")


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """Approximate top-k: probe the n_probe clusters nearest the query,
    exact cosine inside them. At scale the assignment is precomputed and
    partitioned by cluster → the query scans nprobe/nlist of the data."""
    assigned = ivf_assign(emb, n_centroids)
    e = emb.select("vec_id", _dbl("embedding").alias("e"))
    q = e.where(F.col("vec_id") == query_vec_id).select(
        F.col("e").alias("q"), _norm("e").alias("nq")
    )
    # centroid list comes straight from the base table (a centroid's
    # nearest centroid is itself, so routing through the assignment
    # cross-join would only recompute it)
    cents = e.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("pcluster"), F.col("e").alias("c")
    )
    probe = broadcast(
        cents.crossJoin(broadcast(q))
        .select(
            "pcluster",
            (_dot("c", "q") / (_norm("c") * F.col("nq"))).alias("csim"),
        )
        .orderBy(F.col("csim").desc(), "pcluster")
        .limit(n_probe)
        .select("pcluster")
    )
    cand = assigned.join(probe, assigned.cluster == probe.pcluster)
    cos = _dot("e", "q") / (_norm("e") * F.col("nq"))
    return (
        cand.crossJoin(broadcast(q))
        .select("vec_id", cos.alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(k)
        .select("vec_id")
    )


@register("sim_ann_ivf")  # approximate — no SQL oracle; rows-only check
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_topk(load_table(spark, sf_dir, "embeddings"), query_vec_id=1)
