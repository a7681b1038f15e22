"""Bucketed (co-located) join support — the 100 TB fact⋈fact scale path.

A shuffle on a 100 TB fact table dominates any join's cost. When the
same join key is used repeatedly (orders⋈lineitem-style, or topic logs
joined to per-key state), pre-bucketing both sides by that key lets
every subsequent sort-merge join run with ZERO exchanges: Spark's
bucketing metadata proves both sides share hash-partitioning, so each
task merges bucket i of A with bucket i of B in place.

This is the Spark analog of the reference's per-topic data placement
(one writer owns a topic's blocks — src/wal/runtime/walrus.rs:205-238):
co-locating by key at write time so reads never re-shuffle.

`materialize_bucketed` writes an external bucketed table (data at an
explicit path, metadata in the session catalog); `bucketed` reads it
back with the bucket metadata attached. Bucket count should be sized so
one bucket ≈ 100-500 MB at target scale — fixed per table family, since
co-location requires equal bucket counts on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    num_buckets: int = 8,
) -> None:
    """Write `df` as an external table bucketed (and sorted) by
    `bucket_col`. One extra shuffle now; zero shuffles for every later
    join/aggregation on that key."""
    (
        df.write.bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its co-location metadata attached."""
    return spark.table(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. The merge
    hint forces sort-merge (broadcast would hide the point at test SF);
    with matching bucketing the plan contains no Exchange."""
    lhs, rhs = spark.table(left_table), spark.table(right_table)
    return lhs.hint("merge").join(rhs, on=on, how=how)
