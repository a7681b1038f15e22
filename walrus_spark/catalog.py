"""Fixture catalog: load the driver's parquet tables with normalized types.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings. The only normalization applied is
``events.ts``: the parquet stores TIMESTAMP(NANOS), which Spark cannot
read natively — we read it as nanosecond Longs (legacy flag) and convert
to TIMESTAMP_NTZ at microsecond precision, matching both Spark's native
precision and DuckDB's rendering (FIXTURES.md determinism rule 3).

Column pruning / predicate pushdown flow through these loaders untouched:
each table is a plain ``spark.read.parquet`` scan, so Catalyst sees the
file source directly (check ``PushedFilters`` in .explain).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from walrus_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with normalized column types."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns → µs → TIMESTAMP_NTZ (session TZ is UTC, so the wall-clock
        # value is identical to DuckDB's naive timestamp). Integer `div`,
        # not `/`: epoch-ns values exceed double's 2^53 exact range, so
        # float division rounds the microsecond.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views (for spark.sql use)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
