"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` exposes
every implemented operator from SURVEY.md §2 / §2.5; ``oracle_sql()``
gives the DuckDB-equivalent SQL the driver hash-compares against at
sf=0.01 (omitted for non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from walrus_spark.queries import ORACLES, QUERIES
from walrus_spark.session import apply_runtime_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the broadcast-join
    chain + aggregation (DQ14) — exercises scan, broadcast joins,
    partial aggregation and sort in one plan."""
    apply_runtime_confs(spark)
    return QUERIES["dq14_broadcast_chain"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator (SURVEY.md §2.5 +
    LLM-pipeline extensions). Each callable: (spark, sf_dir) → DataFrame."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (tables pre-registered as views)."""
    return dict(ORACLES)
