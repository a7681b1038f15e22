"""DQ11–DQ17: the relational query layer over ingested logs.

The reference has no relational surface at all (SURVEY.md §2.4) — this
layer is the engine's declared extension: once topics are ingested into
typed tables, stock Catalyst provides joins / aggregations / windows /
set ops. Zero custom execution code; the value here is that every plan
is shaped for scale:

 - DQ11: filter + project only — both pushed into the parquet scan.
 - DQ12: partial hash-agg before the 4-group shuffle.
 - DQ13: customer is broadcast; orders⋈lineitem shuffles on o_orderkey.
 - DQ14: both dims broadcast — zero shuffle until the final tiny agg.
 - DQ15: semi + anti joins (one tagged entry), build side one slim
   column, broadcast-or-shuffle picked by AQE.
 - DQ16: single exchange on o_custkey, heap-bounded top-k output.
 - DQ17: INTERSECT + EXCEPT (one tagged entry) → distinct +
   semi/anti-join, one shuffle each side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from walrus_spark.catalog import load_table
from walrus_spark.queries.registry import register


@register(
    "dq11_filter_project",
    oracle="SELECT l_orderkey, l_linenumber, "
    "round(l_extendedprice * (1 - l_discount), 4) AS revenue "
    "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01' "
    "AND l_discount BETWEEN 0.05 AND 0.07",
)
def dq11(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no final sort: the gate hash is order-insensitive (driver stub
    # contract) and a filtered-lineitem-scale range exchange is pure
    # presentation cost — consumers that need order sort downstream
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
        )
    )


@register(
    "dq12_hash_agg_q1",
    oracle="SELECT l_returnflag, l_linestatus, "
    "round(sum(l_quantity), 2) AS sum_qty, "
    "round(sum(l_extendedprice), 2) AS sum_price, "
    "round(avg(l_discount), 6) AS avg_disc, "
    "count(*) AS cnt FROM lineitem GROUP BY 1,2",
)
def dq12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape. Map-side partial aggregation means the shuffle
    carries ~(groups × partitions) rows, independent of data size."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("cnt"),
        )
    )  # unsorted (gate hash)


@register(
    "dq13_join_agg_q3",
    oracle="SELECT o.o_orderkey, "
    "round(sum(l.l_extendedprice*(1-l.l_discount)), 4) AS rev "
    "FROM orders o JOIN lineitem l ON o.o_orderkey=l.l_orderkey "
    "JOIN customer c ON o.o_custkey=c.c_custkey "
    "WHERE c.c_mktsegment='BUILDING' "
    "GROUP BY 1 ORDER BY rev DESC, o.o_orderkey LIMIT 10",
)
def dq13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. customer (filtered on segment) broadcasts; the
    fact-fact join shuffles once on orderkey. Filter applied before the
    join so the broadcast build side is minimal."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        o.join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("rev")
        )
        .orderBy(F.col("rev").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "dq14_broadcast_chain",
    oracle="SELECT r_name, n_name, count(*) AS cnt FROM customer c "
    "JOIN nation n ON c.c_nationkey=n.n_nationkey "
    "JOIN region r ON n.n_regionkey=r.r_regionkey "
    "GROUP BY 1,2",
)
def dq14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join chain: nation and region are tiny dims — both
    broadcast, so the fact side is never shuffled for the joins."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("cnt"))
    )  # unsorted (gate hash)


@register(
    "dq15_semi_anti_join",
    oracle="SELECT 'anti' AS part, count(*) AS cnt FROM customer c "
    "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) "
    "UNION ALL SELECT 'semi' AS part, count(*) AS cnt FROM customer c "
    "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) "
    "UNION ALL SELECT 'salted:' || c_mktsegment AS part, count(*) AS cnt "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "GROUP BY c_mktsegment",
)
def dq15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join and EXISTS → left-semi join, tagged in
    one entry. Spark needs only o_custkey from orders (column pruning),
    so each build side is one slim column; neither join duplicates rows
    from the many-side.

    'salted:*' rows (r15, the skew.py gate proof): the orders⋈customer
    inner join run through salted_join (operators/skew.py) — the fact
    side carries a per-row salt, the dim side is replicated k-fold, the
    join key becomes (custkey, salt) — aggregated per mktsegment. The
    oracle recomputes the PLAIN join: salting must be invisible in the
    values (exact equality, every segment hash-checked). The plan-shape
    half of the contract (salt fan-out Generate, both sides shuffled on
    the salted key when broadcast is off) is pinned by
    tests/test_operators.py::test_salted_join_plan_shape."""
    from walrus_spark.operators.skew import salted_join

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count("*").alias("cnt"))
        .select(F.lit("anti").alias("part"), "cnt")
    )
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count("*").alias("cnt"))
        .select(F.lit("semi").alias("part"), "cnt")
    )
    # the salt hashes the whole fact row, so keep a second column
    # (orderkey) in the projection — a key-only frame would salt every
    # row of a hot key identically, defeating the fan-out
    o2 = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    c2 = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    salted = (
        salted_join(o2, c2, on="o_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.concat(F.lit("salted:"), F.col("c_mktsegment")).alias("part"),
            "cnt",
        )
    )
    return anti.unionByName(semi).unionByName(salted)  # unsorted (gate hash)


@register(
    "dq16_window_rank",
    oracle="SELECT o_custkey, o_orderkey, rank() OVER "
    "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk "
    "FROM orders ORDER BY o_custkey, rk LIMIT 1000",
)
def dq16(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select("o_custkey", "o_orderkey", F.rank().over(w).alias("rk"))
        .orderBy("o_custkey", "rk", "o_orderkey")
        .limit(1000)
    )


@register(
    "dq17_set_ops",
    oracle="SELECT 'intersect' AS op, o_custkey AS key FROM "
    "(SELECT o_custkey FROM orders INTERSECT SELECT c_custkey FROM customer) t "
    "UNION ALL SELECT 'except' AS op, c_custkey AS key FROM "
    "(SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders) t",
)
def dq17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT (both distinct set ops) tagged in one entry.
    Each lowers to a distinct + semi/anti join — one shuffle per side,
    always on a single slim key column."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    inter = o.intersect(c).select(
        F.lit("intersect").alias("op"), F.col("o_custkey").alias("key")
    )
    exc = c.subtract(o).select(
        F.lit("except").alias("op"), F.col("o_custkey").alias("key")
    )
    # unsorted: order-insensitive gate hash; keys-scale sort elided
    return inter.unionByName(exc)


@register(
    "dq18b_rollup",
    oracle="SELECT l_returnflag, l_linestatus, "
    "round(sum(l_extendedprice), 2) AS sum_price, count(*) AS cnt "
    "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)",
)
def dq18b_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP — grouping-sets are a single
    Expand + one partial-aggregated shuffle in Spark (no extra scans
    per grouping level)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count("*").alias("cnt"),
        )
    )  # unsorted (gate hash)


