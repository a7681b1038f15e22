"""Scalar-function-library queries + the as-of join operator surface.

The reference exposes no scalar functions at all (SURVEY.md §2.4:
payloads are opaque bytes). Our engine's function surface is PySpark's
built-in library — every expression here stays JVM-side inside
whole-stage codegen; nothing drops to Python. Each query doubles as a
DuckDB-parity check of the string / math / date / JSON function
families, and dq22 exercises the custom `asof_join` operator
(operators/asof.py) that Spark itself lacks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from walrus_spark.catalog import load_table, spread
from walrus_spark.operators.asof import asof_join
from walrus_spark.queries.registry import register


@register(
    "dq21_scalar_functions",
    oracle="SELECT 'part' AS src, p_partkey AS key, "
    "upper(p_brand) AS s1, substring(p_name, 1, 8) AS s2, "
    "concat(p_brand, ':', p_type) AS s3, "
    "CAST(length(p_name) AS BIGINT) AS n1, "
    "CAST(p_size % 7 AS BIGINT) AS n2, CAST(NULL AS BIGINT) AS n3, "
    "round(sqrt(p_retailprice), 4) AS d1, CAST(NULL AS TIMESTAMP) AS t1, "
    "CAST(len(string_split(p_name, ' ')) AS BIGINT) AS a1, "
    "array_to_string(list_sort(string_split(p_name, ' '))[1:3], ',') AS a2, "
    "string_split(p_type, ' ')[1] AS a3, "
    "CAST(list_sum(list_transform(generate_series(1, p_size % 5 + 1), "
    "x -> x * x)) AS BIGINT) AS a4 "
    "FROM part "
    "UNION ALL SELECT 'orders' AS src, o_orderkey AS key, "
    "CAST(NULL AS VARCHAR) AS s1, CAST(NULL AS VARCHAR) AS s2, "
    "CAST(NULL AS VARCHAR) AS s3, "
    "CAST(year(o_orderdate) AS BIGINT) AS n1, "
    "CAST(month(o_orderdate) AS BIGINT) AS n2, "
    "CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS n3, "
    "CAST(NULL AS DOUBLE) AS d1, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS t1, "
    "CAST(NULL AS BIGINT) AS a1, CAST(NULL AS VARCHAR) AS a2, "
    "CAST(NULL AS VARCHAR) AS a3, CAST(NULL AS BIGINT) AS a4 "
    "FROM orders",
)
def dq21_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function families (string + math + array/higher-order
    over `part`, date/time over `orders`) in one tagged entry on a
    shared super-schema — every
    per-row value is still hash-checked natively typed (no stringified
    doubles). All expressions are built-in codegen; each branch's scan
    is the whole cost (no UDF boundary, no shuffle before the final
    presentation sort)."""
    p = load_table(spark, sf_dir, "part")
    part_side = p.select(
        F.lit("part").alias("src"),
        F.col("p_partkey").alias("key"),
        F.upper("p_brand").alias("s1"),
        F.substring("p_name", 1, 8).alias("s2"),
        F.concat_ws(":", "p_brand", "p_type").alias("s3"),
        F.length("p_name").cast("long").alias("n1"),
        (F.col("p_size") % 7).cast("long").alias("n2"),
        F.lit(None).cast("long").alias("n3"),
        F.round(F.sqrt("p_retailprice"), 4).alias("d1"),
        F.lit(None).cast("timestamp_ntz").alias("t1"),
        # array / higher-order function family (all codegen or
        # interpreted JVM exprs — no Python): size, sort+slice+join,
        # element_at, and a sequence→transform→aggregate fold
        F.size(F.split("p_name", " ")).cast("long").alias("a1"),
        F.array_join(
            F.slice(F.sort_array(F.split("p_name", " ")), 1, 3), ","
        ).alias("a2"),
        F.element_at(F.split("p_type", " "), 1).alias("a3"),
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), (F.col("p_size") % 5 + 1)),
                lambda x: x * x,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("a4"),
    )
    o = load_table(spark, sf_dir, "orders")
    orders_side = o.select(
        F.lit("orders").alias("src"),
        F.col("o_orderkey").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.lit(None).cast("string").alias("s3"),
        F.year("o_orderdate").cast("long").alias("n1"),
        F.month("o_orderdate").cast("long").alias("n2"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")
        )
        .cast("long")
        .alias("n3"),
        F.lit(None).cast("double").alias("d1"),
        F.date_trunc("month", "o_orderdate").alias("t1"),
        F.lit(None).cast("long").alias("a1"),
        F.lit(None).cast("string").alias("a2"),
        F.lit(None).cast("string").alias("a3"),
        F.lit(None).cast("long").alias("a4"),
    )
    # unsorted: order-insensitive gate hash (driver stub contract);
    # the part+orders-scale presentation sort is elided
    return part_side.unionByName(orders_side)


@register(
    "dq24_json_extract",
    oracle="SELECT event_id, "
    "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, "
    "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed, "
    "CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket "
    "FROM events",
)
def dq24_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload decode — the relational-layer step that turns the
    reference's opaque byte payloads into typed columns (SURVEY.md §7
    stage 4) — through BOTH production paths, hash-checked equal:
    `get_json_object` (ad-hoc path probing) and `from_json` with an
    explicit schema (one parse per row, a typed struct out — the 100 TB
    path once the topic schema is known, and what typed_log_view uses).
    A derived column off the struct shows downstream expressions stay
    codegen."""
    # spread (r16 §9): the JSON parse is scan-stage work and the
    # single-file fixture caps the scan at totalBytes/openCost splits
    # (6 at sf1) — far under the cores. Unlike the dim-table entries
    # (dq21 A/B'd: spreading part/orders regressed sf0.1 +83%), the
    # per-row parse here outweighs the added exchange at BOTH measured
    # scales: sf1 1.34 → 0.74 s, sf0.1 0.46 → 0.25 s (min-of-4, c32).
    ev = spread(load_table(spark, sf_dir, "events"))
    parsed = F.from_json("props", "k BIGINT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        parsed.getField("k").alias("k_typed"),
        (parsed.getField("k") % 10).alias("k_bucket"),
    )  # unsorted: order-insensitive gate hash; events-scale sort elided


@register(
    "dq25_supplier_stats",
    oracle="SELECT n_name, round(sum(s_acctbal), 2) AS acctbal_sum, "
    "count(*) AS suppliers FROM supplier s "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey "
    "GROUP BY n_name",
)
def dq25_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + agg over `supplier` (completes fixture-table
    coverage). nation broadcasts; supplier is never shuffled pre-agg."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("s_acctbal"), 2).alias("acctbal_sum"),
            F.count("*").alias("suppliers"),
        )
    )  # unsorted (gate hash)


@register(
    "dq22_23_temporal_joins",
    oracle="WITH c AS (SELECT event_id, user_id, ts FROM events "
    "WHERE event_type='click'), "
    "v AS (SELECT event_id, user_id, ts FROM events "
    "WHERE event_type='view'), "
    "j AS (SELECT c.event_id AS click_id, v.event_id AS view_id, "
    "row_number() OVER (PARTITION BY c.event_id "
    "ORDER BY v.ts DESC, v.event_id DESC) AS rn "
    "FROM c JOIN v ON v.user_id = c.user_id AND v.ts <= c.ts), "
    "e AS (SELECT event_id, user_id, ts FROM events "
    "WHERE event_type='error') "
    "SELECT 'asof' AS src, c.event_id, j.view_id AS matched_id, "
    "CAST(NULL AS BIGINT) AS n FROM c "
    "LEFT JOIN (SELECT click_id, view_id FROM j WHERE rn = 1) j "
    "ON j.click_id = c.event_id "
    "UNION ALL "
    "SELECT 'range', e.event_id, CAST(NULL AS BIGINT), "
    "CAST(count(c.user_id) AS BIGINT) "
    "FROM e LEFT JOIN c ON c.user_id = e.user_id "
    "AND c.ts >= e.ts - INTERVAL 1 DAY AND c.ts < e.ts "
    "GROUP BY e.event_id "
    "UNION ALL "
    "SELECT 'ijs', e.event_id, c.event_id, CAST(NULL AS BIGINT) "
    "FROM e JOIN c ON c.user_id = e.user_id "
    "AND c.ts >= e.ts - INTERVAL 1 DAY AND c.ts <= e.ts "
    "WHERE e.event_id % 17 = 0",
)
def dq22_23_temporal_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both temporal-join operators in one tagged entry (merged
    DQ22+DQ23 — the registry is pinned at 50 entries).

    'asof' rows: each 'click' event attributed to the same user's
    latest 'view' at or before it (ties on ts → highest view id). The
    oracle is the O(|clicks|·|views| per user) inequality-join
    formulation; the Spark side is the union-window algorithm in
    operators/asof.py — one shuffle, no row explosion, the plan a
    100 TB attribution job needs.

    'range' rows: for every 'error' event, how many clicks the same
    user made in the preceding 24 hours. The oracle states the naive
    inequality join DuckDB can afford at fixture scale; the Spark plan
    is the equi-join on (user, time-bucket) that survives 100 TB
    (operators/asof.py:range_join). Zero-click errors are kept by
    left-joining the pair counts back onto the error spine.

    'ijs' rows (r15, closing the streaming trio's last library-only
    proof): the SAME interval predicate executed as a REAL watermarked
    stream-stream join (streaming/stream.py:interval_join_stream) over
    two file streams of the fixture — errors (a deterministic 1/17
    id-slice, bounding the edge set) against all clicks of the same
    user within the preceding 24 h, bounds inclusive. Every surviving
    (error, click) edge is hash-checked against the oracle's
    relational inequality-join recompute: the batch branch above
    proves the SQL semantics, this branch proves bounded-state
    STREAMING execution produces the identical pair set — the
    reference's core stream-correctness claim (its restart/re-read
    identity, tests/batch_read.rs:596) in interval-join form. The
    watermark both sides carry is what lets Structured Streaming
    expire buffered state (state O(users × 24 h), never unbounded);
    inner-join edges emit eagerly, so the availableNow pass drains the
    complete set."""
    import uuid as _uuid

    from walrus_spark.operators.asof import range_join
    from walrus_spark.streaming.stream import interval_join_stream

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .select(F.col("event_id").alias("view_id"), "user_id", "ts")
    )
    asof_rows = asof_join(
        clicks,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_tiebreak="view_id",
        right_payload=["view_id"],
    ).select(
        F.lit("asof").alias("src"),
        "event_id",
        F.col("view_id").alias("matched_id"),
        F.lit(None).cast("long").alias("n"),
    )

    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    rclicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    pairs = range_join(
        errors,
        rclicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        lower_us=-86_400_000_000,
        upper_us=0,
        right_payload=["click_id"],
    )
    counts = pairs.groupBy("event_id").agg(
        F.count("*").alias("n_clicks_before")
    )
    range_rows = (
        errors.select("event_id")
        .join(counts, "event_id", "left")
        .select(
            F.lit("range").alias("src"),
            "event_id",
            F.lit(None).cast("long").alias("matched_id"),
            F.coalesce("n_clicks_before", F.lit(0)).alias("n"),
        )
    )

    # --- 'ijs': the streaming interval join (see docstring) ---
    from walrus_spark.queries.streaming_queries import _state_partitions

    path = f"{sf_dir}/events.parquet"
    raw_schema = spark.read.parquet(path).schema

    def _src() -> DataFrame:
        s = spark.readStream.schema(raw_schema).parquet(f"{sf_dir}/events.*")
        ts_type = dict(s.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) read as long
            s = s.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # watermarks need TIMESTAMP; session TZ is UTC so the
            # wall-clock instant is unchanged
            s = s.withColumn("ts", F.col("ts").cast("timestamp"))
        return s

    s_err = (
        _src()
        .where(
            (F.col("event_type") == "error") & (F.col("event_id") % 17 == 0)
        )
        .select("event_id", "user_id", F.col("ts").alias("e_ts"))
    )
    s_clk = (
        _src()
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("c_ts"),
        )
    )
    joined = interval_join_stream(
        s_err,
        s_clk,
        on="user_id",
        left_ts="e_ts",
        right_ts="c_ts",
        lower_us=-86_400_000_000,
        upper_us=0,
    ).select("event_id", "click_id")
    name = f"ijs_{_uuid.uuid4().hex[:8]}"
    # Inner-join edges emit eagerly, so the trailing NO-DATA micro-batch
    # (whose only job is advancing the watermark to evict state after
    # all data is processed) contributes nothing to the result here —
    # measured 3.2 → 1.85 s at sf0.1 with it off. State eviction itself
    # is pinned by tests/test_streaming.py::
    # test_interval_join_stream_matches_batch_and_drops_expired.
    nd_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev_nd = spark.conf.get(nd_key)
    spark.conf.set(nd_key, "false")
    try:
        with _state_partitions(spark, 4):  # user_id keys, not 32 stores
            q = (
                joined.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        spark.conf.set(nd_key, prev_nd)
    # memory-sink rows are driver-resident (LocalTableScan): read the
    # table directly instead of collect + re-upload (r15)
    ijs_rows = spark.table(name).select(
        F.lit("ijs").alias("src"),
        "event_id",
        F.col("click_id").alias("matched_id"),
        F.lit(None).cast("long").alias("n"),
    )

    # unsorted: order-insensitive gate hash; events-scale sort elided
    return asof_rows.unionByName(range_rows).unionByName(ijs_rows)


@register(
    "dq26_sessionization",
    oracle="WITH x AS (SELECT user_id, ts, value, event_id, "
    "CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id) >= INTERVAL 5 MINUTE THEN 1 ELSE 0 END AS brk "
    "FROM events), "
    "s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM x) "
    "SELECT user_id, min(ts) AS session_start, count(*) AS n_events, "
    "round(sum(value), 4) AS total_value FROM s GROUP BY user_id, sid",
)
def dq26_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user activity sessions closed by a 5-minute
    inactivity gap — Spark's built-in `session_window` (the same
    operator runs streaming with a watermark, where sessions merge
    incrementally in the state store). One shuffle on user_id; the
    oracle is the batch gaps-and-islands formulation."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "5 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )  # unsorted: order-insensitive gate hash; sessions-scale sort elided


# dq23's range join is merged into dq22_23_temporal_joins above.
