"""As-of (point-in-time) join — a custom operator the reference lacks.

For every left row, attach the single most recent right row with the
same key and ``right_ts <= left_ts``. The naive formulation (inequality
join then pick-latest) explodes to O(|L|·|R|) intermediate rows per key;
this implementation is the scalable union-window algorithm instead:

 1. tag both sides and UNION them on a common (key, ts) spine —
    a column-pruned union, no join yet;
 2. one shuffle: window ``PARTITION BY key ORDER BY (ts, side, tiebreak)``
    where right rows sort before left rows at equal ts (at-or-before
    semantics);
 3. ``last(right_payload, ignorenulls=True)`` over the running frame
    carries the latest preceding right row to each left row.

Cost is one exchange + one sort per input — identical to a sort-merge
join of the two sides, independent of how many right rows precede each
left row. Skewed keys are handled by AQE the same way a regular
sort-merge join would be.

Determinism: ties on ``right_ts`` are broken by the largest
``right_tiebreak`` (monotone id), so results are stable across runs —
required for the hash-checked oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
    right_payload: list[str],
) -> DataFrame:
    """Left as-of join: all left columns + ``right_payload`` columns from
    the latest right row per key with ``right_ts <= left_ts`` (NULLs when
    no right row precedes). ``right_tiebreak`` must be unique within
    (on, right_ts) groups for deterministic output."""
    l_cols = left.columns
    payload = [c for c in right_payload if c != right_tiebreak]

    lhs = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in l_cols],
        F.lit(None).cast("long").alias(f"__r_{right_tiebreak}"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in payload
        ],
    )
    rhs = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_tiebreak).cast("long").alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        F.col(right_tiebreak).cast("long").alias(f"__r_{right_tiebreak}"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    )

    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", F.col("__tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "__side",
        *l_cols,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in [right_tiebreak, *payload]
        ],
    )
    return carried.where(F.col("__side") == 1).select(
        *l_cols,
        *[
            F.col(f"__r_{c}").alias(c)
            for c in [right_tiebreak, *payload]
        ],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    right_payload: list[str],
) -> DataFrame:
    """Interval (range) join: pair every left row with the right rows of
    the same key whose timestamp falls in
    ``[left_ts + lower_us, left_ts + upper_us)`` microseconds.

    Spark plans a raw non-equi join as BroadcastNestedLoopJoin — a
    per-key O(|L|*|R|) scan that dies at scale. This operator makes it
    an EQUI-join on (key, time_bucket): bucket width W = the window
    span, the right side lands in bucket ``ts div W``, each left row
    probes the 2 buckets its window can touch (a tiny ``sequence``
    explode of bucket IDS — never of data rows), and the exact bounds
    are a post-join filter. Shuffle volume is O(2|L| + |R|) slim rows,
    hash-partitioned on (key, bucket), so sort-merge, broadcast, and
    AQE skew splitting all apply; no cross product beyond rows sharing
    a bucket ever exists.

    Integer ``div`` (not float division: epoch-us values are near
    double\'s exact-integer limit) truncates while bucketing needs
    floor — identical for the non-negative epoch values this operates
    on (pre-1970 timestamps would need a floordiv).

    Output: left columns + ``right_payload`` (inner semantics — a left
    row with no in-range partner emits nothing; left-join the output
    back to keep empties)."""
    w = upper_us - lower_us
    if w <= 0:
        raise ValueError("upper_us must exceed lower_us")
    l_cols = left.columns
    lhs = left.withColumn(
        "__lt", F.unix_micros(F.col(left_ts).cast("timestamp"))
    ).withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.expr(f"(__lt + ({lower_us})) div {w}"),
                F.expr(f"(__lt + ({upper_us})) div {w}"),
            )
        ),
    )
    rhs = (
        right.withColumn(
            "__rt", F.unix_micros(F.col(right_ts).cast("timestamp"))
        )
        .withColumn("__bkt", F.expr(f"__rt div {w}"))
        .select(
            F.col(on).alias("__rk"),
            "__rt",
            "__bkt",
            *[F.col(c) for c in right_payload],
        )
    )
    return (
        lhs.join(
            rhs,
            (F.col(on) == F.col("__rk")) & (lhs["__bkt"] == rhs["__bkt"]),
        )
        .where(
            (F.col("__rt") >= F.col("__lt") + F.lit(lower_us))
            & (F.col("__rt") < F.col("__lt") + F.lit(upper_us))
        )
        .select(*l_cols, *right_payload)
    )
