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
