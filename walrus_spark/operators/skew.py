"""Skew-mitigation joins: salting for hot keys.

AQE's skew-join split (enabled in session defaults, RUNTIME_CONFS)
handles most skew at runtime by splitting oversized partitions of a
sort-merge join. Salting is the complementary STATIC technique for the
case AQE can't fix: a shuffled join where one key is so hot that even a
split partition re-concentrates on the same reducer in the next stage,
or a pre-AQE engine/plan shape. The classic recipe (e.g. Spark
Definitive Guide; also what the reference's segment rotation does for
write hot-spots, distributed-walrus/src/monitor.rs:56-145 — rotate the
hot unit across owners):

  - fact side: append a deterministic salt in [0, k) to each row's key;
  - dim/build side: replicate each row k times, once per salt value;
  - join on (key, salt): the hot key's rows now spread over k reducers.

Replication multiplies the smaller side by k, so k trades skew width
against shuffle volume — size it to the observed hot-key factor.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


# Join types for which replicating the small side k-fold preserves the
# unsalted join's semantics. Right/full-outer do NOT belong here: each
# unmatched small-side row would emit k null-padded rows (one per salt
# replica) instead of one, silently multiplying the outer fringe.
_SAFE_HOW = {
    "inner",
    "left",
    "left_outer",
    "leftouter",
    "semi",
    "left_semi",
    "leftsemi",
    "anti",
    "left_anti",
    "leftanti",
}


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `skewed` ⋈ `small` on column `on`, salted k ways.

    The salt is a deterministic hash of the whole skewed row
    (xxhash64 over its columns, mod k) — reproducible across retries,
    and uniform even when the join key itself has one dominant value.
    `small` is exploded k-fold via a literal salt array (a codegen'd
    Generate, no shuffle of its own). For the permitted join types the
    result is EXACTLY the unsalted join: salt columns never escape,
    and every skewed-side row sees the full set of small-side matches.

    Only skewed-side-preserving joins are allowed (inner / left /
    semi / anti). Right and full outer joins are rejected: the k-fold
    replication would emit k null-padded rows for every unmatched
    small-side row, which is NOT the unsalted result.

    Use when one side fits the k-fold replication budget but not a
    broadcast (a broadcast join needs no salting — no shuffle exists).
    """
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SAFE_HOW
    }:
        raise ValueError(
            f"salted_join: how={how!r} is not equivalence-preserving "
            "under small-side replication (unmatched small rows would "
            f"emit {n_salts} null-padded rows). Allowed: inner, left, "
            "left_semi, left_anti."
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)
    )
    left = skewed.withColumn("_salt", salt)
    right = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return left.join(right, [on, "_salt"], how).drop("_salt")
