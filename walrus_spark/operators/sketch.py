"""Mergeable cardinality sketches (the "novel sketch" operator class).

``hll_registers`` is a HyperLogLog whose registers are ENGINE-
INDEPENDENT and integer-exact: the hash is md5 (identical everywhere),
the bucket is the first p/4 hex digits, and the rank comes from the
bit-length of the remaining 52-bit value — all computable with exact
integer/string builtins in both Spark (conv/bin/length) and ANSI-ish
SQL (DuckDB hex cast + bin), so two engines produce the SAME register
table and the gate can hash-check a sketch, not just trust it.

Contrast `approx_count_distinct`: Spark's built-in HLL++ is the right
production default, but its registers are engine-private — nothing
outside Spark can verify or merge them. This sketch trades a little
speed for verifiability and cross-system mergeability (registers merge
by per-bucket MAX — across partitions, across corpora, across days).

Scale: one scan + one groupBy on a p-bit bucket key (4096 groups at
p=12) with partial aggregation — shuffle volume is O(buckets), never
O(rows). The estimate itself is driver-side arithmetic over ≤2^p ints.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

HLL_P = 12  # 4096 buckets; must be a multiple of 4 (hex alignment)
_HLL_W = 52  # value bits after the bucket prefix (13 hex digits)


def _hex_long(col: Column, start: int, n: int) -> Column:
    return F.conv(F.substring(col, start, n), 16, 10).cast("long")


def hll_registers(
    df: DataFrame, col: str, p: int = HLL_P
) -> DataFrame:
    """(bucket, max_rho) register table of an HLL sketch over ``col``.

    bucket = first p bits of md5(value); rho = leftmost-1-bit position
    of the next 52 bits (53 when they are all zero). Registers are the
    per-bucket MAX of rho — the mergeable form: union register tables
    and re-take the max to combine sketches."""
    if p % 4:
        raise ValueError("p must be a multiple of 4 (hex-digit aligned)")
    h = F.md5(F.encode(F.col(col).cast("string"), "UTF-8"))
    v = _hex_long(h, p // 4 + 1, _HLL_W // 4)
    rho = F.when(v == 0, F.lit(_HLL_W + 1)).otherwise(
        F.lit(_HLL_W + 1) - F.length(F.bin(v))
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(
            _hex_long(h, 1, p // 4).alias("bucket"), rho.alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers, p: int = HLL_P) -> float:
    """Cardinality estimate from a collected register table (list of
    (bucket, max_rho) rows or tuples) — standard HLL with the small-
    range linear-counting correction. Driver-side: ≤2^p integers."""
    m = 1 << p
    regs = [0] * m
    for r in registers:
        b, mr = (r["bucket"], r["max_rho"]) if hasattr(r, "__getitem__") and not isinstance(r, tuple) else r
        regs[int(b)] = int(mr)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / sum(2.0 ** -x for x in regs)
    zeros = regs.count(0)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est
