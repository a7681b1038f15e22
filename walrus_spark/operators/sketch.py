"""Mergeable, cross-engine-verifiable sketches (the "novel sketch"
operator class): HyperLogLog cardinality, Bloom membership, Count-Min
frequency.

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


# ---------------------------------------------------------------------------
# Bloom filter: engine-independent membership registers.
#
# Same design philosophy as hll_registers — Spark ships a built-in
# BloomFilterAggregate (DataFrameStatFunctions.bloomFilter), but its
# bit array is engine-private. These registers use md5 double hashing
# (Kirsch-Mitzenmacher: pos_i = (h1 + i*h2) mod m) over 32-bit words,
# so DuckDB recomputes the identical word table and the gate can
# hash-check the FILTER ITSELF. Registers merge by per-word bit-OR —
# across partitions, corpora, days.

BLOOM_M = 1 << 18  # bits (32 KiB of words) — plenty for eval-suite keys
BLOOM_K = 5  # probes; fpp ~ (1 - e^{-kn/m})^k
_BLOOM_WORD = 32  # bits per register word (1<<31 stays positive in i64)


def bloom_positions(col: Column, m: int = BLOOM_M, k: int = BLOOM_K) -> Column:
    """Array of k bit positions for a value: double hashing over md5.

    h1 = first 48 bits, h2 = next 48 bits of md5(value); position i is
    (h1 + i*h2) mod m. Exact integer arithmetic both engines:
    h1 + (k-1)*h2 < 5 * 2^48 < 2^63."""
    h = F.md5(F.encode(col.cast("string"), "UTF-8"))
    h1 = _hex_long(h, 1, 12)
    h2 = _hex_long(h, 13, 12)
    return F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)])


def bloom_registers(
    df: DataFrame, col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """(word, bits) register table of a Bloom filter over ``col``.

    word = pos div 32, bits = bit-OR of (1 << pos mod 32). Only words
    with at least one set bit appear (sparse form) — membership treats
    an absent word as all-zeros. Shuffle is O(m/32) words, never rows."""
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(bloom_positions(F.col(col), m, k)).alias("pos"))
        .select(
            F.floor(F.col("pos") / _BLOOM_WORD).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
                "w1"
            ),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(w1)").alias("bits"))
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: engine-independent frequency registers.

CMS_D = 4  # hash rows
CMS_W = 1024  # buckets per row


def cms_positions(col: Column, d: int = CMS_D, w: int = CMS_W) -> Column:
    """Array of d bucket indices (row i probes bucket arr[i])."""
    h = F.md5(F.encode(col.cast("string"), "UTF-8"))
    h1 = _hex_long(h, 1, 12)
    h2 = _hex_long(h, 13, 12)
    return F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(w)) for i in range(d)])


def cms_registers(
    counts: DataFrame,
    key_col: str,
    cnt_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """(row_i, bucket, cnt) Count-Min register table from an exact
    per-key count frame (compute the counts once, sketch from them —
    at 100 TB the count frame is the partial-aggregated token scan).

    Estimate(key) = min over rows i of register[i][bucket_i(key)];
    always >= the true count (containment). Registers merge by
    per-(row, bucket) SUM across partitions / corpora / days. Shuffle
    is O(d*w) registers after map-side partial aggregation."""
    return (
        counts.select(
            F.posexplode(cms_positions(F.col(key_col), d, w)).alias(
                "row_i", "bucket"
            ),
            F.col(cnt_col).alias("c"),
        )
        .groupBy("row_i", "bucket")
        .agg(F.sum("c").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Quantile histogram: engine-independent mergeable quantile registers.
#
# Production quantile sketches (t-digest, KLL, GK — what
# approx_percentile uses) have engine-private state. A fixed-grid
# histogram trades adaptivity for verifiability: the grid (lo, hi,
# nbins) is part of the sketch's declared config, bin assignment is
# exact IEEE arithmetic identical in every engine, registers merge by
# per-bin SUM, and quantiles come from cumulative interpolation over
# <= nbins rows. Out-of-range values clamp into the edge bins, so the
# estimate degrades loudly at the edges instead of failing.

HIST_LO = 0.0
HIST_HI = 110_000.0
HIST_BINS = 1100  # width 100.0


def histogram_registers(
    df: DataFrame,
    col: str,
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    nbins: int = HIST_BINS,
) -> DataFrame:
    """(bin, cnt) register table: bin = clamp(floor((x-lo)/width)).

    One scan + one groupBy on an int key with partial aggregation —
    shuffle volume O(nbins), never rows. Merge across partitions /
    corpora / days by per-bin SUM (same grid required)."""
    width = (hi - lo) / nbins
    b = (
        F.least(
            F.greatest(
                F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(0)
            ),
            F.lit(nbins - 1),
        )
        .cast("long")
        .alias("bin")
    )
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(b)
        .agg(F.count("*").alias("cnt"))
    )


def histogram_quantiles(
    registers: DataFrame,
    ps: list[float],
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    nbins: int = HIST_BINS,
) -> DataFrame:
    """(p, est) linear-interpolated quantiles from a register table.

    est = lo + width * (bin + (p*N - cum_prev)/cnt) for the unique bin
    with cum_prev < p*N <= cum. All arithmetic is over the <= nbins
    register rows (the single-partition window is bin-bounded, never
    row-bounded). Probe points must lie in (0, 1]: p=0 has no bin with
    cum_prev < 0 and would silently return no row — rejected loudly
    instead (ask for the minimum via the first bin's lower edge)."""
    bad = [p for p in ps if not (0.0 < float(p) <= 1.0)]
    if bad:
        raise ValueError(f"quantile probes must be in (0, 1]: {bad}")
    from pyspark.sql.window import Window

    width = (hi - lo) / nbins
    cum = F.sum("cnt").over(
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = registers.agg(F.sum("cnt").alias("n"))
    pcol = F.explode(
        F.array(*[F.lit(float(p)) for p in ps])
    ).alias("p")
    t = F.col("p") * F.col("n")
    return (
        registers.select("bin", "cnt", cum.alias("cum"))
        .crossJoin(F.broadcast(tot))
        .select("bin", "cnt", "cum", "n", pcol)
        .where((F.col("cum") - F.col("cnt") < t) & (t <= F.col("cum")))
        .select(
            "p",
            F.round(
                F.lit(lo)
                + F.lit(width)
                * (
                    F.col("bin")
                    + (t - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
                ),
                6,
            ).alias("est"),
        )
    )
