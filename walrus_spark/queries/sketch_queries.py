"""Gate entries for the verifiable sketch family (operators/sketch.py).

Each entry hash-checks the SKETCH REGISTERS themselves against DuckDB
recomputing the identical construction (md5 double hashing / fixed-grid
binning) — the sketch is verified, not trusted — and then the decision
the sketch drives (decontamination candidates, heavy-hitter estimates,
quantile estimates) alongside.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from walrus_spark.catalog import load_table
from walrus_spark.operators.sketch import (
    BLOOM_K,
    BLOOM_M,
    CMS_D,
    CMS_W,
    bloom_positions,
    bloom_registers,
    cms_positions,
    cms_registers,
)
from walrus_spark.queries.registry import register

_NULL = lambda t: F.lit(None).cast(t)  # noqa: E731


# ---------------------------------------------------------------------------
# Bloom-gated decontamination: the 100 TB shape of pipeline_decontamination.
#
# decontaminate() broadcasts the eval suite's distinct 64-bit shingle
# hashes (~8 B/shingle). When the eval inventory outgrows comfortable
# broadcast (hundreds of millions of shingles), the classic move is a
# Bloom PRE-filter: broadcast a fixed 32 KiB-word register table
# instead, drop the overwhelming majority of train shingles in the
# scan stage, and exact-verify only bloom-passing candidates. The
# entry emits the funnel (probed / bloom-pass / exact-hit counts) so
# the false-positive behavior itself is hash-checked cross-engine.

_SPLIT_MULT = 2654435761
_SPLIT_MOD = 1 << 32

_BLOOM_ORACLE = f"""
WITH tagged AS (
  SELECT doc_id, text,
         ((doc_id * {_SPLIT_MULT}) % {_SPLIT_MOD}) % 100 < 5 AS is_eval
  FROM documents
), words AS (
  SELECT doc_id, is_eval,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
  FROM tagged
), idx AS (
  SELECT doc_id, is_eval, ws, unnest(generate_series(1, len(ws)-2)) AS i
  FROM words WHERE len(ws) >= 3
), sh AS (
  SELECT DISTINCT doc_id, is_eval,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM idx
), ev AS (
  SELECT DISTINCT s FROM sh WHERE is_eval
), evpos AS (
  SELECT (('0x' || substring(md5(s), 1, 12))::BIGINT
          + i.i * ('0x' || substring(md5(s), 13, 12))::BIGINT)
         % {BLOOM_M} AS pos
  FROM ev CROSS JOIN (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS i) i
), reg AS (
  SELECT pos // 32 AS word,
         bit_or((1::BIGINT) << CAST(pos % 32 AS INT)) AS bits
  FROM evpos GROUP BY 1
), tr AS (
  SELECT doc_id, s FROM sh WHERE NOT is_eval
), trn AS (
  SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY 1
), trpos AS (
  SELECT doc_id, s,
         (('0x' || substring(md5(s), 1, 12))::BIGINT
          + i.i * ('0x' || substring(md5(s), 13, 12))::BIGINT)
         % {BLOOM_M} AS pos
  FROM tr CROSS JOIN (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS i) i
), cand AS (
  SELECT t.doc_id, t.s,
         (count(*) FILTER (WHERE (COALESCE(r.bits, 0)
             & ((1::BIGINT) << CAST(t.pos % 32 AS INT))) <> 0))
         = {BLOOM_K} AS bpass
  FROM trpos t LEFT JOIN reg r ON r.word = t.pos // 32
  GROUP BY 1, 2
), ver AS (
  SELECT c.doc_id, c.bpass,
         (c.bpass AND e.s IS NOT NULL) AS ehit
  FROM cand c LEFT JOIN ev e ON c.bpass AND c.s = e.s
), perdoc AS (
  SELECT v.doc_id, any_value(n.n_shingles) AS n_shingles,
         count(*) AS n_probe,
         sum(CASE WHEN bpass THEN 1 ELSE 0 END) AS n_pass,
         sum(CASE WHEN ehit THEN 1 ELSE 0 END) AS n_hit
  FROM ver v JOIN trn n USING (doc_id) GROUP BY 1
)
SELECT 'reg' AS src, word, bits, CAST(NULL AS VARCHAR) AS key,
       CAST(NULL AS BIGINT) AS n, CAST(NULL AS BIGINT) AS doc_id
FROM reg
UNION ALL
SELECT 'stat', NULL, NULL, t.key, t.n, NULL FROM (
  SELECT 'probe_shingles' AS key, CAST(sum(n_probe) AS BIGINT) AS n
  FROM perdoc
  UNION ALL
  SELECT 'bloom_pass', CAST(sum(n_pass) AS BIGINT) FROM perdoc
  UNION ALL
  SELECT 'exact_hits', CAST(sum(n_hit) AS BIGINT) FROM perdoc
) t
UNION ALL
SELECT 'doc', NULL, NULL, NULL, NULL, doc_id FROM perdoc
WHERE n_hit * 1.0 / nullif(n_shingles, 0) >= 0.5
ORDER BY src, word, key, doc_id
"""


def bloom_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    frac_threshold: float = 0.5,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(registers, per_doc_funnel, contaminated_docs) via bloom-gated
    exact verification.

    Scale shape: the eval side collapses to a FIXED-size broadcast (the
    2^18-bit register table, ~32 KiB of words) regardless of eval
    inventory size; the train side probes it with K chained broadcast
    hash joins entirely inside the scan stage — no explode of probe
    positions, no shuffle of shingle strings — and only bloom-passing
    candidates reach the exact-verify join against the true hash set.
    The only exchange is the per-doc rollup, same as decontaminate()
    (pipeline.py:430). Bloom guarantees no false negatives, so
    candidates ⊇ truth and the verified result is EXACT.
    """
    from walrus_spark.operators.dedup import shingles

    # The register table is referenced by K broadcast joins below;
    # without lineage truncation Spark replans (and so recomputes) the
    # whole eval tokenize→distinct→aggregate subtree once per join.
    # localCheckpoint pins the ≤ m/32-row register table (and the
    # distinct shingle set feeding it + the verify hashes) to computed
    # blocks — lazily, so entry construction stays plan-only; the
    # blocks are context-cleaned when the frames go out of scope.
    ev_sh = (
        eval_docs.select(F.explode(shingles(F.col(text_col))).alias("s"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    reg = bloom_registers(ev_sh, "s").localCheckpoint(eager=False)
    ev64 = ev_sh.select(F.xxhash64("s").alias("ev64"))

    pr = (
        train.select(
            F.col(id_col).alias("doc_id"), shingles(F.col(text_col)).alias("sh")
        )
        .select(
            "doc_id",
            F.size("sh").alias("n_shingles"),
            F.explode("sh").alias("s"),
        )
        .select(
            "doc_id",
            "n_shingles",
            F.xxhash64("s").alias("s64"),
            bloom_positions(F.col("s")).alias("ps"),
        )
    )
    for i in range(BLOOM_K):
        pr = pr.withColumn(
            f"w{i}", F.floor(F.col("ps")[i] / 32).cast("long")
        ).withColumn(f"b{i}", (F.col("ps")[i] % 32).cast("int"))
    for i in range(BLOOM_K):
        r = reg.select(
            F.col("word").alias(f"rw{i}"), F.col("bits").alias(f"bits{i}")
        )
        pr = pr.join(F.broadcast(r), F.col(f"w{i}") == F.col(f"rw{i}"), "left")
    hits = [
        F.expr(
            f"(coalesce(bits{i}, CAST(0 AS BIGINT))"
            f" & shiftleft(CAST(1 AS BIGINT), b{i})) != 0"
        )
        for i in range(BLOOM_K)
    ]
    pr = pr.withColumn("bpass", reduce(lambda a, b: a & b, hits))
    # exact verify ONLY bloom-passing candidates (the funnel's point);
    # equi-key s64 keeps this a broadcast HASH join, bpass is a filter
    pr = pr.join(
        F.broadcast(ev64),
        F.col("bpass") & (F.col("s64") == F.col("ev64")),
        "left",
    ).withColumn("ehit", F.col("bpass") & F.col("ev64").isNotNull())

    perdoc = pr.groupBy("doc_id").agg(
        F.first("n_shingles").alias("n_shingles"),
        F.count("*").alias("n_probe"),
        F.sum(F.col("bpass").cast("long")).alias("n_pass"),
        F.sum(F.col("ehit").cast("long")).alias("n_hit"),
    )
    contaminated = perdoc.where(
        F.col("n_hit") / F.nullif(F.col("n_shingles"), F.lit(0))
        >= frac_threshold
    ).select("doc_id")
    return reg, perdoc, contaminated


@register("sketch_bloom_decontam", oracle=_BLOOM_ORACLE)
def sketch_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union hash-checking the whole bloom-decontamination
    funnel: 'reg' rows = the Bloom register table over the eval split's
    shingles (the filter itself, word-for-word); 'stat' rows = probed /
    bloom-pass / exact-hit shingle counts (the false-positive rate is
    thus pinned cross-engine); 'doc' rows = contaminated train docs —
    which equal pipeline_decontamination's flags because bloom-then-
    verify is exact (test_bloom_decontam_equals_exact)."""
    from walrus_spark.operators.pipeline import train_val_split

    d = train_val_split(load_table(spark, sf_dir, "documents"))
    reg, perdoc, contaminated = bloom_decontaminate(
        d.where(F.col("split") == "train").drop("split"),
        d.where(F.col("split") == "val").drop("split"),
    )
    reg_rows = reg.select(
        F.lit("reg").alias("src"),
        F.col("word"),
        F.col("bits"),
        _NULL("string").alias("key"),
        _NULL("long").alias("n"),
        _NULL("long").alias("doc_id"),
    )
    stat_rows = (
        perdoc.agg(
            F.sum("n_probe").alias("p"),
            F.sum("n_pass").alias("bp"),
            F.sum("n_hit").alias("eh"),
        )
        .select(
            F.expr(
                "stack(3, 'probe_shingles', p, 'bloom_pass', bp,"
                " 'exact_hits', eh) AS (key, n)"
            )
        )
        .select(
            F.lit("stat").alias("src"),
            _NULL("long").alias("word"),
            _NULL("long").alias("bits"),
            "key",
            "n",
            _NULL("long").alias("doc_id"),
        )
    )
    doc_rows = contaminated.select(
        F.lit("doc").alias("src"),
        _NULL("long").alias("word"),
        _NULL("long").alias("bits"),
        _NULL("string").alias("key"),
        _NULL("long").alias("n"),
        F.col("doc_id"),
    )
    return (
        reg_rows.unionByName(stat_rows)
        .unionByName(doc_rows)
        .orderBy("src", "word", "key", "doc_id")
    )


# ---------------------------------------------------------------------------
# Count-Min heavy hitters: verifiable frequency sketch + top-k tokens.

_CMS_ORACLE = f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM documents
), tc AS (
  SELECT token, count(*) AS exact_cnt FROM toks WHERE token <> ''
  GROUP BY 1
), pos AS (
  SELECT token, exact_cnt, i.i AS row_i,
         (('0x' || substring(md5(token), 1, 12))::BIGINT
          + i.i * ('0x' || substring(md5(token), 13, 12))::BIGINT)
         % {CMS_W} AS bucket
  FROM tc CROSS JOIN (SELECT unnest(generate_series(0, {CMS_D - 1})) AS i) i
), reg AS (
  SELECT row_i, bucket, CAST(sum(exact_cnt) AS BIGINT) AS cnt
  FROM pos GROUP BY 1, 2
), top AS (
  SELECT token FROM tc ORDER BY exact_cnt DESC, token LIMIT 20
), est AS (
  SELECT p.token, p.exact_cnt, min(r.cnt) AS cms_est
  FROM pos p
  JOIN top t ON t.token = p.token
  JOIN reg r ON r.row_i = p.row_i AND r.bucket = p.bucket
  GROUP BY 1, 2
)
SELECT 'reg' AS src, row_i, bucket, cnt, CAST(NULL AS VARCHAR) AS token,
       CAST(NULL AS BIGINT) AS exact_cnt, CAST(NULL AS BIGINT) AS cms_est
FROM reg
UNION ALL
SELECT 'hh', NULL, NULL, NULL, token, exact_cnt, CAST(cms_est AS BIGINT)
FROM est
ORDER BY src, row_i, bucket, token
"""


@register("sketch_cms_heavy_hitters", oracle=_CMS_ORACLE)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union: 'reg' rows = the Count-Min register table over the
    corpus's token frequencies (hash-checked register-for-register);
    'hh' rows = the top-20 tokens by exact count with their CMS
    estimate — estimate >= exact always (containment contract,
    test_cms_estimate_bounds_and_merge proves it plus mergeability
    under forced collisions).

    Scale: ONE corpus scan feeds the exact count frame (map-side
    combined groupBy token); registers derive from the count frame
    (shuffle O(d*w) = 4096 rows); the estimate probe joins top-k
    against the broadcast register table. At 100 TB you would persist
    the count frame once and sketch/rank from it."""
    from walrus_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("exact_cnt"))
    )
    reg = cms_registers(tc, "token", "exact_cnt")
    top = tc.orderBy(F.col("exact_cnt").desc(), "token").limit(20)
    probe = top.select(
        "token",
        "exact_cnt",
        F.posexplode(cms_positions(F.col("token"))).alias("row_i", "bucket"),
    )
    est = (
        probe.join(F.broadcast(reg), ["row_i", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    reg_rows = reg.select(
        F.lit("reg").alias("src"),
        F.col("row_i").cast("long"),
        F.col("bucket"),
        F.col("cnt"),
        _NULL("string").alias("token"),
        _NULL("long").alias("exact_cnt"),
        _NULL("long").alias("cms_est"),
    )
    hh_rows = est.select(
        F.lit("hh").alias("src"),
        _NULL("long").alias("row_i"),
        _NULL("long").alias("bucket"),
        _NULL("long").alias("cnt"),
        "token",
        "exact_cnt",
        "cms_est",
    )
    return reg_rows.unionByName(hh_rows).orderBy(
        "src", "row_i", "bucket", "token"
    )


# ---------------------------------------------------------------------------
# Quantile histogram over lineitem prices: the 4th verifiable sketch
# (cardinality / membership / frequency / quantiles).

_HIST_PS = [0.25, 0.5, 0.75, 0.9, 0.99]

_HIST_ORACLE = """
WITH reg AS (
  SELECT CAST(least(greatest(floor((l_extendedprice - 0.0::DOUBLE)
                                   / 100.0::DOUBLE), 0), 1099) AS BIGINT)
             AS bin,
         count(*) AS cnt
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1
), c AS (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin) AS cum,
         sum(cnt) OVER () AS n
  FROM reg
), q AS (
  SELECT p.p, bin, cnt, cum, n
  FROM c CROSS JOIN (
    SELECT unnest([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE,
                   0.9::DOUBLE, 0.99::DOUBLE]) AS p) p
  WHERE (cum - cnt) < p.p * n AND p.p * n <= cum
)
SELECT 'bin' AS src, bin, CAST(cnt AS BIGINT) AS cnt,
       CAST(NULL AS DOUBLE) AS p, CAST(NULL AS DOUBLE) AS est
FROM reg
UNION ALL
SELECT 'q', NULL, NULL, p,
       round(0.0::DOUBLE + 100.0::DOUBLE
             * (bin + (p * n - (cum - cnt)) / cnt), 6)
FROM q
ORDER BY src, bin, p
"""


@register("sketch_quantile_histogram", oracle=_HIST_ORACLE)
def sketch_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union: 'bin' rows = the fixed-grid histogram registers
    over l_extendedprice (grid [0, 110000) x 1100 declared in the
    sketch config — hash-checked bin-for-bin); 'q' rows = interpolated
    quantile estimates at 5 probe points, the identical IEEE
    arithmetic on both engines. Registers merge by per-bin SUM
    (test_histogram_quantiles_accuracy_and_merge); the shuffle is
    O(nbins) after partial aggregation, the quantile math is
    bin-bounded."""
    from walrus_spark.operators.sketch import (
        histogram_quantiles,
        histogram_registers,
    )

    li = load_table(spark, sf_dir, "lineitem")
    reg = histogram_registers(li, "l_extendedprice").localCheckpoint(
        eager=False
    )
    bins = reg.select(
        F.lit("bin").alias("src"),
        "bin",
        "cnt",
        _NULL("double").alias("p"),
        _NULL("double").alias("est"),
    )
    qs = histogram_quantiles(reg, _HIST_PS).select(
        F.lit("q").alias("src"),
        _NULL("long").alias("bin"),
        _NULL("long").alias("cnt"),
        "p",
        "est",
    )
    return bins.unionByName(qs).orderBy("src", "bin", "p")
