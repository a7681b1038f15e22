"""Inverted-index retrieval: build ONCE, query MANY.

bm25_topk / bm25_batch_topk (operators/text.py) recompute postings
from the corpus per call — right for ad-hoc queries, wrong for a
serving/eval loop that issues thousands of retrievals against a fixed
corpus. The production shape is an index ARTIFACT: one corpus scan +
one keyed shuffle writes term-sorted postings; every query after that
touches only the row groups holding its terms.

Layout (``build_inverted_index``):

  <path>/postings/     (term, doc_id, tf) — repartitionByRange(term)
                       + sortWithinPartitions(term, doc_id), so
                       parquet row-group min/max stats on `term` make
                       an IN-list predicate prune to the few row
                       groups containing the query's terms (verified:
                       PushedFilters In(term, [...]) in the scan).
  <path>/doc_lengths/  (doc_id, dl)
  <path>/stats/        1 row (N docs, S total tokens)

At 100 TB: the build is a tokenize scan + ONE (term, doc_id) shuffle
(the same order of work any single batch-BM25 call already pays), and
each query-side job reads O(matching postings) — not the corpus. The
index is plain parquet: no service, no driver state, safe to build
from one Spark job and query from thousands.

Incremental maintenance (``append_index_delta`` / ``compact_index``):
a growing corpus appends DELTA postings dirs (the LSM discipline —
each delta is one tokenize scan of the new docs only, never a
rebuild); queries read base ∪ deltas transparently; compaction folds
deltas back into one term-sorted base, restoring full row-group
pruning (delta files are term-sorted within themselves but span the
term range, so pruning degrades gracefully until compaction — the
classic LSM read-amplification trade, chosen explicitly).
Requirement: delta doc_ids are NEW (an update/delete would need a
tombstone layer — out of scope; append-only corpora are the
training-data reality).

Ties to the reference: none (the reference stores opaque bytes) —
north-star LLM-pipeline scope (SURVEY.md §2.5), the
retrieval-decontamination / eval-retrieval serving path.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from walrus_spark.operators.text import tokens

# Range partitions for the postings layout. On a cluster this tracks
# corpus size (aim for ~128 MB files); at test SFs a handful of files
# keeps row-group pruning observable without tiny-file overhead.
INDEX_PARTITIONS = 8


def index_cache_path(
    sf_dir: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """The cache location ensure_index uses for a source dir. The tag
    hashes the source path PLUS a content signature (mtime+size of the
    documents parquet, file or directory) and the column choices —
    richer than infra._tag's path-only scheme on purpose: regenerating
    fixtures in place, or asking for different columns, must MISS
    rather than silently serve a stale index."""
    import hashlib
    import tempfile

    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    sig = [os.path.abspath(sf_dir), text_col, id_col]
    try:
        if os.path.isdir(src):
            for f in sorted(os.listdir(src)):
                st = os.stat(os.path.join(src, f))
                sig.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
        else:
            st = os.stat(src)
            sig.append(f"{st.st_size}:{st.st_mtime_ns}")
    except OSError:
        pass
    tag = hashlib.md5("|".join(sig).encode()).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(), f"walrus_bm25_idx_{tag}"
    )


def ensure_index(
    spark: SparkSession,
    sf_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Idempotent per-(source, content, columns) index materialization
    (the ensure_buckets pattern, infra.py): built once under the
    system temp dir, reused by every later call — production charges
    the build to ingest, not to query latency. Builds land in a
    staging dir and atomically rename into place, so a concurrent
    reader never sees a half-written artifact."""
    from walrus_spark.catalog import load_table

    path = index_cache_path(sf_dir, text_col, id_col)
    if not os.path.exists(os.path.join(path, "stats", "_SUCCESS")):
        stage = f"{path}.build.{os.getpid()}"
        build_inverted_index(
            load_table(spark, sf_dir, "documents"),
            stage,
            text_col=text_col,
            id_col=id_col,
        )
        try:
            os.rename(stage, path)
        except OSError:
            # another process won the rename race — use its artifact
            import shutil

            shutil.rmtree(stage, ignore_errors=True)
    return path


def build_inverted_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int = INDEX_PARTITIONS,
) -> None:
    """Materialize the index artifact (overwrites ``path``).

    ONE corpus scan total: the tokenize+explode runs once, into the
    postings write; doc_lengths and stats then derive from reading the
    postings BACK (dl = Σ tf per doc — the filtered-token count by
    construction), which is postings-sized work, not corpus-sized.
    doc_lengths keeps its natural partitioning (it is O(n_docs) rows —
    a coalesce(1) would funnel billions of rows through one task at
    target scale); only the 1-row stats frame coalesces."""
    spark = docs.sparkSession
    w = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(tokens(F.col(text_col)), lambda x: x != "")
        ).alias("term"),
    )
    postings = w.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    (
        postings.repartitionByRange(partitions, "term")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "postings"))
    )
    dl = (
        spark.read.parquet(os.path.join(path, "postings"))
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("dl"))
    )
    dl.write.mode("overwrite").parquet(os.path.join(path, "doc_lengths"))
    (
        spark.read.parquet(os.path.join(path, "doc_lengths"))
        .agg(F.count("*").alias("N"), F.sum("dl").alias("S"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(path, "stats"))
    )


def _part_paths(path: str, name: str) -> list[str]:
    """Base dir + any committed delta dirs for an index component."""
    out = [os.path.join(path, name)]
    try:
        for d in sorted(os.listdir(path)):
            if d.startswith(f"{name}_delta_"):
                out.append(os.path.join(path, d))
    except OSError:
        pass
    committed = [
        p for p in out if os.path.exists(os.path.join(p, "_SUCCESS"))
    ]
    return committed or out[:1]


def append_index_delta(
    docs_delta: DataFrame,
    path: str,
    delta_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append NEW documents to an existing index as a delta: one
    tokenize scan of the delta docs writes postings_delta_<id> and
    doc_lengths_delta_<id>; the 1-row stats artifact is recomputed
    from ALL doc_lengths parts (doc-count-sized work, not
    corpus-sized) and swapped in. Callers guarantee delta doc_ids are
    disjoint from the existing index (append-only contract)."""
    spark = docs_delta.sparkSession
    w = docs_delta.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(tokens(F.col(text_col)), lambda x: x != "")
        ).alias("term"),
    )
    ppath = os.path.join(path, f"postings_delta_{delta_id}")
    (
        w.groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(ppath)
    )
    dl = (
        spark.read.parquet(ppath)
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("dl"))
    )
    dl.write.mode("overwrite").parquet(
        os.path.join(path, f"doc_lengths_delta_{delta_id}")
    )
    _rewrite_stats(spark, path)


def _rewrite_stats(spark: SparkSession, path: str) -> None:
    """Recompute the 1-row (N, S) stats from every doc_lengths part
    and swap it in via stage + rename (readers never see a torn
    stats dir)."""
    import shutil

    stage = os.path.join(path, f"stats.stage.{os.getpid()}")
    (
        spark.read.parquet(*_part_paths(path, "doc_lengths"))
        .agg(F.count("*").alias("N"), F.sum("dl").alias("S"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(stage)
    )
    old = os.path.join(path, "stats")
    shutil.rmtree(old, ignore_errors=True)
    os.rename(stage, old)


def compact_index(
    spark: SparkSession,
    path: str,
    partitions: int = INDEX_PARTITIONS,
) -> None:
    """Fold every delta back into ONE term-sorted base (restores full
    row-group pruning): read base ∪ deltas, re-range-partition on
    term, swap the new base in, drop the deltas. One postings-sized
    shuffle — never re-tokenizes the corpus. Readers racing a compact
    should hold an external lock (same caveat as any file-swap
    maintenance; the reference's vacuum makes the identical
    assumption)."""
    import shutil

    for name in ("postings", "doc_lengths"):
        parts = _part_paths(path, name)
        if len(parts) == 1:
            continue
        merged = spark.read.parquet(*parts)
        if name == "postings":
            merged = merged.repartitionByRange(
                partitions, "term"
            ).sortWithinPartitions("term", "doc_id")
        stage = os.path.join(path, f"{name}.stage.{os.getpid()}")
        merged.write.mode("overwrite").parquet(stage)
        shutil.rmtree(os.path.join(path, name), ignore_errors=True)
        os.rename(stage, os.path.join(path, name))
        for p in parts[1:]:
            shutil.rmtree(p, ignore_errors=True)


def bm25_topk_indexed(
    spark: SparkSession,
    path: str,
    queries: DataFrame | list[tuple[str, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    ordered_sum: bool = False,
) -> DataFrame:
    """BM25 top-k per query against a prebuilt index. Same scoring
    contract as bm25_batch_topk — (query_id, doc_id, score, rank),
    identical formula, identical ``ordered_sum`` determinism mode —
    but the corpus never rescans: postings/doc_lengths/stats load from
    the artifact.

    ``queries`` as a literal [(query_id, term), ...] list routes the
    term restriction through an IN-list predicate that parquet pushes
    into the postings scan — with the term-sorted layout, row groups
    without query terms are skipped entirely (the index point). A
    DataFrame of queries falls back to a broadcast semi-join (right
    when the query batch itself is too big to inline)."""
    postings = spark.read.parquet(*_part_paths(path, "postings"))
    dl = spark.read.parquet(*_part_paths(path, "doc_lengths"))
    g = spark.read.parquet(os.path.join(path, "stats"))

    if isinstance(queries, list):
        qdf = spark.createDataFrame(
            queries, "query_id string, term string"
        )
        terms = sorted({t for _q, t in queries})
        hits = postings.where(F.col("term").isin(terms))
    else:
        qdf = queries
        hits = postings.join(
            F.broadcast(qdf.select("term").distinct()), "term", "leftsemi"
        )

    term_stats = hits.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        qdf.join(F.broadcast(term_stats), "term")
        .join(hits, ["term"])
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(g))
    )
    avgdl = F.col("S").cast("double") / F.col("N").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("N").cast("double") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    norm = F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    contrib = (
        idf
        * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
        / (F.col("tf").cast("double") + F.lit(k1) * norm)
    )
    if ordered_sum:
        per = (
            scored.select("query_id", "doc_id", "term", contrib.alias("c"))
            .groupBy("query_id", "doc_id")
            .agg(
                F.sort_array(F.collect_list(F.struct("term", "c"))).alias(
                    "cs"
                )
            )
            .select(
                "query_id",
                "doc_id",
                F.round(
                    F.aggregate(
                        "cs", F.lit(0.0), lambda acc, x: acc + x["c"]
                    ),
                    6,
                ).alias("score"),
            )
        )
    else:
        per = (
            scored.select("query_id", "doc_id", contrib.alias("c"))
            .groupBy("query_id", "doc_id")
            .agg(F.round(F.sum("c"), 6).alias("score"))
        )
    from pyspark.sql.window import Window

    wnd = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), "doc_id"
    )
    return (
        per.withColumn("rank", F.row_number().over(wnd))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
