"""SparkSession factory with scale-oriented defaults.

The same settings we would ship on a 1000-executor cluster, modulo
local-mode sizing: AQE on (skew-join + partition coalescing at runtime),
broadcast threshold sized for the dimension tables, Arrow enabled for
the pandas-UDF operators, UTC session time so results match the DuckDB
oracle's naive timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that are safe (and desired) to apply to an externally-created
# session at runtime — e.g. the driver's verify session.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet stores TIMESTAMP(NANOS); Spark reads it as LongType
    # under this flag and walrus_spark.catalog converts to timestamp.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # dimension tables (region/nation/customer/part/supplier at test SF,
    # centroid/query-vector frames) should always broadcast
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # keep shuffle output files bounded; AQE coalesces small partitions
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    # Spark 4.1 writes a checksum companion for EVERY checkpoint file
    # (offset log, commit log, each state-store delta — verified by
    # listing a probe checkpoint: 2 extra files per store per
    # micro-batch, each its own create+rename round trip; on object
    # stores each is a billable PUT). That roughly doubles the
    # checkpoint file ops of every stateful micro-batch to detect a
    # corruption class Spark <= 4.0 never detected either; the WAL/
    # state recovery semantics are unchanged. Restore the 4.0 write
    # profile (r16; guide §5 — the stateful-stream fixed floor is
    # checkpoint I/O).
    "spark.sql.streaming.checkpoint.fileChecksum.enabled": "false",
}

# STATIC confs — session-builder only (CANNOT_MODIFY_STATIC_CONFIG at
# runtime, so apply_runtime_confs cannot retrofit them onto an
# externally-created session; get_spark sessions get them).
BUILDER_CONFS: dict[str, str] = {
    # PySpark 4 wraps EVERY DataFrame API call to capture its Python
    # call site for error enrichment: getActiveSession + a conf read +
    # a JVM origin set/clear + a traceback walk per call — measured
    # 4+ Py4J round trips each, ~1.2 s of the 2.7 s text_vocab plan
    # BUILD (r12 cProfile: 9489 round trips per build). Query plans
    # are rebuilt per execution, so this is steady-state overhead, not
    # a one-off; trade the call-site line in AnalysisException
    # messages for it.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent),
    and ship the walrus_spark package to the Python workers.

    cloudpickle serializes the Arrow-batched operators (mapInPandas /
    applyInPandasWithState) by MODULE REFERENCE, so worker processes
    must be able to `import walrus_spark`. When the driver runs from
    the repo root that's free (inherited cwd); addPyFile makes it true
    from ANY cwd — e.g. an externally-created session in a different
    working directory — by distributing a zip of the package once.

    Applied ONCE per SESSION: the conf loop is ~11 Py4J round trips
    and load_table calls this on every table open, so re-running it
    per entry is pure per-entry floor (r9 verdict directive #1b). The
    guard is a sentinel SQL conf on the session itself — NOT a
    SparkContext attribute (r10 advisor finding: these are per-session
    SQL confs, and a context-level guard silently skipped every second
    session sharing the context, e.g. spark.newSession(), breaking
    events.ts nanos parsing and UTC oracle semantics there). The
    sentinel travels exactly with what it guards: a cloned session
    inherits the confs AND the sentinel; a fresh newSession() starts
    from builder defaults and inherits neither, so it re-applies."""
    sc = spark.sparkContext
    if spark.conf.get("spark.walrus.runtimeConfsApplied", None) != "true":
        for k, v in RUNTIME_CONFS.items():
            try:
                spark.conf.set(k, v)
            except Exception:
                # static conf on this build — leave as-is
                pass
        spark.conf.set("spark.walrus.runtimeConfsApplied", "true")
    # BLAS pin for externally-created sessions (e.g. the driver's
    # plain session): get_spark pins before the JVM launches, but a
    # session we did not build needs the retrofit. sc.environment is
    # read every time a Python function is pickled for workers, and
    # the worker daemon is keyed by its envVars, so this takes effect
    # for all subsequently-created UDF/Arrow stages. setdefault both
    # places: an explicit user sizing wins.
    try:
        task_cpus = int(spark.conf.get("spark.task.cpus", "1") or "1")
    except Exception:  # noqa: BLE001
        task_cpus = 1
    _pin_blas_threads(task_cpus)
    for k in _BLAS_ENV_KEYS:
        sc.environment.setdefault(k, os.environ.get(k, str(task_cpus)))
    if not getattr(sc, "_walrus_pyfiles_shipped", False):
        try:
            import tempfile
            import zipfile

            pkg_dir = os.path.dirname(os.path.abspath(__file__))
            zpath = os.path.join(
                tempfile.gettempdir(),
                f"walrus_spark_pyfiles_{os.getpid()}.zip",
            )
            with zipfile.ZipFile(zpath, "w") as zf:
                for root, _dirs, files in os.walk(pkg_dir):
                    for f in files:
                        if f.endswith(".py"):
                            full = os.path.join(root, f)
                            rel = os.path.relpath(
                                full, os.path.dirname(pkg_dir)
                            )
                            zf.write(full, rel)
            sc.addPyFile(zpath)
        except Exception:
            # best-effort: repo-root drivers work without it
            pass
        sc._walrus_pyfiles_shipped = True
    return spark


def release_session_caches(spark: SparkSession | None = None) -> None:
    """Uniform between-stages release hook (r6 capstone finding,
    PERF_r06 §10): a long-lived session running many operators
    back-to-back accumulates memoized frames (shared shingle sets,
    sketch registers), catalog-cached tables, and JVM storage blocks
    pinned by localCheckpoint lineage truncation — stacked 100×
    workloads ran 2–4× slower than isolated because each stage paid
    the previous stages' storage-memory rent. Call this when a
    pipeline stage finishes and its frames won't be reused.

    Releases, in order: every operator-layer memo cache (their own
    clear hooks), the catalog cache, EVERY persistent RDD in the
    block manager, python-side refs (gc — Py4J finalizers are what
    let Spark's ContextCleaner reclaim broadcast blocks), then a JVM
    GC nudge so the cleaner runs now rather than at the next
    allocation stall.

    CONTRACT WARNING — this is the release-EVERYTHING hook: it
    assumes no persisted frame in the session is still needed. A
    plain .cache()d frame that is still referenced survives
    correctly (its next action silently recomputes), but a
    localCheckpoint()ed frame does NOT: unpersisting truncated
    lineage is unrecoverable, and the next action on such a frame
    raises 'Checkpoint block not found' instead of recomputing. Do
    not call this while any live DataFrame you intend to reuse was
    pinned via localCheckpoint (the connected-components /
    sketch-register pattern); finish or re-derive those first."""
    from walrus_spark.catalog import clear_table_handles
    from walrus_spark.operators.dedup import (
        clear_shared_pairs,
        clear_shared_positions,
        clear_shared_sets,
    )
    from walrus_spark.operators.multimodal import clear_shared_media
    from walrus_spark.operators.similarity import clear_shared_kmeans
    from walrus_spark.operators.text import clear_shared_tokens
    from walrus_spark.queries.sketch_queries import clear_sketch_frames

    clear_shared_sets()
    clear_shared_positions()
    clear_shared_pairs()
    clear_shared_tokens()
    clear_sketch_frames()
    clear_shared_kmeans()
    clear_shared_media()
    clear_table_handles()
    if spark is not None:
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001  # session already stopped
            pass
        # clearCache only drops catalog-cached plans; RDD-level
        # persists (localCheckpoint truncation blocks, .cache()d
        # frames held by still-live python refs) survive it. This IS
        # the release-everything hook, so drain the block manager
        # explicitly rather than waiting on GC reachability.
        try:
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist(False)
        except Exception:  # noqa: BLE001
            pass
    import gc

    gc.collect()
    if spark is not None:
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass


# BLAS threads per TASK. Spark's parallelism model already fills every
# core with tasks, so library-level threading inside each task
# oversubscribes: numpy's bundled OpenBLAS (wheel lib, MAX_THREADS=64)
# defaults to ONE THREAD PER CORE per process — 32 concurrent Arrow
# workers × 32 spin-waiting GEMM threads contend for the same 32
# cores. Measured at sf1 (min-of-3 warm, same window): sim_knn_join
# 18.7 → 3.0 s, dedup_embedding_cosine 4.6 → 1.3 s purely from
# pinning GEMM to 1 thread/task — and the chaotic cross-window swings
# those entries showed all round were this contention. The correct
# per-task thread count at ANY scale is spark.task.cpus (default 1):
# a cluster that allocates 4 cores per task should let BLAS use 4.
# The one principled exception — a stage whose task count is bounded
# below the core count by the algorithm — re-raises locally and
# scoped (similarity._blas_thread_fns / semantic_dedup's prune).
_BLAS_ENV_KEYS = (
    "OPENBLAS_NUM_THREADS",  # this numpy's backend (measured)
    "OMP_NUM_THREADS",  # OpenMP-built BLAS / sklearn portability
    "MKL_NUM_THREADS",  # MKL-built numpy portability
)


def _pin_blas_threads(n: int) -> None:
    """setdefault, not overwrite: an operator or user that explicitly
    sized library threading keeps their setting.

    The env pin only takes effect for libraries loaded AFTER it —
    OpenBLAS reads OPENBLAS_NUM_THREADS at .so load — and the driver
    process has typically already imported numpy by the time a session
    is created (r15 advisor: the retrofit was a driver-side no-op).
    So additionally retrofit the pin onto the ALREADY-LOADED OpenBLAS
    via its ctypes thread control, honoring whatever value the env
    holds post-setdefault (an explicit user sizing wins). Degrades to
    a no-op on non-OpenBLAS backends, same as the scoped raise in
    operators/similarity.py."""
    for k in _BLAS_ENV_KEYS:
        os.environ.setdefault(k, str(n))
    try:
        from walrus_spark.operators.similarity import _blas_thread_fns

        get_fn, set_fn = _blas_thread_fns()
        if set_fn is not None:
            target = int(os.environ.get("OPENBLAS_NUM_THREADS", str(n)))
            if int(get_fn()) != target:
                set_fn(target)
    except Exception:  # noqa: BLE001
        pass


def get_spark(app_name: str = "walrus-spark", cpus: int | None = None) -> SparkSession:
    """Create (or get) a tuned local SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. Shuffle
    partitions track the core count — on a real cluster this would be
    2-3× total executor cores and AQE coalesces from there.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    task_cpus = int(os.environ.get("SPARK_TASK_CPUS", "1"))
    # before the JVM launches: local-mode Python workers fork from a
    # daemon that inherits the driver's environment
    _pin_blas_threads(task_cpus)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
        .config("spark.task.cpus", str(task_cpus))
    )
    # cluster path: executors don't inherit the driver env, so ship
    # the same per-task thread budget as executorEnv
    for k in _BLAS_ENV_KEYS:
        b = b.config(
            f"spark.executorEnv.{k}", os.environ.get(k, str(task_cpus))
        )
    for k, v in {**RUNTIME_CONFS, **BUILDER_CONFS}.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return apply_runtime_confs(spark)
