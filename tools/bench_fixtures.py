"""Shared benchmark fixtures for the scaling sweeps.

One definition of workloads that BOTH sweep10x and sweep100x measure,
so cross-sweep ratios always compare the same work (a silently-edited
duplicate would make the 1x/10x/100x rows in PERF_r{N} measure
different workloads)."""

from __future__ import annotations


def make_bm25_queries(spark):
    """The standard 100-query batch-retrieval workload (4 rotating
    term sets over the fixture vocabulary)."""
    return spark.createDataFrame(
        [
            (f"q{i}", t)
            for i in range(100)
            for t in (
                ["hash", "join"],
                ["stream", "vector"],
                ["scan", "filter", "merge"],
                ["batch", "row"],
            )[i % 4]
        ],
        "query_id string, term string",
    )


def make_bm25_query_list():
    """The same 100-query workload as a literal [(query_id, term)]
    list — the form bm25_topk_indexed routes through a parquet-pushed
    In(term) predicate (row-group pruning on the term-sorted index)."""
    return [
        (f"q{i}", t)
        for i in range(100)
        for t in (
            ["hash", "join"],
            ["stream", "vector"],
            ["scan", "filter", "merge"],
            ["batch", "row"],
        )[i % 4]
    ]
