#!/usr/bin/env python
"""Dump .explain("formatted") for registered entries to files.

The r15 optimization round's plan evidence: one file per entry under
plans/r15/, captured before and after each change (the judge reads
these instead of re-running Spark).

Usage: python tools/explain_dump.py <outdir> <suffix> [entry ...]
       (default entries: all registered queries)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Note: entries whose callable runs a streaming harness (stream_*,
dq22_23's 'ijs' branch, dq28) EXECUTE that harness while building the
DataFrame; their plan files show the final returned DataFrame's plan
(LocalTableScan / memory-sink reads for the streamed parts), which is
exactly what the noop sink times after the harness ran.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from walrus_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("walrus-explain-dump")
    from walrus_spark.queries import QUERIES

    if not names:
        names = sorted(QUERIES)
    for n in names:
        try:
            df = QUERIES[n](spark, sf_dir)
            txt = explain_formatted(df)
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building plan: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(f"# {n} — explain(formatted) at {sf_dir} [{suffix}]\n")
            f.write(txt + "\n")
        print(n, "done", flush=True)


if __name__ == "__main__":
    main()
