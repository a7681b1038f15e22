"""Local mirror of the driver's Spark-vs-DuckDB comparison.

Runs a registered query and its oracle SQL on the same parquet dir and
compares row count, column names, and order-insensitive values (floats
rounded to 6dp, timestamps rendered as strings) — the same contract as
CORRECTNESS_r{N}.json, so a green run here predicts a green gate.
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from walrus_spark.catalog import TABLES


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).hex()
    try:  # numpy / decimal scalars
        import numpy as np

        if isinstance(v, np.floating):
            return round(float(v), 6)
        if isinstance(v, np.integer):
            return int(v)
    except ImportError:
        pass
    return v


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(repr(_norm_cell(r[i])) for i in idx) for r in rows
    ), [cols[i] for i in idx]


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def compare_detailed(
    spark_df, oracle: str, sf_dir: str
) -> tuple[list[str], bool, int]:
    """Full gate comparison plus an order-parity diagnostic.

    Returns (problems, order_matches, n_rows): `problems` empty means
    the gate contract holds (columns, row count, order-insensitive
    normalized values); `order_matches` is True when the UNSORTED
    normalized row sequences also agree — meaningless unless
    `problems` is empty (gate_mirror prints it only then)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(oracle, sf_dir)
    problems: list[str] = []
    if sorted(s_cols) != sorted(c.lower() for c in d_cols) and sorted(
        s_cols
    ) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems, False, len(s_rows)
    if len(s_rows) != len(d_rows):
        problems.append(f"row count: spark={len(s_rows)} duckdb={len(d_rows)}")
    # one normalization path for multiset AND order parity: sort the
    # column indices the same way _norm_rows does (Spark names
    # case-sensitively, DuckDB names lowered — DuckDB lowercases
    # unquoted aliases, so a mixed-case Spark alias must align with
    # its lowered oracle twin, the r14 advisor finding)
    s_idx = sorted(range(len(s_cols)), key=lambda i: s_cols[i].lower())
    d_idx = sorted(range(len(d_cols)), key=lambda i: d_cols[i].lower())
    s_seq = [
        tuple(repr(_norm_cell(r[i])) for i in s_idx) for r in s_rows
    ]
    d_seq = [
        tuple(repr(_norm_cell(r[i])) for i in d_idx) for r in d_rows
    ]
    sn, dn = sorted(s_seq), sorted(d_seq)
    if sn != dn:
        diff_a = [r for r in sn if r not in set(dn)][:3]
        diff_b = [r for r in dn if r not in set(sn)][:3]
        problems.append(f"values differ; spark-only={diff_a} duckdb-only={diff_b}")
    return problems, s_seq == d_seq, len(s_rows)


def compare(spark_df, oracle: str, sf_dir: str) -> list[str]:
    """Return list of mismatch descriptions (empty = match)."""
    return compare_detailed(spark_df, oracle, sf_dir)[0]
