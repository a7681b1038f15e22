"""Golden correctness: every registered query with an oracle must match
DuckDB on the oracle fixture (sf0.01 — the driver's t2 gate scale)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_ORACLE
from tests.oracle_util import compare
from walrus_spark.queries import ORACLES, QUERIES

ORACLE_NAMES = sorted(ORACLES)
ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, name):
    df = QUERIES[name](spark, SF_DIR_ORACLE)
    problems = compare(df, ORACLES[name], SF_DIR_ORACLE)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
