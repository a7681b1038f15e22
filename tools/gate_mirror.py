#!/usr/bin/env python
"""One-session mirror of the driver's CORRECTNESS gate (r14).

Runs every registered entry with an oracle at the gate scale and
compares against DuckDB with the driver's contract (row count + schema
+ order-insensitive values, via tests.oracle_util.compare), plus an
order-parity diagnostic: entries whose Spark row order differs from
the oracle's are listed — harmless for the gate (the hash is
order-insensitive; see COVERAGE.md "Output-order contract"), but the
column is how the contract was originally proven.

~4 minutes at sf0.01; a green run here predicts a green
CORRECTNESS_r{N}.json. Usage: python tools/gate_mirror.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_util import compare_detailed  # noqa: E402
from walrus_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("walrus-gate-mirror", cpus=8)
    from walrus_spark.queries import ORACLES, QUERIES

    bad: list[str] = []
    divergent: list[str] = []
    for name in sorted(ORACLES):
        try:
            # one comparator (tests.oracle_util) for the mirror AND the
            # pytest oracle checks — identical normalization, column-
            # name equality enforced, case alignment handled in one
            # place (r14 advisor finding)
            df = QUERIES[name](spark, sf_dir)
            problems, order_ok, n = compare_detailed(
                df, ORACLES[name], sf_dir
            )
            ok = not problems
            if not ok:
                bad.append(name)
            elif not order_ok:
                divergent.append(name)
            note = ""
            if not ok:
                note = f" {problems}"
            elif not order_ok:
                note = " (order differs — fine)"
            print(f"{name}: n={n} match={ok}{note}", flush=True)
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"{name}: ERR {type(e).__name__}: {e}", flush=True)
    print(f"\n{len(ORACLES) - len(bad)}/{len(ORACLES)} green")
    if bad:
        print("MISMATCH/ERR:", bad)
        raise SystemExit(1)
    print("order-divergent (multiset-equal):", divergent)


if __name__ == "__main__":
    main()
