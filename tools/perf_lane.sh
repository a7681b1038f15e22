#!/bin/sh
# Strict-floors performance lane (r9 advisor finding: the BASELINE.md
# throughput floors moved behind WALRUS_PERF_FLOORS=1 in r9, so at
# least one per-round lane must actually exercise them or a 10x
# ingest/consume regression sails through the default pytest run).
#
# Run once per round on a quiet box; green output = the strict
# BASELINE.md-level floors hold, not just the loaded-sandbox floors.
set -e
cd "$(dirname "$0")/.."
WALRUS_PERF_FLOORS=1 python -m pytest tests/test_volume.py -q "$@"
