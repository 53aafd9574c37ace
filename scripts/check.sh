#!/usr/bin/env bash
# One-command correctness gate: compile, tests, Verify at the driver's SF,
# DuckDB bit-exact preflight. Exit 0 == everything the driver will grade
# is green locally.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/graft_verify}"
sbt -batch compile test
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify $SF $OUT"
python3 scripts/preflight.py "$SF" "$OUT"
