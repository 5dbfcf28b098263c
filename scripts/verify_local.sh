#!/usr/bin/env bash
# Run graft.Verify at a scale factor, then the local DuckDB oracle check.
# Usage: scripts/verify_local.sh [sfDir] [outDir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/verify_out}"
rm -rf "$OUT_DIR"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR" 2>&1 | grep -Ev '^\[info\] (welcome|loading|set|compiling|done|Executing)' | tail -20
python3 scripts/check_oracle.py "$SF_DIR" "$OUT_DIR"
