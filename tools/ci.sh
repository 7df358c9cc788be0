#!/usr/bin/env bash
# Full local gate: compile, tests, oracle check at a scale factor, bench.
# Usage: tools/ci.sh [sf-dir]   (default /root/testdata/sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
OUT=$(mktemp -d /tmp/graft-verify.XXXX)

echo "== compile + test =="
sbt -batch compile test

echo "== verify vs duckdb oracle ($SF) =="
# strict: any query that throws or times out fails the local gate (the
# driver's own invocation is lenient-but-loud; see Verify.scala)
SPARK_GRAFT_VERIFY_STRICT=1 \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" sbt -batch "runMain graft.Verify $SF $OUT"
python3 tools/check_oracle.py "$SF" "$OUT"

echo "== bench ($SF) =="
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Bench" | grep '"metric"'
