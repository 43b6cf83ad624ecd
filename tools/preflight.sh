#!/usr/bin/env bash
# End-of-round snapshot gate: the final commit of a round must pass this.
# (Round-5 lesson: a dev main referencing a nonexistent method was
# committed as the snapshot, so the driver's Verify/Bench both died and
# the whole round went unverified.)
#
#   tools/preflight.sh            # compile + tests + sf0.001 Verify + oracle check
#   tools/preflight.sh --fast     # skip the ScalaTest suite (~3 min saved)
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch "compile; Test/compile" | tail -2
if [[ "${1:-}" != "--fast" ]]; then
  sbt -batch test | tail -3
fi
OUT=/tmp/preflight_verify
rm -rf "$OUT"
sbt -batch "set Compile/run/fork := true; runMain graft.Verify /root/testdata/sf0.001 $OUT" | tail -2
python3 tools/check.py "$OUT" /root/testdata/sf0.001 | tail -3
python3 tools/lint_oracle_types.py "$OUT" /root/testdata/sf0.001
python3 tools/dialect_lab.py --selftest
echo "PREFLIGHT OK — safe to commit the snapshot"
