#!/usr/bin/env bash
# Two-scale correctness gate (r16 verdict task 7): run every named query
# through graft.Verify + the driver-replica DuckDB compare at BOTH
# sf0.01 and sf0.001 before committing. The two-scale discipline exists
# because single-scale passes hide cast seams: r15 caught a
# truncate-vs-round seam in q_token_budget ONLY at the second scale.
#
# Usage: scripts/gate.sh q_foo [q_bar ...]        # gate the named queries
#        scripts/gate.sh --all                    # gate everything (slow)
set -euo pipefail
cd "$(dirname "$0")/.."
if [ "$#" -eq 0 ]; then
  echo "usage: scripts/gate.sh <query ...> | --all" >&2; exit 2
fi
queries=""
if [ "$1" = "--all" ]; then
  # --all takes no further args: extra names would be silently ignored
  # (r16 ADVICE) — reject them loudly instead.
  [ "$#" -gt 1 ] && { echo "usage: scripts/gate.sh <query ...> | --all (no extra args)" >&2; exit 2; }
else
  queries="$*"
fi
mkdir -p /tmp/graft-gate
fail=0
for sf in 0.01 0.001; do
  out="/tmp/graft-gate/sf${sf}"
  rm -rf "$out"
  # Accumulate BOTH failure kinds across BOTH scales (r16 ADVICE): a
  # Verify crash at one scale no longer hides the other scale's report.
  if ! sbt -batch "runMain graft.Verify /root/testdata/sf${sf} ${out} ${queries}" \
      > /tmp/graft-gate/verify_sf${sf}.log 2>&1; then
    echo "gate: Verify FAILED at sf${sf} (see /tmp/graft-gate/verify_sf${sf}.log)"
    fail=1
    continue
  fi
  # shellcheck disable=SC2086
  python3 scripts/check_oracle.py "/root/testdata/sf${sf}" "$out" ${queries} || fail=1
done
if [ "$fail" -ne 0 ]; then echo "gate: RED at one or more scales"; exit 1; fi
echo "gate: GREEN at sf0.01 and sf0.001"
