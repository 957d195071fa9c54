#!/usr/bin/env bash
# Tri-scale oracle sweep as a scripted round gate (round-4 judge item 7).
# The driver's correctness gate runs only sf0.01; real cross-engine
# divergences can hide at other scales (the round-4 halfway-rounding bug
# in the quality score manifested only at sf0.001). This runs the full
# Verify + DuckDB compare at all three shipped scales and exits nonzero
# on ANY mismatch. At sf0.1 the O(n^2) embedding oracles are excluded
# (brute-force all-pairs in DuckDB; the emb_* operators are still fully
# checked at the two smaller scales).
#
# Usage: tools/verify_triscale.sh [outPrefix]   (default /tmp/graft-triscale)
# Writes a per-scale summary to BENCH/TRISCALE.txt and a copy of each
# check_oracle output next to the verify dumps.
set -uo pipefail
cd "$(dirname "$0")/.."
PREFIX="${1:-/tmp/graft-triscale}"
mkdir -p BENCH
SUMMARY="BENCH/TRISCALE.txt"
: > "$SUMMARY"
echo "tri-scale oracle sweep $(date -u +%FT%TZ) @ $(git rev-parse --short HEAD 2>/dev/null || echo '?')" >> "$SUMMARY"
sbt -batch compile >/dev/null 2>&1 || { echo "compile FAILED" | tee -a "$SUMMARY"; exit 1; }
rc=0
for sf in 0.001 0.01 0.1; do
  out="${PREFIX}-sf${sf}"
  extra=()
  [ "$sf" = "0.1" ] && extra=(--exclude-prefix emb_)
  echo "== sf$sf ==" | tee -a "$SUMMARY"
  if ! timeout 2400 sbt -batch "runMain graft.Verify /root/testdata/sf$sf $out" 2>&1 \
      | grep -E '\[verify\].*failed' | tee -a "$SUMMARY" | grep -q .; then
    : # no per-query runtime failures
  else
    rc=1
  fi
  if python3 tools/check_oracle.py "/root/testdata/sf$sf" "$out" "${extra[@]}" \
      > "$out.check" 2>&1; then
    tail -1 "$out.check" | sed "s/^/sf$sf: /" | tee -a "$SUMMARY"
  else
    rc=1
    { echo "sf$sf: FAILURES"; grep FAIL "$out.check"; } | tee -a "$SUMMARY"
  fi
  grep -c '^OK' "$out.check" | sed "s/^/sf$sf OK count: /" | tee -a "$SUMMARY"
done
echo "exit=$rc" >> "$SUMMARY"
exit $rc
