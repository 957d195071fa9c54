#!/usr/bin/env bash
# FROZEN two-cluster-size scaling protocol (BENCH/BASELINE.md §scaling):
# paired steady-state kg_write. Each invocation of graft.BenchKgw is one
# sample: synthesize (untimed) + full-size in-JVM warm (untimed) + ONE
# timed e2e pipeline+bucketed-write. Samples alternate LO/HI cores so the
# host VM's slow noise drift (±25% documented in BENCH/ANALYSIS.md)
# cancels in the efficiency ratio; medians of PAIRS samples per size.
#
# Primary pair 4→16 (both sizes leave the 32-core box unsaturated — the
# honest "add executors" analogue; see BENCH/ANALYSIS.md for why the
# saturated 8→32 pair is only a lower bound).
#
# Do NOT run anything CPU-heavy (including a second sbt) while this runs.
set -euo pipefail
cd "$(dirname "$0")/.."
PAIRS="${PAIRS:-5}"
LO="${LO:-4}"; HI="${HI:-16}"
DOCS="${SPARK_GRAFT_BENCH_DOCS:-1000000}"
mkdir -p BENCH
echo "$(date -u +%FT%TZ) loadavg=$(cut -d' ' -f1-3 /proc/loadavg) steady pairs=$PAIRS lo=$LO hi=$HI docs=$DOCS" >> BENCH/preconditions.log
: > "BENCH/raw_steady_cpus${LO}.jsonl"
: > "BENCH/raw_steady_cpus${HI}.jsonl"
# compile once up front so per-invocation sbt runs don't interleave
# compilation with measurement
sbt -batch compile >/dev/null 2>&1
for i in $(seq 1 "$PAIRS"); do
  for cpus in "$LO" "$HI"; do
    echo "== steady sample $i/$PAIRS cpus=$cpus $(date -u +%T) loadavg=$(cut -d' ' -f1 /proc/loadavg) ==" >&2
    SPARK_GRAFT_CPUS=$cpus SPARK_GRAFT_BENCH_DOCS="$DOCS" \
      sbt -batch "runMain graft.BenchKgw" 2>/dev/null \
      | grep '"metric"' | sed 's/^\[info\] //' >> "BENCH/raw_steady_cpus${cpus}.jsonl"
  done
done
python3 tools/scaling_steady.py "$LO" "$HI"
