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
#
# PRECONDITION GATE (round-5, pre-registered sample acceptance): before
# EACH sample the harness waits until the 1-minute loadavg drops below
# GATE_LOAD (default 2.0, i.e. an otherwise-idle box), up to
# GATE_TIMEOUT_S; if the gate never opens the sample is recorded as
# gate_timeout and SKIPPED. This replaces post-hoc estimator adjudication
# of contaminated samples (the round-4 failure mode: asymmetric host
# noise that pair-alternation cannot cancel) with up-front rejection —
# every accepted sample's own JSON line still carries its inline
# loadavg for self-defense.
set -euo pipefail
cd "$(dirname "$0")/.."
PAIRS="${PAIRS:-5}"
LO="${LO:-4}"; HI="${HI:-16}"
DOCS="${SPARK_GRAFT_BENCH_DOCS:-1000000}"
GATE_LOAD="${GATE_LOAD:-2.0}"
GATE_TIMEOUT_S="${GATE_TIMEOUT_S:-900}"
mkdir -p BENCH
echo "$(date -u +%FT%TZ) loadavg=$(cut -d' ' -f1-3 /proc/loadavg) steady pairs=$PAIRS lo=$LO hi=$HI docs=$DOCS gate_load=$GATE_LOAD" >> BENCH/preconditions.log
: > "BENCH/raw_steady_cpus${LO}.jsonl"
: > "BENCH/raw_steady_cpus${HI}.jsonl"
# compile once up front so per-invocation sbt runs don't interleave
# compilation with measurement
sbt -batch compile >/dev/null 2>&1

# wait_gate: block until 1-min loadavg < GATE_LOAD or timeout.
# Returns 0 (gate open, waited seconds logged) or 1 (timeout).
wait_gate() {
  local waited=0
  while :; do
    local la
    la=$(cut -d' ' -f1 /proc/loadavg)
    if awk -v l="$la" -v g="$GATE_LOAD" 'BEGIN{exit !(l<g)}'; then
      echo "$(date -u +%FT%TZ) gate OPEN la=$la waited=${waited}s" >> BENCH/preconditions.log
      return 0
    fi
    if [ "$waited" -ge "$GATE_TIMEOUT_S" ]; then
      echo "$(date -u +%FT%TZ) gate TIMEOUT la=$la after ${waited}s" >> BENCH/preconditions.log
      return 1
    fi
    sleep 15; waited=$((waited + 15))
  done
}

for i in $(seq 1 "$PAIRS"); do
  for cpus in "$LO" "$HI"; do
    if ! wait_gate; then
      echo "== SKIP sample $i/$PAIRS cpus=$cpus (gate timeout) ==" >&2
      continue
    fi
    echo "== steady sample $i/$PAIRS cpus=$cpus $(date -u +%T) loadavg=$(cut -d' ' -f1 /proc/loadavg) ==" >&2
    SPARK_GRAFT_CPUS=$cpus SPARK_GRAFT_BENCH_DOCS="$DOCS" \
      sbt -batch "runMain graft.BenchKgw" 2>/dev/null \
      | grep '"metric"' | sed 's/^\[info\] //' >> "BENCH/raw_steady_cpus${cpus}.jsonl"
  done
done
python3 tools/scaling_steady.py "$LO" "$HI"
