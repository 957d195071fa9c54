#!/usr/bin/env bash
# FROZEN two-cluster-size scaling protocol, gate v3 — EXTENSION-run harness.
# Same per-sample procedure as v2 (tools/bench_kgw_steady.sh: one JVM per
# sample = untimed synthesize + untimed full-size warm + ONE timed e2e
# pipeline+bucketed-write; samples alternate LO/HI; medians of accepted
# samples), APPENDING to the raw files instead of truncating, plus:
#
# GATE v3 (PRE-REGISTERED 2026-08-18 before any extension sample ran;
# evidence: ladder sample 4 cpus=4 read 95,660 t/s with steal_pct 1.31 —
# 39% below the same day's clean pair with NO steal signature, i.e. the
# round-4 "contention steal accounting misses" failure mode striking
# MID-sample after a clean opening canary):
#  (a,b,c) all of gate v2 (loadavg < 2.0; opening 16-proc canary
#      steal < 3% AND >= 0.95 Mhash/s; per-sample steal_pct < 5 across
#      the timed window, applied by tools/scaling_steady.py);
#  (d) CLOSING canary bracket: immediately after each sample, the same
#      16-process canary runs again and its mhash/steal are merged into
#      the sample's own JSON line (canary_after_mhash,
#      canary_after_steal). scaling_steady.py rejects samples whose
#      closing canary reads mhash < 0.95 OR steal >= 3 — the same
#      thresholds as the opening gate, so a sample is accepted only if
#      the box could deliver full throughput at BOTH ends of its window.
#      Samples without the fields (v2 raws) are unaffected.
# Rule (d) can only REJECT samples — it cannot promote one — and its
# thresholds are the gate's existing calibrated constants, fixed here
# before the extension run produced any data.
set -euo pipefail
cd "$(dirname "$0")/.."
PAIRS="${PAIRS:-3}"
LO="${LO:-1}"; HI="${HI:-4}"
DOCS="${SPARK_GRAFT_BENCH_DOCS:-1000000}"
GATE_LOAD="${GATE_LOAD:-2.0}"
GATE_TIMEOUT_S="${GATE_TIMEOUT_S:-3600}"
CANARY_THREADS="${CANARY_THREADS:-16}"
CANARY_S="${CANARY_S:-3}"
CANARY_MAX_STEAL="${CANARY_MAX_STEAL:-3.0}"
CANARY_MIN_MHASH="${CANARY_MIN_MHASH:-0.95}"
mkdir -p BENCH
echo "$(date -u +%FT%TZ) loadavg=$(cut -d' ' -f1-3 /proc/loadavg) steady-v3-extension pairs=$PAIRS lo=$LO hi=$HI docs=$DOCS gate_load=$GATE_LOAD canary=${CANARY_THREADS}x${CANARY_S}s<${CANARY_MAX_STEAL}%,>=${CANARY_MIN_MHASH}mhash bracket=open+close" >> BENCH/preconditions.log
sbt -batch compile >/dev/null 2>&1

wait_gate() {
  local waited=0
  while :; do
    local la
    la=$(cut -d' ' -f1 /proc/loadavg)
    if awk -v l="$la" -v g="$GATE_LOAD" 'BEGIN{exit !(l<g)}'; then
      local cj
      if cj=$(python3 tools/host_canary.py "$CANARY_THREADS" "$CANARY_S" "$CANARY_MAX_STEAL" "$CANARY_MIN_MHASH"); then
        echo "$(date -u +%FT%TZ) gate OPEN la=$la waited=${waited}s canary=$cj" >> BENCH/preconditions.log
        return 0
      fi
      echo "$(date -u +%FT%TZ) gate canary-REJECT la=$la waited=${waited}s canary=$cj" >> BENCH/preconditions.log
    fi
    if [ "$waited" -ge "$GATE_TIMEOUT_S" ]; then
      echo "$(date -u +%FT%TZ) gate TIMEOUT la=$la after ${waited}s" >> BENCH/preconditions.log
      return 1
    fi
    sleep 30; waited=$((waited + 30))
  done
}

for i in $(seq 1 "$PAIRS"); do
  for cpus in "$LO" "$HI"; do
    if ! wait_gate; then
      echo "== SKIP ext sample $i/$PAIRS cpus=$cpus (gate timeout) ==" >&2
      continue
    fi
    echo "== ext sample $i/$PAIRS cpus=$cpus $(date -u +%T) loadavg=$(cut -d' ' -f1 /proc/loadavg) ==" >&2
    line=$(SPARK_GRAFT_CPUS=$cpus SPARK_GRAFT_BENCH_DOCS="$DOCS" \
      sbt -batch "runMain graft.BenchKgw" 2>/dev/null \
      | grep '"metric"' | sed 's/^\[info\] //' | tail -1)
    # closing canary bracket (rule d): merge into the sample's own JSON;
    # the canary exits nonzero on threshold failure but still prints its
    # measurement, so capture output regardless
    cj=$(python3 tools/host_canary.py "$CANARY_THREADS" "$CANARY_S" \
      "$CANARY_MAX_STEAL" "$CANARY_MIN_MHASH") || true
    python3 - "$line" "$cj" <<'PYEOF' >> "BENCH/raw_steady_cpus${cpus}.jsonl"
import json, sys
r = json.loads(sys.argv[1])
try:
    c = json.loads(sys.argv[2])
    r["canary_after_mhash"] = c["mhash"]
    r["canary_after_steal"] = c["steal_pct"]
except Exception:
    r["canary_after_mhash"] = None
print(json.dumps(r))
PYEOF
  done
done
python3 tools/scaling_steady.py "$LO" "$HI"
