#!/usr/bin/env bash
# Corpus-scale curate_docs steady-state bench (BENCH/BASELINE.md §curation):
# one JVM per sample — synthesize the 1M-doc flat corpus (untimed) +
# full-size in-JVM warm run (untimed) + ONE timed production-config run.
# Appends one self-describing JSON line per sample to
# BENCH/raw_curate_cpus${CPUS}.jsonl. Do NOT run anything CPU-heavy
# (including a second sbt) while this runs.
set -euo pipefail
cd "$(dirname "$0")/.."
CPUS="${CPUS:-16}"
SAMPLES="${SAMPLES:-3}"
DOCS="${SPARK_GRAFT_BENCH_DOCS:-1000000}"
mkdir -p BENCH
echo "$(date -u +%FT%TZ) loadavg=$(cut -d' ' -f1-3 /proc/loadavg) curate samples=$SAMPLES cpus=$CPUS docs=$DOCS" >> BENCH/preconditions.log
sbt -batch compile >/dev/null 2>&1
for i in $(seq 1 "$SAMPLES"); do
  echo "== curate sample $i/$SAMPLES cpus=$CPUS $(date -u +%T) loadavg=$(cut -d' ' -f1 /proc/loadavg) ==" >&2
  SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_BENCH_DOCS="$DOCS" \
    sbt -batch "runMain graft.BenchCurate" 2>/dev/null \
    | grep '"metric"' | sed 's/^\[info\] //' >> "BENCH/raw_curate_cpus${CPUS}.jsonl"
done
