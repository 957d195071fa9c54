#!/usr/bin/env bash
# Two-cluster-size scaling evidence (BASELINE.md frozen protocol):
# the same Bench workload at local[8] and local[32] on the same input,
# 1 discarded warm-up + N timed runs each; results land in BENCH/ as
# raw JSON lines for scaling.py to aggregate into BENCH/BASELINE.md.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
RUNS="${RUNS:-3}"
# 1M docs: makes the north-star workload compute-bound (≈minutes), so the
# N→4N efficiency measures parallel compute, not fixed job overheads.
DOCS="${SPARK_GRAFT_BENCH_DOCS:-1000000}"
mkdir -p BENCH
for cpus in 8 32; do
  out="BENCH/raw_cpus${cpus}.jsonl"
  : > "$out"
  echo "== warm-up (discarded) cpus=$cpus ==" >&2
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=$cpus \
    SPARK_GRAFT_BENCH_DOCS="$DOCS" \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' >/dev/null
  for i in $(seq 1 "$RUNS"); do
    echo "== timed run $i/$RUNS cpus=$cpus ==" >&2
    SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=$cpus \
      SPARK_GRAFT_BENCH_DOCS="$DOCS" \
      sbt -batch "runMain graft.Bench" 2>/dev/null \
      | grep '"metric"' | sed 's/^\[info\] //' >> "$out"
  done
done
python3 tools/scaling.py
