#!/usr/bin/env bash
# Two-cluster-size scaling evidence (BENCH/BASELINE.md frozen protocol):
# the same Bench workload at N and 4N cores on the same input (context
# table only — the ACCEPTANCE scaling number comes from bench_kgw_steady.sh),
# 1 discarded warm-up + RUNS timed runs each; results land in BENCH/ as
# raw JSON lines for scaling.py to aggregate into BENCH/BASELINE.md.
#
# Default pairs: 4→16 (primary: both sizes leave the 32-core box
# unsaturated, so per-"executor" memory/disk bandwidth stays ~constant as
# it would when ADDING executors on a real cluster) and 8→32 (secondary:
# the saturated-box substitute, a lower bound — the 32-thread run shares
# one DRAM + one disk with itself; see BENCH/ANALYSIS.md).
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
RUNS="${RUNS:-3}"
CPUS_LIST="${CPUS_LIST:-4 16 8 32}"
# 1M docs: makes the north-star workload compute-bound (≈minutes), so the
# N→4N efficiency measures parallel compute, not fixed job overheads.
DOCS="${SPARK_GRAFT_BENCH_DOCS:-1000000}"
mkdir -p BENCH
# machine-idle precondition record (judged runs must start on a quiet box)
echo "$(date -u +%FT%TZ) loadavg=$(cut -d' ' -f1-3 /proc/loadavg) runs=$RUNS cpus='$CPUS_LIST'" >> BENCH/preconditions.log
for cpus in $CPUS_LIST; do
  out="BENCH/raw_cpus${cpus}.jsonl"
  : > "$out"
  # Heap is the FIXED 8g default at every size. Scaling heap with cores
  # (3g/core, mirroring run_cluster.sh's executor ratio) was tried and
  # measured WORSE at 16/48g (kg_write 63-331s vs 24s at 16/8g) — the
  # 46GB-RSS JVM squeezes the page cache and fresh-page-zeroing dominates
  # on this VM; 8g keeps GC modest and the comparison honest because BOTH
  # sizes run the identical configuration.
  echo "== warm-up (discarded) cpus=$cpus ==" >&2
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=$cpus \
    SPARK_GRAFT_BENCH_DOCS="$DOCS" SPARK_GRAFT_WARM_DOCS="$DOCS" \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' >/dev/null
  for i in $(seq 1 "$RUNS"); do
    echo "== timed run $i/$RUNS cpus=$cpus ==" >&2
    SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=$cpus \
      SPARK_GRAFT_BENCH_DOCS="$DOCS" SPARK_GRAFT_WARM_DOCS="$DOCS" \
      sbt -batch "runMain graft.Bench" 2>/dev/null \
      | grep '"metric"' | sed 's/^\[info\] //' >> "$out"
  done
done
python3 tools/scaling.py
