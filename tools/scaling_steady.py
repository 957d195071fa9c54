#!/usr/bin/env python3
"""Aggregate the paired steady-state kg_write scaling samples
(BENCH/raw_steady_cpus{N}.jsonl, written by tools/bench_kgw_steady.sh)
into the headline N->4N efficiency: medians per size, per-pair ratios,
spread, and the efficiency from median throughputs."""
import json
import statistics
import sys


def load(cpus):
    rows = []
    with open(f"BENCH/raw_steady_cpus{cpus}.jsonl") as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    a, b = load(lo), load(hi)
    ta = [r["value"] for r in a]
    tb = [r["value"] for r in b]
    thr_a = [r["triples_per_sec"] for r in a]
    thr_b = [r["triples_per_sec"] for r in b]
    factor = hi / lo
    med_a, med_b = statistics.median(thr_a), statistics.median(thr_b)
    eff = (med_b / med_a) / factor
    print(f"paired steady-state kg_write scaling, local[{lo}] -> local[{hi}]")
    print(f"  local[{lo}]:  times {sorted(round(t,1) for t in ta)} s, "
          f"throughput {sorted(thr_a)} t/s, median {med_a:.0f} t/s")
    print(f"  local[{hi}]: times {sorted(round(t,1) for t in tb)} s, "
          f"throughput {sorted(thr_b)} t/s, median {med_b:.0f} t/s")
    pair_effs = [(y / x) / factor for x, y in zip(thr_a, thr_b)]
    print(f"  per-pair eff (time-adjacent samples): "
          f"{[round(e, 3) for e in pair_effs]}")
    # dispersion-aware companions to the median-of-medians headline
    # (advisor finding, round 3: a pass/fail that flips under an equally
    # defensible estimator isn't a result) — report the median of per-pair
    # efficiencies with its spread, plus the best-vs-best ratio (the
    # machine's steady-state capability with host noise excluded)
    med_pair = statistics.median(pair_effs)
    lo_q, hi_q = sorted(pair_effs)[0], sorted(pair_effs)[-1]
    print(f"  median of per-pair effs = {med_pair:.3f} "
          f"(range {lo_q:.3f}..{hi_q:.3f}, n={len(pair_effs)})")
    best = (max(thr_b) / max(thr_a)) / factor
    print(f"  best-vs-best eff (host noise excluded) = {best:.3f}")
    print(f"  HEADLINE eff({lo}->{hi}) from medians = {eff:.3f} "
          f"({'>=' if eff >= 0.8 else 'BELOW'} 0.8 bar); "
          f"estimator-agreement: median-of-pairs {med_pair:.3f}")


if __name__ == "__main__":
    main()
