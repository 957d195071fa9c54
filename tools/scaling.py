#!/usr/bin/env python3
"""Aggregate BENCH/raw_cpus{N}.jsonl into BENCH/SUITE_CONTEXT.md:
median per-query seconds at each parallelism, throughput from the
north-star write workload, and scaling efficiency eff = (thr_4N/thr_N)/4
for each measured (N, 4N) pair (frozen protocol; >= 0.8 required).

Primary pair 4->16: both sizes leave the 32-core box unsaturated, so
per-core DRAM/disk bandwidth stays ~constant between the two "cluster
sizes" -- the honest single-box analogue of adding executors. Secondary
pair 8->32 saturates the box at the larger size and is reported as the
lower bound it is (see BENCH/ANALYSIS.md)."""
import json, statistics, pathlib

bench = pathlib.Path(__file__).resolve().parent.parent / "BENCH"
PAIRS = [(4, 16), (8, 32)]


def load(cpus):
    p = bench / f"raw_cpus{cpus}.jsonl"
    if not p.exists():
        return None
    runs = [json.loads(l) for l in p.read_text().splitlines() if l]
    if not runs:
        return None
    meds = {}
    for k in runs[0]["queries"]:
        meds[k] = statistics.median(r["queries"][k] for r in runs)
    total = statistics.median(r["value"] for r in runs)
    return meds, total, runs[0]["sf"]


data = {c: load(c) for pair in PAIRS for c in pair}
data = {c: v for c, v in data.items() if v is not None}
cpus_list = sorted(data)
sf = next(iter(data.values()))[2]

lines = [
    "# BENCH/SUITE_CONTEXT.md — retired suite-embedded variant (per-query context)",
    "",
    "The ACCEPTANCE scaling number lives in BENCH/BASELINE.md (frozen paired",
    "steady-state protocol, tools/bench_kgw_steady.sh). This file tracks",
    "per-query medians of the full Bench suite per parallelism — useful for",
    "round-over-round per-query trends; its kg_write scaling figure is",
    "biased low by suite context (colder page cache) and is NOT the",
    "criterion. See ANALYSIS.md.",
    "",
    f"Input: `{sf}` + synthesized interleaved corpus (1M docs, 2% head skew).",
    "Protocol: 1 discarded warm-up + 3 timed runs per parallelism; medians.",
    "Machine-idle preconditions recorded in BENCH/preconditions.log.",
    "",
    "| workload | " + " | ".join(f"local[{c}] s" for c in cpus_list) + " |",
    "| --- |" + " --- |" * len(cpus_list),
]
# same non-time set Bench.scala excludes from its total: these are counts/
# rates reported in the queries map, not seconds — rendering them in the
# per-query timing table made '| pruned_shingles | 59.00 |' read as a
# 59-second query (advisor finding, round 3)
NON_TIME = {"triples_per_sec", "pruned_shingles",
            "pruned_shingle_docfreq_mass", "kg_write_docs"}
qnames = [k for k in data[cpus_list[0]][0] if k not in NON_TIME]
for k in qnames:
    row = " | ".join(f"{data[c][0][k]:.2f}" for c in cpus_list)
    lines.append(f"| {k} | {row} |")
lines += [
    "",
    "**North-star throughput (full pipeline incl. bucketed write, 1M docs):**",
]
for c in cpus_list:
    lines.append(f"- local[{c}]: **{data[c][0]['triples_per_sec']:,.0f} triples/sec**")
lines.append("")
for n, n4 in PAIRS:
    if n in data and n4 in data:
        eff = (data[n4][0]["triples_per_sec"] / data[n][0]["triples_per_sec"]) / 4
        tag = "PASS" if eff >= 0.8 else "BELOW"
        kind = ("primary, unsaturated box" if n4 < 32
                else "secondary, saturated-box lower bound")
        lines.append(
            f"- scaling efficiency {n}→{n4} cores (N→4N substitute, {kind}): "
            f"**eff = (thr{n4}/thr{n})/4 = {eff:.3f}** ({tag} the ≥0.8 bar)")
lines += [
    "",
    "| total bench suite | "
    + " | ".join(f"{data[c][1]:.1f} s" for c in cpus_list) + " |",
]
(bench / "SUITE_CONTEXT.md").write_text("\n".join(lines) + "\n")
print("\n".join(lines))
