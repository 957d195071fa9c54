#!/usr/bin/env python3
"""Aggregate BENCH/raw_cpus{8,32}.jsonl into BENCH/BASELINE.md:
median per-query seconds at each parallelism, throughput from the
north-star write workload, and scaling efficiency eff = (thr32/thr8)/4
(BASELINE.md frozen protocol; ≥ 0.8 required)."""
import json, statistics, pathlib

bench = pathlib.Path(__file__).resolve().parent.parent / "BENCH"

def load(cpus):
    runs = [json.loads(l) for l in
            (bench / f"raw_cpus{cpus}.jsonl").read_text().splitlines() if l]
    meds = {}
    for k in runs[0]["queries"]:
        meds[k] = statistics.median(r["queries"][k] for r in runs)
    total = statistics.median(r["value"] for r in runs)
    return meds, total, runs[0]["sf"]

m8, t8, sf = load(8)
m32, t32, _ = load(32)
thr8, thr32 = m8["triples_per_sec"], m32["triples_per_sec"]
eff = (thr32 / thr8) / 4

lines = [
    "# BENCH/BASELINE.md — measured baseline (this engine)",
    "",
    f"Input: `{sf}` + synthesized interleaved corpus (2% head skew).",
    "Protocol: 1 discarded warm-up + 3 timed runs per parallelism; medians.",
    "",
    "| workload | local[8] s | local[32] s | speedup |",
    "| --- | --- | --- | --- |",
]
for k in m8:
    if k == "triples_per_sec":
        continue
    sp = m8[k] / m32[k] if m32[k] else float("nan")
    lines.append(f"| {k} | {m8[k]:.2f} | {m32[k]:.2f} | {sp:.2f}× |")
lines += [
    "",
    f"**North-star throughput (full pipeline incl. bucketed write, 1M docs):**",
    f"- local[8]:  **{thr8:,.0f} triples/sec**",
    f"- local[32]: **{thr32:,.0f} triples/sec**",
    f"- scaling efficiency (8→32 cores, N→4N substitute): "
    f"**eff = (thr32/thr8)/4 = {eff:.3f}** "
    f"({'PASS' if eff >= 0.8 else 'BELOW'} the ≥0.8 bar)",
    "",
    f"| total bench suite | {t8:.1f} s | {t32:.1f} s | {t8/t32:.2f}× |",
]
(bench / "BASELINE.md").write_text("\n".join(lines) + "\n")
print("\n".join(lines))
