#!/usr/bin/env python3
"""Compare the latest sf1 BENCH_HISTORY entry against the latest sf0.1
entry: per-query ratios, entries past a threshold (default 2x the
1.0x-linear expectation at 10x data = ratio > 20, but the practical bar
used in BENCH_SF1.md is >2x the per-family sf0.1->sf1 expectation; we
report everything > EXPECT so the doc can rationalize or fix).

Usage: python3 tools/sf1_curve.py [expect_ratio]
"""
import json
import sys

EXPECT = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0

entries = []
with open("BENCH_HISTORY.jsonl") as f:
    for line in f:
        line = line.strip()
        if line:
            entries.append(json.loads(line))

sf1 = [e for e in entries if e.get("sf", "").endswith("sf1") or "sf1" in e.get("sf", "")]
sf01 = [e for e in entries if "sf0.1" in e.get("sf", "")]
if not sf1 or not sf01:
    sys.exit(f"need both sf1 ({len(sf1)}) and sf0.1 ({len(sf01)}) entries in history")
a, b = sf01[-1], sf1[-1]
qa, qb = a["queries"], b["queries"]
shared = sorted(set(qa) & set(qb))
ratios = {q: (qb[q] / qa[q] if qa[q] > 0 else float("inf")) for q in shared}
rs = sorted(ratios.values())
print(f"sf0.1 total {a['value']:.1f}s ({len(qa)} q)  sf1 total {b['value']:.1f}s ({len(qb)} q)  shared {len(shared)}")
print(f"total ratio {b['value']/a['value']:.2f}x   median {rs[len(rs)//2]:.2f}x   p90 {rs[int(len(rs)*0.9)]:.2f}x")
over = [(q, ratios[q], qa[q], qb[q]) for q in shared if ratios[q] > EXPECT]
over.sort(key=lambda t: -t[1])
print(f"\nentries over {EXPECT}x (sf0.1 -> sf1):")
for q, r, x, y in over:
    flag = " [sf1-flagged]" if q in b.get("spread_flagged", []) else ""
    print(f"  {q:32s} {x:7.3f} -> {y:8.3f}  {r:6.1f}x{flag}")
abs_slow = sorted(shared, key=lambda q: -qb[q])[:15]
print("\nslowest at sf1:")
for q in abs_slow:
    print(f"  {q:32s} {qb[q]:8.3f}s  ({ratios[q]:5.1f}x)")
