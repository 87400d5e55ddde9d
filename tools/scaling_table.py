#!/usr/bin/env python3
"""Build the sf0.1 -> sf1 scaling table from two BENCH_LAST.json files.

Usage: scaling_table.py bench_sf01.json bench_sf1.json [factor]

Emits a markdown table sorted by scaling ratio (worst first) with the
per-query ratio vs the fixture factor. ratio = t_sf1 / t_sf01; linear
scaling is `factor`x, but most queries are expected BELOW factor
(fixed per-query overheads - planning, job launch, codegen - dominate
sub-second queries and do not grow with data).
"""
import json
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qa, qb = a["queries"], b["queries"]
    sa, sb = a.get("spread", {}), b.get("spread", {})
    rows = []
    for k in sorted(qa):
        if k not in qb:
            continue
        t0, t1 = qa[k], qb[k]
        ratio = t1 / t0 if t0 > 0 else float("inf")
        rows.append((k, t0, t1, ratio))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | sf0.1 s | sf1 s | ratio (linear = {factor:.0f}x) |")
    print("|---|---|---|---|")
    for k, t0, t1, r in rows:
        flag = " **> linear**" if r > factor * 1.3 else ""
        print(f"| {k} | {t0:.3f} | {t1:.3f} | {r:.1f}x{flag} |")
    ta, tb = a["value"], b["value"]
    print(f"\ntotals: sf0.1 = {ta:.1f} s, sf1 = {tb:.1f} s, "
          f"ratio = {tb / ta:.2f}x over {len(rows)} shared queries")
    over = [k for k, _, _, r in rows if r > factor * 1.3]
    print(f"queries above 1.3x-linear ({factor * 1.3:.0f}x): {len(over)}: "
          f"{', '.join(over) if over else '-'}")


if __name__ == "__main__":
    main()
