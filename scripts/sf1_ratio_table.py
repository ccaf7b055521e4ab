#!/usr/bin/env python3
"""Emit the SCALE.md per-key sf0.1 -> sf1 bench ratio table (round-13
verdict item 6): every registry key, its committed sf0.1 time, its sf1
time, and the 10x-data ratio, with keys over the ratio threshold listed
first for annotation.

Usage: sf1_ratio_table.py <bench_sf01.json> <bench_sf1.json> [threshold=4.0]
"""
import json
import sys

b01 = json.load(open(sys.argv[1]))["queries"]
b1 = json.load(open(sys.argv[2]))["queries"]
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0

only01 = sorted(set(b01) - set(b1))
only1 = sorted(set(b1) - set(b01))
if only01:
    print(f"WARNING: {len(only01)} keys only in sf0.1 bench (missing from "
          f"sf1): {only01}")
if only1:
    print(f"WARNING: {len(only1)} keys only in sf1 bench (missing from "
          f"sf0.1): {only1}")

rows = []
for k in sorted(b01):
    if k not in b1:
        continue
    r = b1[k] / b01[k] if b01[k] > 0 else float("inf")
    rows.append((k, b01[k], b1[k], r))

hot = [r for r in rows if r[3] > thr]
print(f"keys={len(rows)} over_{thr}x={len(hot)} "
      f"sum_sf01={sum(r[1] for r in rows):.1f}s sum_sf1={sum(r[2] for r in rows):.1f}s "
      f"aggregate_ratio={sum(r[2] for r in rows)/sum(r[1] for r in rows):.2f}x")
print()
print(f"| key | sf0.1 s | sf1 s | 10x ratio |")
print("|---|---|---|---|")
for k, a, b, r in sorted(rows, key=lambda x: -x[3]):
    print(f"| {k} | {a:.2f} | {b:.2f} | {r:.2f}x |")
