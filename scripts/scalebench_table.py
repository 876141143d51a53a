#!/usr/bin/env python3
"""Render graft.ScaleBench output as the BASELINE.md factor-N table:
per-query seconds at the scaled factor, ratio vs the sf0.1 driver
bench (BENCH_r09.json short-id ms values), and the dual-canary ratios
active at each reading (host-state context).

Usage: python3 scripts/scalebench_table.py /tmp/scalebench10.log [BENCH_rNN.json]
"""
import sys, json, re

log = sys.argv[1]
bench = sys.argv[2] if len(sys.argv) > 2 else "BENCH_r09.json"

# BENCH_rNN.json wraps the bench JSON line inside a "tail" string
raw = json.load(open(bench))
if "queries" in raw:
    base = raw["queries"]
else:
    inner = json.loads(re.search(r'(\{"metric":"total".*\})', raw["tail"]).group(1))
    base = inner["queries"]  # short id -> ms (min-of-2 sf0.1)

rows, errors = [], []
for line in open(log):
    m = re.match(r"SCALEBENCH (\{.*\})\s*$", line)
    if not m:
        continue
    d = json.loads(m.group(1))
    if "error" in d:
        errors.append(d)
    elif "sec" in d:
        rows.append(d)

print("| query | sf0.1 (s) | 10x (s) | ratio | canary cpu/sh |")
print("|---|---|---|---|---|")
flagged = []
for d in rows:
    short = d["q"].split("_")[0]
    b = base.get(short)
    if b is None or b <= 0:
        ratio = None
        bs = "-"
    else:
        ratio = d["sec"] * 1000.0 / b
        bs = f"{b/1000:.2f}"
    rs = f"{ratio:.1f}x" if ratio is not None else "-"
    print(f"| {d['q']} | {bs} | {d['sec']:.2f} | {rs} | "
          f"{d['canary_cpu_r']:.2f}/{d['canary_sh_r']:.2f} |")
    if ratio is not None and ratio > 12:
        flagged.append((d["q"], ratio, d["sec"]))

total = sum(d["sec"] for d in rows)
print(f"\ntotal {total:.1f} s over {len(rows)} queries; "
      f"{len(errors)} errors/timeouts")
for e in errors:
    print("ERROR", e)
print("\nflagged (>12x):")
for q, r, s in sorted(flagged, key=lambda t: -t[1]):
    print(f"  {q}: {r:.1f}x ({s:.1f} s)")
