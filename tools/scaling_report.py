#!/usr/bin/env python3
"""Dev-only: compare two or three Bench JSON lines (different SFs) and
print the per-query slope table for SCALING.md.

Usage: scaling_report.py bench_sf0.1.json bench_sf1.json [bench_sf10.json]
Each file holds Bench's single JSON output line (grep '"metric"' log).
"""
import json, sys

def load(p):
    for line in open(p):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON line in {p}")

runs = [load(p) for p in sys.argv[1:]]
names = sorted(runs[0]["queries"])
print(f"{'query':28s} " + " ".join(f"{r.get('sf','?'):>9}" for r in runs) +
      "  slope(last/first decade)")
rows = []
for n in names:
    ts = [r["queries"].get(n) for r in runs]
    if any(t is None or isinstance(t, str) for t in ts):
        rows.append((float("inf"), n, ts, None)); continue
    slope = ts[-1] / ts[-2] if len(ts) >= 2 and ts[-2] > 0 else float("nan")
    rows.append((slope, n, ts, slope))
rows.sort(reverse=True)
for slope, n, ts, s in rows[:20]:
    tss = " ".join(f"{t:9.2f}" if isinstance(t, float) else f"{str(t)[:9]:>9}" for t in ts)
    print(f"{n:28s} {tss}  {'' if s is None else f'{s:.2f}x'}")
tot = [r["value"] for r in runs]
print(f"\n{'TOTAL':28s} " + " ".join(f"{t:9.1f}" for t in tot))
ok = [r for r in rows if r[3] is not None]
med = sorted(r[3] for r in ok)[len(ok)//2]
print(f"median per-query slope {med:.2f}x | >10x: {sum(1 for r in ok if r[3]>10)} | "
      f"1.5-10x: {sum(1 for r in ok if 1.5<r[3]<=10)} | <=1.5x: {sum(1 for r in ok if r[3]<=1.5)}")
