#!/usr/bin/env python3
"""r17 VERDICT task 2 analyzer: per-arm median-of-3-sessions per query
over the interleaved A/B runs written by tools/ab_drift.sh, compared on
the INTERSECTION of the two registries (r17 added queries r16 lacks —
they cannot explain a like-for-like drift and are excluded from the
totals). Prints the verdict-ready attribution: intersection totals per
arm, the delta, and the top per-query movers.

Usage: python3 tools/ab_drift_report.py [outdir=/tmp/ab_out]
NOT part of the library — developer tooling only (driver-side python).
"""
import json, statistics, sys

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_out"

def arm(label):
    runs = []
    for i in (1, 2, 3):
        with open(f"{out}/{label}_run{i}.json") as f:
            runs.append(json.load(f)["queries"])
    names = set(runs[0])
    return {q: statistics.median(r[q] for r in runs) for q in names}, runs

a, runs_a = arm("r16")
b, runs_b = arm("r17")
common = sorted(set(a) & set(b))
only_b = sorted(set(b) - set(a))
ta = sum(a[q] for q in common)
tb = sum(b[q] for q in common)
print(f"intersection queries: {len(common)}  (r17-only: {len(only_b)}, "
      f"adding {sum(b[q] for q in only_b):.1f}s outside the comparison)")
print(f"r16 total (median-of-3): {ta:.1f}s   r17: {tb:.1f}s   "
      f"ratio {tb/ta:.3f}")
# per-arm session-total spread = the noise floor the delta must clear
sa = [sum(r[q] for q in common) for r in runs_a]
sb = [sum(r.get(q, 0.0) for q in common) for r in runs_b]
print(f"r16 session totals: {['%.1f' % s for s in sa]}  "
      f"r17: {['%.1f' % s for s in sb]}")
movers = sorted(common, key=lambda q: b[q] - a[q])
print("\ntop +movers (r17 slower):")
for q in movers[-12:][::-1]:
    print(f"  {q:35s} {a[q]:7.3f} -> {b[q]:7.3f}  ({b[q]-a[q]:+.3f}s, x{b[q]/max(a[q],1e-9):.2f})")
print("top -movers (r17 faster):")
for q in movers[:6]:
    print(f"  {q:35s} {a[q]:7.3f} -> {b[q]:7.3f}  ({b[q]-a[q]:+.3f}s)")
summary = {
    "intersection_n": len(common),
    "r16_total_sec": round(ta, 3), "r17_total_sec": round(tb, 3),
    "ratio": round(tb / ta, 4),
    "r16_session_totals": [round(s, 2) for s in sa],
    "r17_session_totals": [round(s, 2) for s in sb],
    "r17_only_queries": only_b,
    "top_movers": {q: {"r16": round(a[q], 3), "r17": round(b[q], 3)}
                   for q in movers[-12:]},
}
with open(f"{out}/AB_SUMMARY.json", "w") as f:
    json.dump(summary, f, indent=1, sort_keys=True)
print(f"\nwrote {out}/AB_SUMMARY.json")
