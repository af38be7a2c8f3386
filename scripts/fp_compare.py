"""Compare two Bench full-sweep JSON lines' plan-fingerprint maps.

Usage: python3 scripts/fp_compare.py <sweep1.json> <sweep2.json>

Prints per-query fingerprint diffs (none expected at a fixed source
tree — SCALE.md section 20's purity contract), the combined plan_fp of
each sweep, headline seconds, suspect lists, and the max vs_canonical
ratio of the second sweep (its sentinel ran against the first when the
first was on disk as BENCH_FULL.json).
"""
import json
import sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
pa, pb = a["plans"], b["plans"]
keys = sorted(set(pa) | set(pb))
diffs = [k for k in keys if pa.get(k) != pb.get(k)]
print(f"queries: {len(keys)}; fp diffs: {len(diffs)}")
for k in diffs:
    print(f"  DIFF {k}: {pa.get(k)} -> {pb.get(k)}")
print(f"combined plan_fp: {a['plan_fp']} vs {b['plan_fp']}")
print(f"headline: {a['value']:.2f} vs {b['value']:.2f} s")
print(f"suspects: {a.get('suspect_contaminated')} vs "
      f"{b.get('suspect_contaminated')}")
vc = b.get("vs_canonical") or {}
if vc:
    worst = max(vc.items(), key=lambda kv: kv[1])
    print(f"sweep2 vs_canonical: {len(vc)} ratioed, max {worst[1]:.2f} "
          f"({worst[0]})")
sys.exit(1 if diffs else 0)
