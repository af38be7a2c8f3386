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
# Older/partial sweeps (pre-fingerprint rounds, SPARK_GRAFT_ONLY dev
# runs) may lack any of these fields — report, don't KeyError.
for name, d in (("sweep1", a), ("sweep2", b)):
    missing = [k for k in ("plans", "plan_fp", "value") if k not in d]
    if missing:
        print(f"note: {name} lacks {', '.join(missing)} "
              "(older or partial sweep; comparing what is present)")
pa, pb = a.get("plans") or {}, b.get("plans") or {}
keys = sorted(set(pa) | set(pb))
diffs = [k for k in keys if pa.get(k) != pb.get(k)]
print(f"queries: {len(keys)}; fp diffs: {len(diffs)}")
for k in diffs:
    print(f"  DIFF {k}: {pa.get(k)} -> {pb.get(k)}")
print(f"combined plan_fp: {a.get('plan_fp', '?')} vs {b.get('plan_fp', '?')}")
print(f"headline: {a.get('value', float('nan')):.2f} "
      f"vs {b.get('value', float('nan')):.2f} s")
print(f"suspects: {a.get('suspect_contaminated')} vs "
      f"{b.get('suspect_contaminated')}")
vc = b.get("vs_canonical") or {}
if vc:
    worst = max(vc.items(), key=lambda kv: kv[1])
    print(f"sweep2 vs_canonical: {len(vc)} ratioed, max {worst[1]:.2f} "
          f"({worst[0]})")
sys.exit(1 if diffs else 0)
