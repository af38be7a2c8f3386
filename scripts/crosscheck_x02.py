"""Exact ground-truth cross-check for x02_minhash_lsh_neardup at any sf.

The declared DuckDB oracle for x02 is the O(n^2) list_intersect pair
join — fine at the gate's sf0.01 (~1 s) but >40 min at sf0.1. This
script computes the SAME ground truth (exact char-5 shingle Jaccard over
whitespace-normalized lowercase text, all pairs, J >= threshold) in
seconds at any sf, exploiting the corpus's small shingle vocabulary:

  distinct shingles are enumerated once, each doc becomes a bitset over
  that vocabulary (numpy packbits), and |A∩B| for all O(n^2) pairs is a
  chunked AND + popcount — exact set math, no sketches, no sampling.

Compares against the Spark dump written by `graft.Verify`
(<outDir>/x02_minhash_lsh_neardup). Exit 1 on any mismatch.

Usage: python3 scripts/crosscheck_x02.py <sfDir> <verifyOutDir> [threshold]
"""
import sys
import re

import numpy as np
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_sf0.1"
threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.85

docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
ws = re.compile(r"\s+")

shingle_sets = []
vocab = {}
for t in docs["text"]:
    norm = ws.sub(" ", t.strip().lower())
    s = {norm[i:i + 5] for i in range(len(norm) - 4)} if len(norm) >= 5 else set()
    shingle_sets.append(np.array(sorted(vocab.setdefault(g, len(vocab)) for g in s),
                                 dtype=np.int64))
n, v = len(shingle_sets), len(vocab)
print(f"{n} docs, {v} distinct shingles")

bits = np.zeros((n, v), dtype=bool)
for i, idx in enumerate(shingle_sets):
    bits[i, idx] = True
packed = np.packbits(bits, axis=1)  # (n, ceil(v/8)) uint8
sizes = bits.sum(axis=1).astype(np.int64)

popcnt = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)
pairs = []
for i in range(n - 1):
    inter = popcnt[np.bitwise_and(packed[i], packed[i + 1:])].sum(axis=1)
    union = sizes[i] + sizes[i + 1:] - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        j = np.where(union > 0, inter / union, 0.0)
    for off in np.nonzero(j >= threshold)[0]:
        if sizes[i] > 0:  # engine drops empty-shingle docs
            a = int(docs["doc_id"].iloc[i])
            b = int(docs["doc_id"].iloc[i + 1 + off])
            pairs.append((min(a, b), max(a, b), round(float(j[off]), 6)))
truth = sorted(pairs)

spark = pd.read_parquet(f"{out}/x02_minhash_lsh_neardup")
got = sorted((int(r.doc_a), int(r.doc_b), round(float(r.jaccard), 6))
             for r in spark.itertuples(index=False))

if truth == got:
    print(f"MATCH: {len(truth)} pairs identical (exact brute-force ground truth)")
    sys.exit(0)
tset, gset = set(truth), set(got)
print(f"MISMATCH: truth {len(truth)} pairs, spark {len(got)} pairs")
for p in sorted(tset - gset)[:10]:
    print("  missing from spark:", p)
for p in sorted(gset - tset)[:10]:
    print("  extra in spark:   ", p)
sys.exit(1)
