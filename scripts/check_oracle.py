"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
given sf directory and compares against the Spark parquet dumps written
by `graft.Verify`, via BOTH client conversion paths:

  1. fetchall  — python objects (Decimal, int, date, ...), str()-normalized
  2. pandas    — duckdb .df() vs pandas.read_parquet; this is the path the
                 driver uses, where DuckDB renders DECIMAL/HUGEINT as
                 float64 while Spark parquet keeps Decimal/int64 — the
                 round-1 source of 8 hash mismatches.

A query only counts as green if both paths agree. Columns are sorted by
name before comparison (driver behavior).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import duckdb, json, sys, decimal, datetime

import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_sf0.01"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f"{out}/oracle_sql.json"))


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def pnorm(v):
    """pandas-path normalization: str() of whatever the frame holds."""
    if v is None or v != v:  # NaN/NaT
        return "NULL"
    return str(v)


import os

# CHECK_SKIP: comma-separated query names to exclude — for oracles that
# are only tractable at small sf (x02's brute-force pair join is >40 min
# in DuckDB at sf0.1; scripts/crosscheck_x02.py covers it there).
skip = set(filter(None, os.environ.get("CHECK_SKIP", "").split(",")))
# CHECK_ONLY: regex — when set, only matching query names are checked
# (scoped iteration; mirrors Verify/Bench's SPARK_GRAFT_ONLY).
import re
only = os.environ.get("CHECK_ONLY")
only_re = re.compile(only) if only else None

fails = []
checked = 0
for name, sql in sorted(oracle.items()):
    if name in skip:
        print("SKIP", name, "(CHECK_SKIP)")
        continue
    if only_re and not (only_re.fullmatch(name) or only_re.search(name)):
        continue
    checked += 1
    try:
        # materialize once — some oracles (brute-force pair ground
        # truths) are O(n^2) and must not run twice for the two paths
        con.execute("CREATE OR REPLACE TEMP TABLE __oracle AS " + sql)
        duck = con.execute("SELECT * FROM __oracle").fetchall()
        dcols = [d[0] for d in con.description]
        spark_rel = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        spark = spark_rel.fetchall()
        scols = [d[0] for d in spark_rel.description]
        if sorted(dcols) != sorted(scols):
            fails.append((name, f"cols differ duck={sorted(dcols)} spark={sorted(scols)}"))
            continue
        dperm = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sperm = sorted(range(len(scols)), key=lambda i: scols[i])
        dn = [tuple(norm(r[i]) for i in dperm) for r in duck]
        sn = [tuple(norm(r[i]) for i in sperm) for r in spark]
        if dn != sn:
            msg = f"[fetchall] rows differ: duck {len(dn)} spark {len(sn)}"
            for i, (a, b) in enumerate(zip(dn, sn)):
                if a != b:
                    msg += f"; first diff row {i}: duck={a} spark={b}"
                    break
            fails.append((name, msg))
            continue
        # pandas path (mimics the driver)
        ddf = con.execute("SELECT * FROM __oracle").df()[sorted(dcols)]
        sdf = pd.read_parquet(f"{out}/{name}")[sorted(scols)]
        dn2 = [tuple(pnorm(v) for v in row) for row in ddf.itertuples(index=False)]
        sn2 = [tuple(pnorm(v) for v in row) for row in sdf.itertuples(index=False)]
        if dn2 != sn2:
            msg = f"[pandas] rows differ: duck {len(dn2)} spark {len(sn2)}"
            for i, (a, b) in enumerate(zip(dn2, sn2)):
                if a != b:
                    msg += (f"; first diff row {i}: duck={a} spark={b}"
                            f"; dtypes duck={dict(ddf.dtypes.astype(str))}"
                            f" spark={dict(sdf.dtypes.astype(str))}")
                    break
            fails.append((name, msg))
    except Exception as e:
        fails.append((name, f"EXC {e}"))
print(f"{checked - len(fails)}/{checked} match (both paths)"
      + ("" if checked == len(oracle)
         else f" [scoped: {checked} of {len(oracle)} oracles checked]"))
for n, m in fails:
    print("FAIL", n, m[:500])
sys.exit(1 if fails else 0)
