#!/usr/bin/env python3
"""Dev-only self-check replicating the driver's correctness gate.

Reads the parquet dumped by graft.Verify and compares each query with its
DuckDB oracle two ways:
  1. VALUE gate — both sides read through DuckDB, exact value compare
     (row order as produced, columns sorted by name).
  2. HASH gate — replicates the driver's stricter representation-level
     compare: the Spark parquet is read with pyarrow/pandas (decimals
     stay `Decimal`, int64 stays int64) while the oracle comes from
     duckdb `.df()` (DECIMAL -> float64, HUGEINT -> float64/object);
     every value is compared via str(). A type that renders differently
     ('24851.0' vs Decimal('24851.00')) fails here even when the value
     gate passes — this is what CORRECTNESS_r01.json measured.

Not part of the library. Usage:
    python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    pdir = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(pdir, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{files[0]}'").df()
        got_pa = pd.read_parquet(files[0])
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    got_pa = got_pa.reindex(sorted(got_pa.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    # gate 1: exact value compare, row order as produced
    mism = []
    for c in got.columns:
        a, b = got[c].tolist(), exp[c].tolist()
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y and not (x is None and y is None) and str(x) != str(y)]
        if bad:
            mism.append((c, bad[:3]))
    if mism:
        print(f"FAIL {name}: value mismatches {mism}"); fails += 1; continue
    # gate 2: representation-level (driver hash) compare
    rep = []
    for c in got_pa.columns:
        a, b = got_pa[c].tolist(), exp[c].tolist()
        bad = [(i, repr(x), repr(y)) for i, (x, y) in enumerate(zip(a, b))
               if str(x) != str(y) and not (x is None and y is None)
               and not (x != x and y != y)]  # both-NaN ok
        if bad:
            rep.append((c, bad[:2]))
    if rep:
        print(f"HASH-FAIL {name}: repr mismatches {rep}"); fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
queries_missing = [d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle]
if queries_missing:
    print("rows-only (no oracle):", sorted(queries_missing))
sys.exit(1 if fails else 0)
