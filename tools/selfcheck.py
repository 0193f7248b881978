#!/usr/bin/env python3
"""Dev-only self-check replicating the driver's correctness gate:
reads the parquet dumped by graft.Verify and compares each query with its
DuckDB oracle (columns sorted by name, rows as-produced, values compared
exactly). Not part of the library. Usage:
    python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

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
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    # exact value compare, row order as produced
    mism = []
    for c in got.columns:
        a, b = got[c].tolist(), exp[c].tolist()
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y and not (x is None and y is None) and str(x) != str(y)]
        if bad:
            mism.append((c, bad[:3]))
    if mism:
        print(f"FAIL {name}: value mismatches {mism}"); fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
queries_missing = [d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle]
if queries_missing:
    print("rows-only (no oracle):", sorted(queries_missing))
sys.exit(1 if fails else 0)
