#!/usr/bin/env python3
"""Pre-flight every declared oracle (SURVEY.md 5.3.7): compare graft.Verify
parquet output against a local DuckDB run of SparkEntry.oracleSql.

Mimics the driver's t2: columns sorted by name, rows compared in order,
values compared exactly (floats must be bit-identical after the rounding
discipline). Usage:

    python3 tools/preflight.py [sfDir] [outDir] [only,keys]
"""
import duckdb, json, sys, os
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
con.execute("SET threads=4; SET TimeZone='UTC';")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, warns = [], []
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    pq = f"{outdir}/{name}"
    if not os.path.isdir(pq):
        print(f"{name}: MISSING spark output"); fails.append(name); continue
    try:
        got = con.execute(f"SELECT * FROM '{pq}/*.parquet'").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}"); fails.append(name); continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"{name}: SCHEMA {list(got.columns)} vs {list(exp.columns)}")
        fails.append(name); continue
    if len(got) != len(exp):
        print(f"{name}: ROWS {len(got)} vs {len(exp)}"); fails.append(name); continue
    ok = True
    for c in got.columns:
        a, b = got[c], exp[c]
        if str(a.dtype) != str(b.dtype):
            warns.append(f"{name}.{c}: dtype {a.dtype} vs {b.dtype}")
        av = a.astype(object).where(pd.notna(a), None).tolist()
        bv = b.astype(object).where(pd.notna(b), None).tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x != y and not (x is None and y is None):
                print(f"{name}: VALUE col={c} row={i}: spark={x!r} duck={y!r}")
                ok = False
                break
        if not ok:
            break
    if ok:
        print(f"{name}: OK ({len(got)} rows)")
    else:
        fails.append(name)

for w in warns:
    print("DTYPE-WARN:", w)
print("FAILED:", fails if fails else "none")
sys.exit(1 if fails else 0)
