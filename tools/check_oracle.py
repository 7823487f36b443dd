#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: read Verify's parquet
dumps + oracle_sql.json, run each oracle in DuckDB over the same sf tables,
compare (sorted columns, sorted rows, exact values). Usage:
  python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import duckdb, glob, json, os, sys

out, sf = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in sorted(glob.glob(f"{sf}/*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        duck = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    try:
        spark = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        fails.append((name, f"spark result missing: {e}"))
        continue
    dc, sc = sorted(duck.columns), sorted(spark.columns)
    if dc != sc:
        fails.append((name, f"columns differ: duck={dc} spark={sc}"))
        continue
    d = duck[dc].sort_values(dc).reset_index(drop=True)
    s = spark[dc].sort_values(dc).reset_index(drop=True)
    if len(d) != len(s):
        fails.append((name, f"row counts differ: duck={len(d)} spark={len(s)}"))
        continue
    # exact string-canonical compare
    mism = None
    for c in dc:
        dv = d[c].astype(str).tolist()
        sv = s[c].astype(str).tolist()
        if dv != sv:
            for i, (a, b) in enumerate(zip(dv, sv)):
                if a != b:
                    mism = f"col {c} row {i}: duck={a!r} spark={b!r}"
                    break
            break
    if mism:
        fails.append((name, mism))
    else:
        print(f"OK   {name} ({len(d)} rows)")

for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle-backed queries match")
sys.exit(1 if fails else 0)
