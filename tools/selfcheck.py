#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare to the Verify parquet dumps
(columns sorted by name, rows sorted, values rounded-string-hashed).
Usage: python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, hashlib
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)
    rows = sorted("|".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

fails = 0
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    got = duckdb.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracle:
        print(f"{name:22s} rows={len(got):7d} (rows-only check: {'OK' if len(got)>0 else 'EMPTY!'})")
        if len(got) == 0:
            fails += 1
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name:22s} ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    ok_cols = sorted(got.columns) == sorted(exp.columns)
    ok_rows = len(got) == len(exp)
    ok_hash = ok_cols and ok_rows and canon(got) == canon(exp)
    status = "MATCH" if ok_hash else "MISMATCH"
    print(f"{name:22s} rows={len(got):7d}/{len(exp):7d} cols={'OK' if ok_cols else sorted(got.columns)+sorted(exp.columns)} {status}")
    if not ok_hash:
        fails += 1
        if ok_cols and ok_rows:
            # show a few differing rows
            g = got.reindex(sorted(got.columns), axis=1).sort_values(sorted(got.columns)).reset_index(drop=True)
            e = exp.reindex(sorted(exp.columns), axis=1).sort_values(sorted(exp.columns)).reset_index(drop=True)
            diff = (g.astype(str) != e.astype(str)).any(axis=1)
            print("  got:", g[diff].head(3).to_dict("records"))
            print("  exp:", e[diff].head(3).to_dict("records"))
print(f"\n{'ALL OK' if fails==0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
