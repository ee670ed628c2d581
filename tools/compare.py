#!/usr/bin/env python3
"""Local stand-in for the driver's t2 compare: run Verify output against
DuckDB oracles. Usage: compare.py <sfDir> <outDir>"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    if name not in oracle:
        ok.append((name, f"rows-only ({len(got)})")) if len(got) > 0 else bad.append((name, "rows-only but EMPTY"))
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        bad.append((name, f"oracle SQL error: {e}"))
        continue
    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df.astype(str)
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        bad.append((name, f"schema: got {list(g.columns)} vs {list(e.columns)}"))
    elif len(g) != len(e):
        bad.append((name, f"rowcount: got {len(g)} vs {len(e)}"))
    elif not g.equals(e):
        diff = (g != e).any(axis=1)
        i = diff[diff].index[0]
        bad.append((name, f"values differ at row {i}:\n  got {g.loc[i].to_dict()}\n  exp {e.loc[i].to_dict()}"))
    else:
        ok.append((name, f"match ({len(g)} rows)"))
for n, m in ok:
    print(f"PASS {n}: {m}")
for n, m in bad:
    print(f"FAIL {n}: {m}")
print(f"\n{len(ok)} pass / {len(bad)} fail")
sys.exit(1 if bad else 0)
