#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs
DuckDB oracle. Usage: check_correctness.py <sfDir> <verifyOutDir>"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        sdf = pq.read_table(files[0]).to_pandas()
        ddf = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    # normalize: sort columns by name, sort rows, compare values
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    s, d = norm(sdf), norm(ddf)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}"); n_fail += 1; continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); n_fail += 1; continue
    ok = True
    for c in s.columns:
        a, b = s[c], d[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import numpy as np
                if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True):
                    # exact compare since we round; report max diff
                    diff = (a.astype(float) - b.astype(float)).abs().max()
                    print(f"FAIL {name}: col {c} max diff {diff}")
                    ok = False
            else:
                if not (a.astype(str).values == b.astype(str).values).all():
                    bad = (a.astype(str).values != b.astype(str).values).nonzero()[0][:3]
                    print(f"FAIL {name}: col {c} mismatch rows {bad}: {a.iloc[bad[0]]!r} vs {b.iloc[bad[0]]!r}")
                    ok = False
        except Exception as e:
            print(f"FAIL {name}: col {c}: {e}"); ok = False
    if ok:
        print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    else:
        n_fail += 1
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
