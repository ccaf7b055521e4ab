#!/usr/bin/env python3
"""Local driver-sim: run DuckDB oracle SQL against the same testdata and
compare with the parquet dumped by graft.Verify. Mirrors the driver's gate:
sort columns by name, compare values row-by-row."""
import json, sys, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(oracle):
    sql = oracle[name]
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        results[name] = "MISSING_SPARK_OUTPUT"
        continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in sorted(spark_files)], ignore_index=True)
    odf = odf[sorted(odf.columns)]
    sdf = sdf[sorted(sdf.columns)]
    if list(odf.columns) != list(sdf.columns):
        results[name] = f"SCHEMA_MISMATCH cols spark={list(sdf.columns)} oracle={list(odf.columns)}"
        continue
    if len(odf) != len(sdf):
        results[name] = f"ROWCOUNT_MISMATCH spark={len(sdf)} oracle={len(odf)}"
        continue
    # normalize: timestamps to ns, ints to int64, floats compared exactly
    mismatch = None
    for c in odf.columns:
        a, b = sdf[c], odf[c]
        try:
            if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
                a = pd.to_datetime(a).astype("datetime64[ns]")
                b = pd.to_datetime(b).astype("datetime64[ns]")
            if str(a.dtype) == "float64" and str(b.dtype) == "float64":
                # the driver's hash is BIT-level: -0.0 != +0.0 there, so
                # compare the raw bit patterns, not IEEE == (which treats
                # signed zeros as equal and would hide a gate failure)
                import numpy as np
                av, bv = a.values.view("int64"), b.values.view("int64")
                eq = (av == bv) | (pd.isna(a).values & pd.isna(b).values)
            else:
                eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
            if not eq.all():
                i = int((~eq).argmax())
                mismatch = f"VALUE_MISMATCH col={c} row={i} spark={a.iloc[i]!r} oracle={b.iloc[i]!r} (dtypes {sdf[c].dtype}/{odf[c].dtype})"
                break
        except Exception as e:
            mismatch = f"COMPARE_ERROR col={c}: {e}"
            break
    results[name] = mismatch or "OK"

# rows-only queries (no oracle)
for d in sorted(glob.glob(f"{out_dir}/q*")):
    name = d.split("/")[-1]
    if name not in oracle:
        files = glob.glob(f"{d}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else -1
        # rows-only keys still must produce rows (verify bar): empty/missing is a failure
        results[name] = f"ROWS_ONLY rows={n}" if n > 0 else f"EMPTY_ROWS_ONLY rows={n}"

ok = sum(1 for v in results.values() if v == "OK")
failed = 0
for k, v in sorted(results.items()):
    good = v == "OK" or v.startswith("ROWS_ONLY")
    failed += 0 if good else 1
    print(f"{'  ' if good else 'XX'} {k}: {v}")
n_oracle = len([k for k in results
                if not results[k].startswith(('ROWS_ONLY', 'EMPTY_ROWS_ONLY'))])
print(f"\n{ok}/{n_oracle} oracle-checked OK")
sys.exit(1 if failed else 0)
