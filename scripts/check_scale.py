#!/usr/bin/env python3
"""Large-SF variant of check.py: same compare semantics, but each oracle SQL
runs in its OWN subprocess under a wall-clock timeout and a memory cap, and
verdicts append to a JSONL file incrementally. Rationale: several oracle SQLs
are deliberately written as the NAIVE formulation of what the engine computes
efficiently (e.g. q310's quadratic-per-user inequality join); at sf1 those
oracles — not the engine — blow up DuckDB. A timeout here is an
ORACLE-COST limitation and is recorded as such, never as an engine pass.

Usage: check_scale.py <sf_dir> <out_dir> <verdicts.jsonl> [timeout_s] [keys]
"""
import json, sys, glob, subprocess, os

sf_dir, out_dir, verdict_path = sys.argv[1], sys.argv[2], sys.argv[3]
timeout_s = int(sys.argv[4]) if len(sys.argv) > 4 else 300
only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None

WORKER = r'''
import json, sys, glob
import duckdb
import pandas as pd
sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
import os
con = duckdb.connect()
con.sql(f"SET memory_limit='{os.environ.get('CHECK_MEM', '24GB')}'")
con.sql(f"SET threads={os.environ.get('CHECK_THREADS', '8')}")
# per-key temp dir: parallel workers sharing the default .tmp/ race on
# duckdb_temp_storage cleanup (observed as a spurious WORKER_DIED IOException)
tmpd = os.path.abspath(f"{out_dir}/.ducktmp/{name}")
os.makedirs(tmpd, exist_ok=True)
con.sql(f"SET temp_directory='{tmpd}'")
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
sql = oracle[name]
spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
if not spark_files:
    print(json.dumps({"key": name, "verdict": "MISSING_SPARK_OUTPUT"})); sys.exit(0)
try:
    odf = con.sql(sql).df()
except Exception as e:
    print(json.dumps({"key": name, "verdict": f"ORACLE_SQL_ERROR: {e}"[:400]})); sys.exit(0)
sdf = pd.concat([pd.read_parquet(f) for f in sorted(spark_files)], ignore_index=True)
odf = odf[sorted(odf.columns)]
sdf = sdf[sorted(sdf.columns)]
if list(odf.columns) != list(sdf.columns):
    print(json.dumps({"key": name, "verdict": f"SCHEMA_MISMATCH spark={list(sdf.columns)} oracle={list(odf.columns)}"})); sys.exit(0)
if len(odf) != len(sdf):
    print(json.dumps({"key": name, "verdict": f"ROWCOUNT_MISMATCH spark={len(sdf)} oracle={len(odf)}"})); sys.exit(0)
mismatch = None
for c in odf.columns:
    a, b = sdf[c], odf[c]
    try:
        if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
            a = pd.to_datetime(a).astype("datetime64[ns]")
            b = pd.to_datetime(b).astype("datetime64[ns]")
        if str(a.dtype) == "float64" and str(b.dtype) == "float64":
            import numpy as np
            av, bv = a.values.view("int64"), b.values.view("int64")
            eq = (av == bv) | (pd.isna(a).values & pd.isna(b).values)
        else:
            eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
        if not eq.all():
            i = int((~eq).argmax())
            mismatch = f"VALUE_MISMATCH col={c} row={i} spark={a.iloc[i]!r} oracle={b.iloc[i]!r}"
            break
    except Exception as e:
        mismatch = f"COMPARE_ERROR col={c}: {e}"
        break
print(json.dumps({"key": name, "verdict": mismatch or "OK", "rows": len(sdf)}))
'''

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# resume skips only keys with a DEFINITIVE verdict: ORACLE_TIMEOUT and
# WORKER_DIED are retried (a rerun with a larger timeout would otherwise
# silently skip exactly the keys it was meant to retry)
done = set()
if os.path.exists(verdict_path):
    for line in open(verdict_path):
        try:
            r = json.loads(line)
            v = r.get("verdict", "")
            if not (v.startswith("ORACLE_TIMEOUT") or v.startswith("WORKER_DIED")):
                done.add(r["key"])
        except Exception:
            pass
names = [n for n in sorted(oracle) if n not in done and (only is None or n in only)]
vf = open(verdict_path, "a")
for i, name in enumerate(names):
    try:
        r = subprocess.run([sys.executable, "-c", WORKER, sf_dir, out_dir, name],
                           capture_output=True, text=True, timeout=timeout_s)
        rec = None
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                cand = json.loads(line)
                if isinstance(cand, dict) and "key" in cand:
                    rec = cand
                    break
            except Exception:
                continue  # interleaved engine warnings are not the record
        if rec is None:
            rec = {"key": name, "verdict": f"WORKER_DIED: {r.stderr[-300:]}"}
    except subprocess.TimeoutExpired:
        rec = {"key": name, "verdict": f"ORACLE_TIMEOUT({timeout_s}s)"}
    vf.write(json.dumps(rec) + "\n")
    vf.flush()
    print(f"[{i+1}/{len(names)}] {name}: {rec['verdict'][:120]}", flush=True)
# tally only THIS invocation's selected keys, latest verdict per key
# (the file may hold other runs' keys and superseded duplicate lines)
latest = {}
for line in open(verdict_path):
    try:
        r = json.loads(line)
        if "key" in r:
            latest[r["key"]] = r.get("verdict", "")
    except Exception:
        pass
sel = [n for n in sorted(oracle) if only is None or n in only]
ok = bad = to = missing = 0
for n in sel:
    v = latest.get(n)
    if v is None:
        missing += 1
    elif v == "OK":
        ok += 1
    elif v.startswith("ORACLE_TIMEOUT"):
        to += 1
    else:
        bad += 1
print(f"\nselected={len(sel)} OK={ok} TIMEOUT={to} FAIL={bad} MISSING={missing}")
sys.exit(1 if bad or missing else 0)
