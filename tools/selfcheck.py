#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet and compare (schema / rows / values) with
the Spark result parquet dumped by graft.Verify.

Usage: python3 tools/selfcheck.py [sfdir] [outdir]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = f"{OUT}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output at {spark_dir}")
        fails += 1
        continue
    try:
        a = canon(con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf())
        b = canon(con.execute(sql).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns spark={list(a.columns)} oracle={list(b.columns)}")
        fails += 1
        continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
        fails += 1
        continue
    bad = []
    for c in a.columns:
        av, bv = a[c], b[c]
        # Driver strictness: its hasher types values, so int64 vs float64 (or
        # DuckDB HUGEINT landing as float64) is a FAIL even when values match.
        a_float, b_float = pd.api.types.is_float_dtype(av), pd.api.types.is_float_dtype(bv)
        if a_float != b_float:
            bad.append(f"{c} (dtype spark={av.dtype} oracle={bv.dtype})")
        elif a_float and b_float:
            ok = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
            if not ok:
                d = np.nanmax(np.abs(av.astype(float) - bv.astype(float)))
                bad.append(f"{c} (maxdiff={d:.3e})")
        else:
            if not (av.astype(str).values == bv.astype(str).values).all():
                n = int((av.astype(str).values != bv.astype(str).values).sum())
                bad.append(f"{c} ({n} cells)")
    if bad:
        print(f"FAIL {name}: value mismatch in {bad}")
        fails += 1
    else:
        print(f"OK   {name} ({len(a)} rows)")

no_oracle = [d for d in sorted(os.listdir(OUT))
             if os.path.isdir(f"{OUT}/{d}") and d not in oracle]
for d in no_oracle:
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{d}/*.parquet')").fetchone()[0]
    print(f"ROWS {d}: {n} rows (no oracle)")

print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} "
      f"({len(oracle)} oracled, {len(no_oracle)} rows-only)")
sys.exit(1 if fails else 0)
