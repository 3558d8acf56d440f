#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each query result
(parquet dumped by graft.Verify) against its DuckDB oracle on the same
sf dir; compare schema + sorted rows. Usage:
  python3 scripts/check_oracles.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = pq.read_table(qdir).to_pandas()
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}"); n_fail += 1; continue
        s, d = norm(spark_df.copy()), norm(duck_df.copy())
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        if len(s) == 0:
            print(f"WARN {name}: 0 rows (matches, but weak)"); n_pass += 1; continue
        mismatch = None
        for c in s.columns:
            sc, dc = s[c], d[c]
            if sc.dtype.kind == 'f' or dc.dtype.kind == 'f':
                eq = (sc.fillna(-1e308).values == dc.fillna(-1e308).values)
            else:
                eq = (sc.astype(str).values == dc.astype(str).values)
            if not eq.all():
                i = int((~eq).argmax())
                mismatch = (c, i, sc.iloc[i], dc.iloc[i], int((~eq).sum()))
                break
        # dtype check (schema parity)
        dt_diff = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
                   if str(s[c].dtype) != str(d[c].dtype)]
        if mismatch:
            c, i, sv, dv, n = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={sv!r} duck={dv!r} ({n} diffs)")
            n_fail += 1
        elif dt_diff:
            print(f"FAIL {name}: dtype diffs {dt_diff}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
