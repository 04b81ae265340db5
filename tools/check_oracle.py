#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

For each query dir in verify_out with a matching oracle_sql.json
entry: run the SQL in DuckDB over views named after the testdata
parquet files, load the Spark parquet result, sort columns by name,
and compare row count, schema shape, and a value hash.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def norm_df(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def value_hash(df):
    # row-order-sensitive hash of stringified values (queries carry
    # total ORDER BY, so order must already agree)
    parts = []
    for _, row in df.iterrows():
        parts.append("|".join(repr(v) for v in row.tolist()))
    import hashlib
    return hashlib.md5("\n".join(parts).encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for qname in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, qname)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        spark_df = pq.ParquetDataset(files).read().to_pandas() if files else pd.DataFrame()
        if qname not in oracle:
            print(f"  [rows-only] {qname}: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.execute(oracle[qname]).df()
        except Exception as e:
            print(f"✗ {qname}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        s, d = norm_df(spark_df), norm_df(duck_df)
        ok = True
        msgs = []
        if list(s.columns) != list(d.columns):
            ok = False; msgs.append(f"schema: spark={list(s.columns)} duck={list(d.columns)}")
        if len(s) != len(d):
            ok = False; msgs.append(f"rows: spark={len(s)} duck={len(d)}")
        if ok:
            hs, hd = value_hash(s), value_hash(d)
            if hs != hd:
                ok = False
                # find first differing row for debugging
                for i in range(len(s)):
                    rs = [repr(v) for v in s.iloc[i].tolist()]
                    rd = [repr(v) for v in d.iloc[i].tolist()]
                    if rs != rd:
                        msgs.append(f"first diff at row {i}: spark={rs} duck={rd}")
                        break
        if ok:
            print(f"✓ {qname}: {len(s)} rows")
            n_pass += 1
        else:
            print(f"✗ {qname}: " + "; ".join(msgs))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
