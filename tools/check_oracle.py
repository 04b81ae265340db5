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
    # Normalize numeric WIDTH but not KIND: the driver renders values
    # dtype-faithfully, so int32 1 and int64 1 hash alike ('1') while
    # int64 1 and float64 1.0 differ ('1' vs '1.0'). Upcast widths so
    # the local gate matches the driver exactly — neither weaker
    # (r2: row.tolist() upcast masked an int-vs-float red row) nor
    # stricter (int32-vs-int64 is not a driver failure).
    for col in df.columns:
        k = df[col].dtype.kind
        if k in "iu":
            df[col] = df[col].astype("int64")
        elif k == "f":
            df[col] = df[col].astype("float64")
    return df

def value_hash(df):
    # Row-order-sensitive, DTYPE-FAITHFUL hash (queries carry total
    # ORDER BY, so order must already agree). Hash per-COLUMN so pandas
    # never upcasts a mixed int/float row to float64 — r2's driver gate
    # caught an int64-vs-float64 divergence that a row.tolist() hash
    # (which stringifies 1 and 1.0 identically after upcast) masked.
    import hashlib
    parts = []
    for col in df.columns:
        s = df[col]
        parts.append(f"{col}:{s.dtype}")
        parts.extend(repr(v) for v in s.tolist())
    return hashlib.md5("\n".join(parts).encode()).hexdigest()

def first_diff(s, d):
    # per-column, dtype-aware first divergence for debugging
    for col in s.columns:
        if str(s[col].dtype) != str(d[col].dtype):
            return f"dtype[{col}]: spark={s[col].dtype} duck={d[col].dtype}"
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if repr(a) != repr(b):
                return f"first diff at row {i} col {col}: spark={a!r} duck={b!r}"
    return "hash differs but no cell/dtype diff found (ordering?)"

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
                msgs.append(first_diff(s, d))
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
