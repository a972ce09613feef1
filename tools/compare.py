#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dir
under OUT, run the oracle SQL in DuckDB over the sf tables and compare
rows / schema / value-hash against the Spark parquet output."""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def h(df: pd.DataFrame) -> str:
    m = hashlib.md5()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]")
        if pd.api.types.is_float_dtype(s):
            s = s.round(9)
        m.update(pd.util.hash_pandas_object(s, index=False).values.tobytes())
    return m.hexdigest()

fails = []
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"{name}: MISSING spark output"); fails.append(name); continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        ora_df = con.execute(oracle[name]).fetchdf()
        s, o = norm(spark_df), norm(ora_df)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        hmatch = rows and schema and h(s) == h(o)
        status = "OK" if (rows and schema and hmatch) else "FAIL"
        if status == "FAIL":
            fails.append(name)
        print(f"{name}: {status} rows={rows}({len(s)}/{len(o)}) schema={schema} hash={hmatch}")
        if not schema:
            print(f"   spark cols: {list(s.columns)}\n   ora cols:   {list(o.columns)}")
        elif rows and not hmatch:
            for c in s.columns:
                try:
                    eq = s[c].equals(o[c])
                except Exception:
                    eq = False
                if not eq:
                    diff = (s[c] != o[c])
                    try:
                        n = int(diff.sum())
                    except Exception:
                        n = -1
                    print(f"   col {c}: differs (n≈{n}) spark={s[c].head(3).tolist()} ora={o[c].head(3).tolist()}")
    except Exception as e:
        fails.append(name)
        print(f"{name}: ERROR {type(e).__name__}: {e}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} green; fails: {fails}")
sys.exit(1 if fails else 0)
