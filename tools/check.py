#!/usr/bin/env python3
"""Local oracle check mimicking the driver's gate: run Verify (Spark) to
outDir, then run each oracle SQL in DuckDB over the same parquet tables and
compare (rows sorted, columns sorted by name, exact values).

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import sys, os, glob, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out)):
        path = os.path.join(out, name)
        if not os.path.isdir(path): continue
        if only and name not in only: continue
        files = glob.glob(f"{path}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"; continue
        got = con.execute(f"SELECT * FROM '{path}/*.parquet'").fetchdf()
        nrows = len(got)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={nrows}" + (" EMPTY!" if nrows==0 else "")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"; continue
        g_cols, e_cols = sorted(got.columns), sorted(exp.columns)
        if g_cols != e_cols:
            results[name] = f"SCHEMA_MISMATCH spark={g_cols} oracle={e_cols}"; continue
        g = got[g_cols].values.tolist(); e = exp[e_cols].values.tolist()
        g = sorted([tuple(norm(v) for v in r) for r in g], key=repr)
        e = sorted([tuple(norm(v) for v in r) for r in e], key=repr)
        if len(g) != len(e):
            results[name] = f"ROWCOUNT spark={len(g)} oracle={len(e)}"; continue
        bad = None
        for i,(a,b) in enumerate(zip(g,e)):
            if a != b:
                eq = all((x==y) or (isinstance(x,float) and isinstance(y,float)
                         and (x==y or abs(x-y)<=1e-12*max(1,abs(x),abs(y)))) for x,y in zip(a,b))
                if not eq:
                    bad = (i,a,b); break
        if bad:
            results[name] = f"VALUE_MISMATCH row{bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}"
        else:
            # exact (hash-grade) check
            exact = all(a==b for a,b in zip(g,e))
            results[name] = f"OK rows={len(g)}" if exact else f"OK_APPROX rows={len(g)} (float ulp diff!)"
    width = max(len(k) for k in results) if results else 0
    n_ok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("ROWS_ONLY rows=") and "EMPTY" not in v)
    for k in sorted(results):
        print(f"{k:<{width}}  {results[k]}")
    print(f"== {n_ok}/{len(results)} pass")

if __name__ == "__main__":
    main()
