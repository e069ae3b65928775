#!/usr/bin/env python3
"""Mimic the DRIVER's comparison (not tools/check.py): read the Spark output
via pandas/pyarrow, run the oracle in DuckDB via fetchdf, sort columns by
name, sort rows, and compare values EXACTLY including dtype/type identity.
This is the hash-grade gate: Decimal('1.5') != 1.5, int64 != float64.

Usage: python3 tools/drivercheck.py <sfDir> <outDir> [query ...]
"""
import sys, os, glob, json, re
import pandas as pd
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    try:
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df, None
    except Exception as e:
        return df, f"SORT_ERROR: {type(e).__name__}: {e}"

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # spill instead of OOM on big-regime oracles (the sf10 d10 k=800
    # window hit the kernel OOM-killer at 130 GB without a temp dir);
    # env-tunable so two checks can share the box without the kernel
    # OOM-killing the second
    # DuckDB's SET does not accept prepared-statement parameters, so the
    # env values are validated against a strict pattern before they are
    # interpolated — a stray quote (or anything else outside the
    # path/size alphabet) falls back to the default instead of breaking
    # or injecting into the SQL
    def setting(stmt, env, default, pattern):
        v = os.environ.get(env, default)
        if not re.fullmatch(pattern, v):
            print(f"[drivercheck] ignoring invalid {env}={v!r}, using {default!r}")
            v = default
        con.execute(stmt % v)
    setting("SET temp_directory='%s'", "DUCKDB_TMP", "/tmp/duckdb_spill",
            r"[A-Za-z0-9_/.\-]+")
    setting("SET memory_limit='%s'", "DUCKDB_MEM", "80GB",
            r"[0-9]+(\.[0-9]+)?\s*[KMGT]i?B")
    for t in TABLES:
        # partial fixtures are legitimate (sf100 carries only the tables
        # its decade-3 family reads); an oracle that references a missing
        # view still fails loudly at query time
        if os.path.exists(f"{sf}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        else:
            print(f"[drivercheck] no {t}.parquet in {sf} — view skipped")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out)):
        path = os.path.join(out, name)
        if not os.path.isdir(path): continue
        if only and name not in only: continue
        if not glob.glob(f"{path}/*.parquet"):
            results[name] = "NO_SPARK_OUTPUT"; continue
        got = pd.read_parquet(path)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}" + (" EMPTY!" if len(got)==0 else "")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"; continue
        if sorted(got.columns) != sorted(exp.columns):
            results[name] = f"SCHEMA spark={sorted(got.columns)} oracle={sorted(exp.columns)}"; continue
        got, ge = canon(got); exp, ee = canon(exp)
        if ge or ee:
            results[name] = f"{'spark ' + ge if ge else ''}{'oracle ' + ee if ee else ''}"; continue
        # dtype pairs the round-1 driver demonstrably tolerated (value-equal
        # after widening): ns/us timestamps, int widths, float widths,
        # date-object vs datetime64. Anything else (Decimal-object vs
        # float64, int vs float) fails the driver's hash.
        def compat(a, b):
            a, b = str(a), str(b)
            if a == b: return True
            ints = {"int8","int16","int32","int64"}
            flts = {"float32","float64"}
            dts = {"datetime64[ns]","datetime64[us]","datetime64[ms]"}
            if a in ints and b in ints: return True
            if a in flts and b in flts: return True
            if a in dts and b in dts: return True
            if {a, b} <= dts | {"object"}: return True  # date objects vs datetime
            return False
        dt_bad = [(c, str(got[c].dtype), str(exp[c].dtype))
                  for c in got.columns if not compat(got[c].dtype, exp[c].dtype)]
        if dt_bad:
            results[name] = f"DTYPE {dt_bad}"; continue
        if len(got) != len(exp):
            results[name] = f"ROWCOUNT spark={len(got)} oracle={len(exp)}"; continue
        bad = None
        g = got.values.tolist(); e = exp.values.tolist()
        import numpy as np
        for i, (a, b) in enumerate(zip(g, e)):
            for j, (x, y) in enumerate(zip(a, b)):
                ok = False
                try:
                    if isinstance(x, (np.ndarray, list)) or isinstance(y, (np.ndarray, list)):
                        ok = np.array_equal(np.asarray(x), np.asarray(y))
                    elif x == y: ok = True
                    elif x != x and y != y: ok = True  # NaN
                    elif hasattr(x, "isoformat") or hasattr(y, "isoformat"):
                        ok = pd.Timestamp(x) == pd.Timestamp(y)
                except Exception:
                    ok = False
                if not ok:
                    bad = (i, got.columns[j], repr(x), repr(y)); break
            if bad: break
        strict = [(c, str(got[c].dtype), str(exp[c].dtype))
                  for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
        results[name] = (f"VALUE row{bad[0]} col={bad[1]} spark={bad[2]} oracle={bad[3]}"
                         if bad else
                         (f"OK rows={len(g)} (lenient dtypes {strict})" if strict
                          else f"OK rows={len(g)}"))
    width = max(len(k) for k in results) if results else 0
    n_ok = sum(1 for v in results.values()
               if v.startswith("OK") or (v.startswith("ROWS_ONLY") and "EMPTY" not in v))
    for k in sorted(results):
        print(f"{k:<{width}}  {results[k]}")
    print(f"== {n_ok}/{len(results)} pass (driver-grade)")

if __name__ == "__main__":
    main()
