#!/usr/bin/env python3
"""Fold a tools/drivercheck.py stdout dump into a CORRECTNESS_*_DERIVED.json
artifact (same shape as the r11 sf1 derived artifact): per-query status line
verbatim, plus the knob regime the oracles were regenerated at.

Usage: python3 tools/mkderived.py <drivercheck.log> <out.json> <sf_dir> <knobs-json>
"""
import sys, json

log, out, sf_dir, knobs = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
queries = {}
for line in open(log):
    line = line.rstrip("\n")
    if not line or line.startswith(("[", "WARN", "26/")):
        continue
    parts = line.split(None, 1)
    if len(parts) == 2 and ("OK" in parts[1] or "ROWS_ONLY" in parts[1]
                            or any(t in parts[1] for t in
                                   ("VALUE", "SCHEMA", "DTYPE", "ROWCOUNT",
                                    "ORACLE_SQL_ERROR", "NO_SPARK_OUTPUT"))):
        queries[parts[0]] = parts[1]
n_ok = sum(1 for v in queries.values() if v.startswith("OK"))
doc = {
    "sf_dir": sf_dir,
    "knobs": json.loads(knobs),
    "queries": queries,
    "pass": n_ok,
    "total": len(queries),
    "ok": n_ok == len(queries) and len(queries) > 0,
}
json.dump(doc, open(out, "w"), indent=1)
print(f"{out}: {n_ok}/{len(queries)} OK")
