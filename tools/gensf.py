#!/usr/bin/env python3
"""Generate a 10x scale fixture (sf1) from the driver's sf0.1 testdata,
for the local scaling probe (SCALING.md). Deterministic (seed 42+copy).

Scaling model — "ten more crawls of the same world", chosen so per-copy
STRUCTURE is preserved while cross-copy duplication is broken (a naive
10x replication would make every scan 90% exact-duplicates and explode
every near-dup operator's output quadratically, measuring data-shape
change instead of plan curvature):

- TPC-H tables + events: key-shifted replication (copy k shifts every
  entity key by k * key-range, preserving join fan-outs, value
  distributions, and time ranges exactly; dimensions nation/region stay
  fixed).
- documents: copy k applies a seeded PERMUTATION of the 31-word
  vocabulary to every token — an isomorphic corpus (within-copy shingle
  /minhash/jaccard structure identical to the original, including the
  planted near-dup pairs), while cross-copy shingle overlap collapses
  to the permutation's few fixed points.
- embeddings: copy k circularly shifts vector components by k — inner
  products (and so all cosine/cluster structure) within a copy are
  EXACTLY preserved; cross-copy cosines decorrelate to ~0.

Usage: python3 tools/gensf.py [outDir]   (default target/testdata/sf1)
"""
import os, random, sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "target/testdata/sf1"
K = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def emit(table, sql):
    con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


def union(table, tpl):
    emit(table, " UNION ALL ".join(tpl.format(k=k) for k in range(K)))


# dimensions: fixed (a 10x corpus does not grow the region/nation domain)
for t in ["region", "nation"]:
    emit(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

union("customer", f"""
  SELECT c_custkey + {{k}}*15000 AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet'""")

union("supplier", f"""
  SELECT s_suppkey + {{k}}*1000 AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet'""")

union("part", f"""
  SELECT p_partkey + {{k}}*20000 AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM '{SRC}/part.parquet'""")

union("orders", f"""
  SELECT o_orderkey + {{k}}*150000 AS o_orderkey,
         o_custkey + {{k}}*15000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'""")

union("lineitem", f"""
  SELECT l_orderkey + {{k}}*150000 AS l_orderkey,
         l_partkey + {{k}}*20000 AS l_partkey,
         l_suppkey + {{k}}*1000 AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet'""")

union("events", f"""
  SELECT event_id + {{k}}*100000 AS event_id, ts,
         user_id + {{k}}*1500 AS user_id, event_type, value, props
  FROM '{SRC}/events.parquet'""")

# embeddings: circular component shift per copy (cosine-structure
# preserving within a copy, decorrelating across copies)
union("embeddings", f"""
  SELECT vec_id + {{k}}*2000 AS vec_id,
         list_concat(embedding[{{k}}+1:], embedding[1:{{k}}]) AS embedding,
         label
  FROM '{SRC}/embeddings.parquet'""")

# documents: per-copy vocabulary permutation (isomorphic token stream)
vocab = sorted(r[0] for r in con.execute(
    f"SELECT DISTINCT unnest(string_split(text, ' ')) "
    f"FROM '{SRC}/documents.parquet'").fetchall())
parts = []
for k in range(K):
    if k == 0:
        parts.append(f"SELECT doc_id, text, lang, source, n_chars "
                     f"FROM '{SRC}/documents.parquet'")
        continue
    rnd = random.Random(42 + k)
    perm = vocab[:]
    rnd.shuffle(perm)
    pairs = ", ".join(
        f"('{a}', '{b}')" for a, b in zip(vocab, perm))
    # map_from_entries lookup per token; n_chars keeps its invariant
    # n_chars == length(text) under the new words
    parts.append(f"""
      SELECT doc_id + {k}*5000 AS doc_id, t2 AS text, lang, source,
             CAST(length(t2) AS BIGINT) AS n_chars
      FROM (
        SELECT doc_id, lang, source,
               list_aggr(list_transform(string_split(text, ' '),
                 w -> map_from_entries([{pairs}])[w]),
                 'string_agg', ' ') AS t2
        FROM '{SRC}/documents.parquet')""")
emit("documents", " UNION ALL ".join(parts))
print("done ->", DST)
