#!/usr/bin/env python3
"""Generate the SECOND scale decade (sf10) from the sf1 fixture, for the
decade-2 scaling probe (SCALING.md). Deterministic.

Same scaling model as gensf.py ("ten more crawls of the same world"),
but the decorrelation transforms must NOT be the composition of sf1's
own transforms — compositions collide and plant exact cross-copy
duplicates that sf1 does not have:

- embeddings: sf1 copy j is the base circularly shifted by j. A further
  shift by k would make sf10 segment (k, j) equal segment (k', j')
  whenever j+k = j'+k' (mod 64, the embedding dim) — thousands of
  exact duplicate vectors under fresh vec_ids, quadratically exploding
  every near-dup operator. Instead each sf10 copy k >= 1 applies a
  copy-specific SIGN PATTERN (component i flips iff
  (i*31 + k*17) % 97 is odd): inner products within a copy are exactly
  preserved (s_i^2 = 1, float sign flips are exact), cross-copy cosines
  decorrelate (~half the components flip), and a sign pattern never
  equals a pure rotation, so no segment collides with any sf1 segment.
- documents: sf1 copy j applies vocab permutation P_j (seed 42+j,
  P_0 = id). Reusing those seeds would give segment (k, 0) = P_k =
  segment (0, k) — whole duplicate sub-corpora. Fresh seeds 4200+k
  give segments P'_k . P_j, all distinct random permutations of the
  31-word vocab (collision needs P'_a . P_b == P'_c . P_d — measure
  zero for fresh random perms; spot-checked below).
- TPC-H tables + events: key-shifted replication exactly as gensf.py,
  with per-entity shifts DERIVED from the source's max key (not
  hardcoded), so the script is correct for any source decade.

Usage: python3 tools/gensf10.py [outDir] [srcDir]
       (defaults: target/testdata/sf10 from target/testdata/sf1)
"""
import os, random, sys

import duckdb

DST = sys.argv[1] if len(sys.argv) > 1 else "target/testdata/sf10"
SRC = sys.argv[2] if len(sys.argv) > 2 else "target/testdata/sf1"
K = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
# same ceiling discipline as gensf100.py: an uncapped DuckDB grabs ~80%
# of RAM and dies with a bad-allocation OOM when the box is shared with
# Spark JVMs (observed twice at documents copy 5/7 in r19); the staged
# per-copy form spills fine at this limit
con.execute("SET temp_directory='/tmp/duckdb_spill_gen10'")
con.execute("SET memory_limit='24GB'")


def maxkey(table, col):
    return con.execute(
        f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]


def emit(table, sql):
    con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


def union(table, tpl):
    emit(table, " UNION ALL ".join(tpl.format(k=k) for k in range(K)))


CUST = maxkey("customer", "c_custkey")
SUPP = maxkey("supplier", "s_suppkey")
PART = maxkey("part", "p_partkey")
ORD = maxkey("orders", "o_orderkey")
EVT = maxkey("events", "event_id")
USR = maxkey("events", "user_id")
DOC = maxkey("documents", "doc_id")
VEC = maxkey("embeddings", "vec_id")

# dimensions: fixed (a 10x corpus does not grow the region/nation domain)
for t in ["region", "nation"]:
    emit(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

union("customer", f"""
  SELECT c_custkey + {{k}}*{CUST} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet'""")

union("supplier", f"""
  SELECT s_suppkey + {{k}}*{SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet'""")

union("part", f"""
  SELECT p_partkey + {{k}}*{PART} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM '{SRC}/part.parquet'""")

union("orders", f"""
  SELECT o_orderkey + {{k}}*{ORD} AS o_orderkey,
         o_custkey + {{k}}*{CUST} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'""")

union("lineitem", f"""
  SELECT l_orderkey + {{k}}*{ORD} AS l_orderkey,
         l_partkey + {{k}}*{PART} AS l_partkey,
         l_suppkey + {{k}}*{SUPP} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet'""")

union("events", f"""
  SELECT event_id + {{k}}*{EVT} AS event_id, ts,
         user_id + {{k}}*{USR} AS user_id, event_type, value, props
  FROM '{SRC}/events.parquet'""")

# embeddings: copy-specific sign pattern (see module docstring)
emit("embeddings", " UNION ALL ".join(
    (f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet'"
     if k == 0 else f"""
  SELECT vec_id + {k}*{VEC} AS vec_id,
         list_transform(embedding,
           (x, i) -> CASE WHEN ((i*31 + {k}*17) % 97) % 2 = 1
                          THEN -x ELSE x END) AS embedding,
         label
  FROM '{SRC}/embeddings.parquet'""")
    for k in range(K)))

# documents: fresh per-copy vocabulary permutation (seed 4200+k).
# Implementation note: gensf.py's map_from_entries-in-a-lambda form went
# superlinear at this volume (DuckDB rebuilds the literal map per token;
# fine at 4.5M tokens, pathological at 45M) — the same permutation is
# applied here as a token-level JOIN against a 31-row mapping table,
# which streams.
vocab = sorted(r[0] for r in con.execute(
    f"SELECT DISTINCT unnest(string_split(text, ' ')) "
    f"FROM '{SRC}/documents.parquet'").fetchall())
perms = {}
con.execute("CREATE TEMP TABLE vocab_map (k INT, w VARCHAR, nw VARCHAR)")
for k in range(1, K):
    rnd = random.Random(4200 + k)
    perm = vocab[:]
    rnd.shuffle(perm)
    perms[k] = dict(zip(vocab, perm))
    con.executemany("INSERT INTO vocab_map VALUES (?, ?, ?)",
                    [(k, a, b) for a, b in zip(vocab, perm)])
# Stage each copy to its own parquet and concatenate at the end: the
# one-query UNION form ran all K token-level GROUP BYs concurrently and
# OOM'd DuckDB at this volume (K x 45M in-flight string_agg states);
# sequential staging bounds peak memory at ONE copy regardless of K.
stage = os.path.join(DST, "_documents_stage")
os.makedirs(stage, exist_ok=True)
con.execute(f"""COPY (SELECT doc_id, text, lang, source, n_chars
  FROM '{SRC}/documents.parquet')
  TO '{stage}/copy0.parquet' (FORMAT PARQUET)""")
for k in range(1, K):
    con.execute(f"""COPY (
      SELECT doc_id + {k}*{DOC} AS doc_id,
             string_agg(m.nw, ' ' ORDER BY t.i) AS text,
             any_value(lang) AS lang, any_value(source) AS source,
             CAST(length(string_agg(m.nw, ' ' ORDER BY t.i)) AS BIGINT)
               AS n_chars
      FROM (
        SELECT doc_id, lang, source,
               unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM '{SRC}/documents.parquet') t
      JOIN vocab_map m ON m.k = {k} AND m.w = t.w
      GROUP BY doc_id)
      TO '{stage}/copy{k}.parquet' (FORMAT PARQUET)""")
    print(f"documents copy {k}: staged")
emit("documents", f"SELECT * FROM '{stage}/copy*.parquet'")
for f in os.listdir(stage):
    os.remove(os.path.join(stage, f))
os.rmdir(stage)
# every token must have mapped (inner join drops none): row count check
ndoc = con.execute(
    f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
ngen = con.execute(
    f"SELECT count(*) FROM '{DST}/documents.parquet'").fetchone()[0]
assert ngen == K * ndoc, f"documents rows {ngen} != {K}*{ndoc}"

# spot-check the no-collision claims of the docstring
sf1_perms = {}
for j in range(1, K):
    rnd = random.Random(42 + j)
    p = vocab[:]
    rnd.shuffle(p)
    sf1_perms[j] = dict(zip(vocab, p))
sf1_perms[0] = dict(zip(vocab, vocab))
composed = set()
for k, pk in list(perms.items()) + [(0, sf1_perms[0])]:
    for j, pj in sf1_perms.items():
        composed.add(tuple(pk[pj[w]] for w in vocab))
assert len(composed) == K * K, \
    f"permutation composition collision: {len(composed)} distinct of {K*K}"
print(f"perm compositions distinct: {len(composed)}/{K*K}")
print("done ->", DST)
