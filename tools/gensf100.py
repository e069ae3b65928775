#!/usr/bin/env python3
"""Generate the THIRD scale decade (sf100) from sf10 — EMBEDDINGS and
DOCUMENTS only (the derived ANN/dedup family's inputs; a 600M-row
lineitem would not fit the sandbox and no decade-3 oracle needs it).
Deterministic.

Decorrelation transforms, decade-3 family (must compose with BOTH
prior decades' transforms without collision):

- embeddings: sf10 copy k applies sign pattern s_k(i) = ((i*31 + k*17)
  % 97) % 2. sf100 copy m >= 1 applies a DIFFERENT pseudo-random sign
  family s'_m(i) = ((i*37 + m*23) % 101) % 2: within-copy inner
  products are exactly preserved (sign flips are exact in IEEE),
  cross-copy cosines decorrelate, and the 100 composite sign vectors
  s'_m * s_k over the original base are checked DISTINCT below (a
  collision would plant exact duplicate vectors under fresh ids and
  quadratically explode every near-dup operator).
- documents: fresh per-copy vocabulary permutations (seed 42000+m,
  m >= 1), composed against sf1's P_j (seed 42+j) and sf10's P'_k
  (seed 4200+k); all 1000 compositions checked distinct below. Same
  token-level JOIN staging as gensf10.py (bounds DuckDB peak memory at
  one copy).

Usage: python3 tools/gensf100.py [outDir] [srcDir]
       (defaults: target/testdata/sf100 from target/testdata/sf10)
"""
import os, random, sys

import duckdb

DST = sys.argv[1] if len(sys.argv) > 1 else "target/testdata/sf100"
SRC = sys.argv[2] if len(sys.argv) > 2 else "target/testdata/sf10"
K = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute("SET temp_directory='/tmp/duckdb_spill_gen100'")
# modest ceiling: generation may share the box with an oracle-check
# DuckDB holding tens of GB (found empirically: 60GB here + 70GB there
# OOM'd copy 5); the staged form spills fine at this limit
con.execute("SET memory_limit='24GB'")


def emit(table, sql):
    con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows", flush=True)


VEC = con.execute(f"SELECT max(vec_id) + 1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]
DOC = con.execute(f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'").fetchone()[0]

# --- embeddings: decade-3 sign family -------------------------------
# composite-sign distinctness check FIRST (cheap, fails fast): the 100
# transforms seen by the ORIGINAL sf1 base are s'_m * s_k
def s10(i, k):
    return ((i * 31 + k * 17) % 97) % 2


def s100(i, m):
    return 0 if m == 0 else ((i * 37 + m * 23) % 101) % 2


# the SQL applies the sign at DuckDB's list_transform lambda index,
# which is 1-BASED — so the signs actually applied are at i = 1..64;
# the guard must test exactly that window (r15 ADVICE: a range(64)
# guard validated a shifted window — collision-free by luck, not
# by the check)
composites = set()
for m in range(K):
    for k in range(K):
        composites.add(tuple((s100(i, m) + s10(i, k)) % 2
                             for i in range(1, 65)))
assert len(composites) == K * K, \
    f"sign composition collision: {len(composites)} distinct of {K*K}"
print(f"sign compositions distinct: {len(composites)}/{K*K}")

if os.path.exists(f"{DST}/embeddings.parquet"):
    print("embeddings: already generated", flush=True)
else:
    emit("embeddings", " UNION ALL ".join(
        (f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet'"
         if m == 0 else f"""
      SELECT vec_id + {m}*{VEC} AS vec_id,
             list_transform(embedding,
               (x, i) -> CASE WHEN ((i*37 + {m}*23) % 101) % 2 = 1
                              THEN -x ELSE x END) AS embedding,
             label
      FROM '{SRC}/embeddings.parquet'""")
        for m in range(K)))

# --- documents: decade-3 permutation family --------------------------
vocab = sorted(r[0] for r in con.execute(
    f"SELECT DISTINCT unnest(string_split(text, ' ')) "
    f"FROM '{SRC}/documents.parquet'").fetchall())


def perm_of(seed):
    rnd = random.Random(seed)
    p = vocab[:]
    rnd.shuffle(p)
    return dict(zip(vocab, p))


ident = dict(zip(vocab, vocab))
sf1_perms = {0: ident, **{j: perm_of(42 + j) for j in range(1, K)}}
sf10_perms = {0: ident, **{k: perm_of(4200 + k) for k in range(1, K)}}
sf100_perms = {0: ident, **{m: perm_of(42000 + m) for m in range(1, K)}}
composed = set()
for m, pm in sf100_perms.items():
    for k, pk in sf10_perms.items():
        for j, pj in sf1_perms.items():
            composed.add(tuple(pm[pk[pj[w]]] for w in vocab))
assert len(composed) == K ** 3, \
    f"perm composition collision: {len(composed)} distinct of {K**3}"
print(f"perm compositions distinct: {len(composed)}/{K**3}")

con.execute("CREATE TEMP TABLE vocab_map (m INT, w VARCHAR, nw VARCHAR)")
for m in range(1, K):
    con.executemany("INSERT INTO vocab_map VALUES (?, ?, ?)",
                    [(m, a, sf100_perms[m][a]) for a in vocab])

stage = os.path.join(DST, "_documents_stage")
os.makedirs(stage, exist_ok=True)
if not os.path.exists(f"{stage}/copy0.parquet"):  # resumable staging
    con.execute(f"""COPY (SELECT doc_id, text, lang, source, n_chars
      FROM '{SRC}/documents.parquet')
      TO '{stage}/copy0.parquet' (FORMAT PARQUET)""")
print("documents copy 0: staged", flush=True)
def parquet_complete(path):
    # a parquet file ends with the footer magic 'PAR1'; an OOM-killed
    # COPY can leave a LARGE footer-less file that passes any size
    # threshold and still fails at the union read (r17 advice)
    if os.path.getsize(path) < 12:
        return False
    with open(path, "rb") as f:
        f.seek(-4, os.SEEK_END)
        return f.read(4) == b"PAR1"


for m in range(1, K):
    # resume only on VALID files: an OOM-killed COPY leaves a truncated
    # parquet behind ("too small to be a Parquet file" at the union read)
    if os.path.exists(f"{stage}/copy{m}.parquet"):
        if parquet_complete(f"{stage}/copy{m}.parquet"):
            print(f"documents copy {m}: already staged", flush=True)
            continue
        os.remove(f"{stage}/copy{m}.parquet")
        print(f"documents copy {m}: truncated stage dropped, re-staging",
              flush=True)
    con.execute(f"""COPY (
      SELECT doc_id + {m}*{DOC} AS doc_id,
             string_agg(x.nw, ' ' ORDER BY x.i) AS text,
             any_value(lang) AS lang, any_value(source) AS source,
             CAST(length(string_agg(x.nw, ' ' ORDER BY x.i)) AS BIGINT)
               AS n_chars
      FROM (
        SELECT t.doc_id, t.lang, t.source, t.i, mp.nw
        FROM (
          SELECT doc_id, lang, source,
                 unnest(string_split(text, ' ')) AS w,
                 generate_subscripts(string_split(text, ' '), 1) AS i
          FROM '{SRC}/documents.parquet') t
        JOIN vocab_map mp ON mp.m = {m} AND mp.w = t.w) x
      GROUP BY x.doc_id)
      TO '{stage}/copy{m}.parquet' (FORMAT PARQUET)""")
    print(f"documents copy {m}: staged", flush=True)
emit("documents", f"SELECT * FROM '{stage}/copy*.parquet'")
for f in os.listdir(stage):
    os.remove(os.path.join(stage, f))
os.rmdir(stage)
ndoc = con.execute(
    f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
ngen = con.execute(
    f"SELECT count(*) FROM '{DST}/documents.parquet'").fetchone()[0]
assert ngen == K * ndoc, f"documents rows {ngen} != {K}*{ndoc}"
print("done ->", DST)
