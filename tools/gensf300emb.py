#!/usr/bin/env python3
"""Fourth-decade ANN fixture: a 6M-vector embeddings-ONLY table (3x the
sf100 2M), for the s05 BucketTopK law spot-check (r15 verdict #8 / r17
next-round #5). Same discipline as gensf100.py's decade-3 sign family:
copy m of the sf100 table applies sign pattern s300(i, m) = ((i*41 +
m*29) % 103) % 2 at DuckDB's 1-BASED lambda index, and the composite of
ALL transform chains back to the sf1 base must stay distinct (a sign
collision would create exact-duplicate vectors and artificially dense
LSH buckets — the exact structure the law measures).

Usage: python3 tools/gensf300emb.py  (reads target/testdata/sf100,
writes target/testdata/sf300emb/embeddings.parquet)
"""
import os
import duckdb

SRC = "target/testdata/sf100"
DST = "target/testdata/sf300emb"
K = 3  # copies of sf100


def s10(i, k):
    return ((i * 31 + k * 17) % 97) % 2


def s100(i, m):
    return 0 if m == 0 else ((i * 37 + m * 23) % 101) % 2


def s300(i, m):
    return 0 if m == 0 else ((i * 41 + m * 29) % 103) % 2


# distinctness over the FULL chain sf1 -> sf10 (k) -> sf100 (m) -> here
# (q), tested at the applied window i = 1..64 (gensf100's r15 lesson)
composites = set()
for q in range(K):
    for m in range(10):
        for k in range(10):
            composites.add(tuple(
                (s300(i, q) + s100(i, m) + s10(i, k)) % 2
                for i in range(1, 65)))
assert len(composites) == K * 100, \
    f"sign composition collision: {len(composites)} distinct of {K * 100}"
print(f"sign compositions distinct: {len(composites)}/{K * 100}")

os.makedirs(DST, exist_ok=True)
out = f"{DST}/embeddings.parquet"
if os.path.exists(out):
    print("sf300emb embeddings: already generated", flush=True)
    raise SystemExit(0)

con = duckdb.connect()
VEC = con.execute(
    f"SELECT max(vec_id) + 1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]
print(f"sf100 vectors: {VEC}", flush=True)
sql = " UNION ALL ".join(
    (f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet'"
     if m == 0 else f"""
  SELECT vec_id + {m}*{VEC} AS vec_id,
         list_transform(embedding,
           (x, i) -> CASE WHEN ((i*41 + {m}*29) % 103) % 2 = 1
                          THEN -x ELSE x END) AS embedding,
         label
  FROM '{SRC}/embeddings.parquet'""")
    for m in range(K))
con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
print(f"sf300emb embeddings: {K * VEC} vectors at {out}", flush=True)
