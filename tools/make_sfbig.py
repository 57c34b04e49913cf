#!/usr/bin/env python3
"""Build a key-shifted N× scale-up of an sf directory (default 10×
sf0.1 ≈ sf1) for out-of-gate correctness runs at one more decade.

Fact tables (orders, lineitem, events) are replicated N times with
surrogate keys shifted by k*(max+1) per copy so joins stay consistent
and group keys gain real extra members; dimension tables are copied
unchanged.

documents/embeddings scale N× too (r14), with PLANTED structure per
copy k (ids shifted by k*(max+1)):
  k=0  original
  k=1  exact copy            (exact-dup clusters double; md5 groupBys,
                              span/anchor docFreq caps, oversized LSH
                              buckets actually engage)
  k=2  light edit  (~1 token in 20 replaced  → Jaccard ≈ 0.85 band)
  k=3  medium edit (~1 token in 8 replaced   → Jaccard ≈ 0.6 band)
  k>=4 copy-private rewrite (every token from a per-copy 1000-word
       vocab → no cross-family near-dups; vocab/tfidf/unigram tails
       grow with real new mass)
embeddings: k=1 exact (cos=1), k=2 jitter ±0.005 (cos ≈ 0.999), k=3
jitter ±0.05, k>=4 fresh pseudo-random vectors. All perturbations are
deterministic (DuckDB hash() of (id, k, position)), so the artifact
reproduces bit-for-bit for a fixed DuckDB version.

`ts` is rewritten as TIMESTAMPTZ under UTC: DuckDB's COPY would
otherwise emit TIMESTAMP_NS/NTZ, which Spark reads as TIMESTAMP_NTZ and
every events oracle diverges on the type, not the values.

Usage: make_sfbig.py [srcDir] [dstDir] [factor]
Default: /root/testdata/sf0.1 /tmp/sfbig 10
"""
import sys, shutil, os
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.sql("SET timezone='UTC'")

for t in ["region", "nation", "customer", "supplier", "part"]:
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

md = con.sql(f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
mv = con.sql(f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]
ksd = f"(SELECT unnest(generate_series(0,{n - 1})) AS k)"

# token i of copy k: kept, replaced with a copy-tagged variant token
# (k=2,3), or drawn from a 1000-word per-copy vocab (k>=4)
con.sql(f"""COPY (
  WITH src AS (SELECT doc_id, string_split(text, ' ') AS t, lang, source
               FROM '{src}/documents.parquet'),
  built AS (
    SELECT doc_id + k*{md} AS doc_id,
      CASE
        WHEN k <= 1 THEN t
        WHEN k = 2 THEN list_transform(t, (w, i) ->
          CASE WHEN (hash(doc_id*131 + i*7 + 2) % 20) = 0
               THEN 'v2x' || (hash(doc_id + i) % 7) ELSE w END)
        WHEN k = 3 THEN list_transform(t, (w, i) ->
          CASE WHEN (hash(doc_id*131 + i*7 + 3) % 8) = 0
               THEN 'v3x' || (hash(doc_id + i) % 7) ELSE w END)
        ELSE list_transform(t, (w, i) ->
          'u' || k || 'w' || (hash(doc_id*8191 + i*31 + k) % 1000))
      END AS toks,
      lang, source
    FROM src, {ksd})
  SELECT doc_id, array_to_string(toks, ' ') AS text, lang, source,
         length(array_to_string(toks, ' ')) AS n_chars
  FROM built)
  TO '{dst}/documents.parquet' (FORMAT parquet)""")

con.sql(f"""COPY (
  WITH src AS (SELECT vec_id, embedding, label
               FROM '{src}/embeddings.parquet'),
  built AS (
    SELECT vec_id + k*{mv} AS vec_id,
      CASE
        WHEN k <= 1 THEN embedding
        WHEN k = 2 THEN list_transform(embedding, (x, i) ->
          CAST(x + (CAST(hash(vec_id*64 + i + 2) % 1000 AS BIGINT) - 500) * 0.00001
               AS FLOAT))
        WHEN k = 3 THEN list_transform(embedding, (x, i) ->
          CAST(x + (CAST(hash(vec_id*64 + i + 3) % 1000 AS BIGINT) - 500) * 0.0001
               AS FLOAT))
        ELSE list_transform(embedding, (x, i) ->
          CAST((CAST(hash(vec_id*64 + i + k) % 2000 AS BIGINT) - 1000) * 0.001 AS FLOAT))
      END AS embedding,
      label
    FROM src, {ksd})
  SELECT * FROM built)
  TO '{dst}/embeddings.parquet' (FORMAT parquet)""")

mo = con.sql(f"SELECT max(o_orderkey)+1 FROM '{src}/orders.parquet'").fetchone()[0]
me = con.sql(f"SELECT max(event_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
mu = con.sql(f"SELECT max(user_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
ks = f"(SELECT unnest(generate_series(0,{n - 1})) AS k)"

con.sql(f"""COPY (SELECT o_orderkey + k*{mo} AS o_orderkey, o_custkey,
  o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}/orders.parquet', {ks})
  TO '{dst}/orders.parquet' (FORMAT parquet)""")
con.sql(f"""COPY (SELECT l_orderkey + k*{mo} AS l_orderkey, l_partkey,
  l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
  l_returnflag, l_linestatus, l_shipdate
  FROM '{src}/lineitem.parquet', {ks})
  TO '{dst}/lineitem.parquet' (FORMAT parquet)""")
con.sql(f"""COPY (SELECT event_id + k*{me} AS event_id,
  ts::TIMESTAMPTZ AS ts, user_id + k*{mu} AS user_id, event_type, value,
  props
  FROM '{src}/events.parquet', {ks})
  TO '{dst}/events.parquet' (FORMAT parquet)""")

for t in ["orders", "lineitem", "events", "documents", "embeddings"]:
    print(t, con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0])
