#!/usr/bin/env python3
"""Build a key-shifted N× scale-up of an sf directory (default 10×
sf0.1 ≈ sf1) for out-of-gate correctness runs at one more decade.

Fact tables (orders, lineitem, events) are replicated N times with
surrogate keys shifted by k*(max+1) per copy so joins stay consistent
and group keys gain real extra members; dimension/doc tables are copied
unchanged (doc/embedding queries are verified separately and their
semantics don't scale with the relational SF).

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

for t in ["region", "nation", "customer", "supplier", "part",
          "documents", "embeddings"]:
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

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

for t in ["orders", "lineitem", "events"]:
    print(t, con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0])
