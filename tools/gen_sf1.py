#!/usr/bin/env python3
"""Generates the r19 sf1 SCALING dataset (10x sf0.1) into /root/testdata_sf1.

Used only for the committed BENCH_r19_sf1_c{2,8,32}.json scaling records
(VERDICT r18 next-round #8) - the driver's correctness/bench contract is
untouched. Replica construction keeps each replica's INTERNAL similarity
structure identical to sf0.1 while replicas stay disjoint where it matters:

- documents: replica k>0 suffixes EVERY token with 'r<k>', so replica token
  sets are disjoint (no cross-replica near-dups; shingle/minhash/LM kernels
  see a genuinely 10x corpus whose per-replica dup structure mirrors sf0.1).
- customer: new keys get format-faithful 'Customer#%09d' names (the q86
  fuzzy-join workload shape is preserved; cross-replica digit-distance
  pairs add true pairs, as a bigger corpus would).
- lineitem: key offset per replica, values unchanged (q1 aggregates 10x).
- embeddings: id offset + tiny per-replica value shift (keeps vectors
  distinct; the IVF/PQ paths fall to the layout-independent sample path).
"""
import duckdb

con = duckdb.connect()
con.execute("PRAGMA threads=16")
base, out = '/root/testdata/sf0.1', '/root/testdata_sf1'

con.execute(f"""
COPY (
  SELECT doc_id + k*10000000 AS doc_id,
         CASE WHEN k=0 THEN text
              ELSE regexp_replace(text, '(\\S+)', concat('\\1r', CAST(k AS VARCHAR)), 'g') END AS text,
         lang, source,
         CAST(length(CASE WHEN k=0 THEN text
              ELSE regexp_replace(text, '(\\S+)', concat('\\1r', CAST(k AS VARCHAR)), 'g') END) AS BIGINT) AS n_chars
  FROM read_parquet('{base}/documents.parquet'), UNNEST(range(0,10)) AS t(k)
) TO '{out}/documents.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)""")

con.execute(f"""
COPY (
  SELECT c_custkey + k*1000000 AS c_custkey,
         concat('Customer#', lpad(CAST(c_custkey + k*1000000 AS VARCHAR), 9, '0')) AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM read_parquet('{base}/customer.parquet'), UNNEST(range(0,10)) AS t(k)
) TO '{out}/customer.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)""")

con.execute(f"""
COPY (
  SELECT l_orderkey + k*100000000 AS l_orderkey, l_partkey, l_suppkey, l_linenumber,
         l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{base}/lineitem.parquet'), UNNEST(range(0,10)) AS t(k)
) TO '{out}/lineitem.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)""")

con.execute(f"""
COPY (
  SELECT vec_id + k*10000000 AS vec_id,
         CAST(list_transform(embedding, x -> x + k*0.0001) AS FLOAT[]) AS embedding,
         label
  FROM read_parquet('{base}/embeddings.parquet'), UNNEST(range(0,10)) AS t(k)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)""")

for t in ['documents', 'customer', 'lineitem', 'embeddings']:
    print(t, con.execute(
        f"select count(*) from read_parquet('{out}/{t}.parquet')").fetchone()[0])
