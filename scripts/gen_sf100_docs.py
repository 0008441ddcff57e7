#!/usr/bin/env python3
"""Generate a DOCUMENTS/EMBEDDINGS-only sf100 decade (round 8): x1000
key-offset replication of the driver's sf0.1 corpus tables — the clone
multiplicity regime one decade above the sf10 gate (1000 clones per distinct
text/vector), at trivial disk cost (~700 MB) because the relational tables
stay out. Exists to answer "would the collapse family survive ANOTHER 10x?"
with a measurement instead of an argument: intra-clone answers are quadratic
in multiplicity (C(1000,2) x 4992 distinct texts ~ 2.5B pairs), so any
candidate path that is not answer-sized dies here loudly.

Output: /root/repo/benchdata/sf100/{documents,embeddings}.parquet (gitignored).
"""
import os
import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/benchdata/sf100"
N = 1000
OFF = 10_000_000

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def rep(table, key, rgs=65536):
    # cross-join replication (a 1000-way UNION ALL overflows the parser)
    sql = (f"SELECT {key} + r.i * {OFF} AS {key}, t.* EXCLUDE ({key}) "
           f"FROM '{SRC}/{table}.parquet' t, (SELECT unnest(range({N})) AS i) r")
    con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {rgs})")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows", flush=True)

rep("documents", "doc_id")
rep("embeddings", "vec_id")
