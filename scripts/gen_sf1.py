#!/usr/bin/env python3
"""Generate an sf1 bench dataset by x10 key-offset replication of the driver's
sf0.1 testdata (BASELINE.md round-3 bench anchor; VERDICT r2 directive #8).

Value distributions are preserved exactly (no synthetic content); only join
keys are offset per replica so FK relationships stay consistent, and event
timestamps shift by 30 days per replica so the event stream covers 10x the
windows instead of 10x the density. events.ts is written back as TIMESTAMP_NS
to match the driver fixture's parquet type (graft.core.Tables reads nanos).

Output: /root/repo/benchdata/sf1/*.parquet (gitignored; ~170 MB).
"""
import os
import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/benchdata/sf1"
N = 10
OFF = 10_000_000  # key offset per replica, far above any sf0.1 key

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

# ROW_GROUP_SIZE keeps multiple row groups per file so Spark's byte-range
# splits can parallelise a single-file scan (one 122880-row group would pin
# a 50k-doc table to one task regardless of maxPartitionBytes).
def rep(table, select_i, rgs=32768):
    sql = " UNION ALL ".join(select_i(i) for i in range(N))
    con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {rgs})")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

# static dims: copy as-is
for t in ("region", "nation", "supplier", "part"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

rep("customer", lambda i:
    f"SELECT c_custkey + {i*OFF} AS c_custkey, * EXCLUDE (c_custkey) "
    f"FROM '{SRC}/customer.parquet'")

rep("orders", lambda i:
    f"SELECT o_orderkey + {i*OFF} AS o_orderkey, o_custkey + {i*OFF} AS o_custkey, "
    f"* EXCLUDE (o_orderkey, o_custkey) FROM '{SRC}/orders.parquet'")

rep("lineitem", lambda i:
    f"SELECT l_orderkey + {i*OFF} AS l_orderkey, * EXCLUDE (l_orderkey) "
    f"FROM '{SRC}/lineitem.parquet'")

rep("events", lambda i:
    f"SELECT event_id + {i*OFF} AS event_id, "
    f"CAST(ts + INTERVAL {i*30} DAY AS TIMESTAMP_NS) AS ts, "
    f"* EXCLUDE (event_id, ts) FROM '{SRC}/events.parquet'")

rep("documents", lambda i:
    f"SELECT doc_id + {i*OFF} AS doc_id, * EXCLUDE (doc_id) "
    f"FROM '{SRC}/documents.parquet'", rgs=2048)

rep("embeddings", lambda i:
    f"SELECT vec_id + {i*OFF} AS vec_id, * EXCLUDE (vec_id) "
    f"FROM '{SRC}/embeddings.parquet'", rgs=2048)
