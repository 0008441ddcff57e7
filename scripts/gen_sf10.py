#!/usr/bin/env python3
"""Generate an sf10 heavy-set dataset by x100 key-offset replication of the
driver's sf0.1 testdata (VERDICT r6 directive #3 — one more decade above the
sf1 bench point, where every scale surprise so far has surfaced).

Same construction as gen_sf1.py (distributions preserved; keys offset per
replica; event timestamps shift 30 days per replica so the stream covers
100x the windows, not 100x the density). ~60M lineitem / 60M events /
500k documents / 200k embeddings; ~1.7 GB of parquet — fits the 128 GiB
local[32] box with room for the heavy queries' shuffles.

Output: /root/repo/benchdata/sf10/*.parquet (gitignored).
"""
import os
import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/benchdata/sf10"
N = 100
OFF = 10_000_000  # key offset per replica, far above any sf0.1 key

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def rep(table, select_i, rgs=65536):
    sql = " UNION ALL ".join(select_i(i) for i in range(N))
    con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {rgs})")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows", flush=True)

for t in ("region", "nation", "supplier", "part"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied", flush=True)

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
    f"FROM '{SRC}/documents.parquet'", rgs=8192)

rep("embeddings", lambda i:
    f"SELECT vec_id + {i*OFF} AS vec_id, * EXCLUDE (vec_id) "
    f"FROM '{SRC}/embeddings.parquet'", rgs=8192)
