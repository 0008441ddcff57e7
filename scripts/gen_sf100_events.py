#!/usr/bin/env python3
"""Generate the sf100 EVENTS decade (r10): x10 key-offset replication of the
sf10 events table -> 600M rows, the CEP/MATCH_RECOGNIZE third decade (the
corpus family got its third decade in r8; this is the events-side analogue).

Construction matches gen_sf10.py: event ids offset far above the sf10 range,
timestamps shifted 3000 days per replica (the sf10 replicas span ~100x30
days), user ids UNCHANGED — so per-key chains get 10x longer, which is
exactly the dimension that stresses the per-key sequential cursor and the
pointer-doubling oracle (14 doublings at ~13.7k matches/key).

Output: /root/repo/benchdata/sf100e/events.parquet (gitignored).
"""
import os
import duckdb

SRC = "/root/repo/benchdata/sf10"
DST = "/root/repo/benchdata/sf100e"
N = 10
OFF = 10_000_000_000  # above the sf10 id range (max ~1e9)

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")

sql = " UNION ALL ".join(
    f"SELECT event_id + {i * OFF} AS event_id, "
    f"CAST(ts + INTERVAL {i * 3000} DAY AS TIMESTAMP_NS) AS ts, "
    f"* EXCLUDE (event_id, ts) FROM '{SRC}/events.parquet'"
    for i in range(N))
con.execute(f"COPY ({sql}) TO '{DST}/events.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 262144)")
n = con.execute(f"SELECT count(*) FROM '{DST}/events.parquet'").fetchone()[0]
print(f"events: {n} rows", flush=True)
