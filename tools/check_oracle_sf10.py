#!/usr/bin/env python3
"""sf10 heavy-set hash gate: like tools/check_oracle.py but for outputs too
large to materialize in pandas (q126 alone is ~1B rows). Both sides — Spark's
parquet dump and the DuckDB oracle result — are reduced INSIDE DuckDB to an
order-independent fingerprint (row count + HUGEINT sum of per-row hash() over
the sorted, type-canonicalized columns), so nothing is ever collected; memory
is O(1) and the compare is exact (any value difference shifts the hash sum).

Types are canonicalized from the SPARK parquet schema (ints -> BIGINT,
floats -> DOUBLE, timestamps -> TIMESTAMP, bools -> BOOLEAN, rest VARCHAR)
and the SAME casts are applied to the oracle side, so dtype-width differences
(INT32 vs INT64) can't fake a mismatch. hash() is evaluated by one engine
(DuckDB) on both relations — engine-specific hash functions never meet.

Usage: python3 tools/check_oracle_sf10.py <sfDir> <verifyOutDir> [only=qa,qb]
(run Verify with SPARK_GRAFT_VERIFY_PARALLEL=1 so dumps stay multi-file)

Two oracles carry sf10-only OVERRIDES below: their small-sf formulations are
deliberately naive (independent of the engine's optimizations), which is the
point of the gate — but at sf10 the naive forms exceed this box (the unrolled
PageRank chain and the un-collapsed posting self-join both spilled past the
74 GB free disk). The overrides compute the SAME function feasibly:
 - q144: the identical CTE chain STAGED as temp tables, one iteration at a
   time (bounded peak, previous round dropped);
 - q149: the identical-text clone collapse (sf10 is a x100 replication
   fixture — clones share their whole shingle set, so rep-level jaccard
   expands to member pairs bit-for-bit; the Spark side's collapse is
   spec-pinned pair-for-pair equal to the naive join, WinnowingSpec/DedupSpec).
"""
import sys, json, glob, os, time
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = None
for a in sys.argv[3:]:
    if a.startswith("only="):
        only = set(a[5:].split(","))
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
os.makedirs("/tmp/duckdb_spill", exist_ok=True)
con.execute("SET temp_directory='/tmp/duckdb_spill'")
con.execute("SET preserve_insertion_order=false")
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

PAGERANK_SETUP = [
    "CREATE TEMP TABLE pr_e AS SELECT DISTINCT o_custkey AS src, l_suppkey AS dst "
    "FROM orders JOIN lineitem ON l_orderkey = o_orderkey",
    "CREATE TEMP TABLE pr_nd AS SELECT src AS node FROM pr_e UNION SELECT dst AS node FROM pr_e",
    "CREATE TEMP TABLE pr_deg AS SELECT src, COUNT(*) AS outdeg FROM pr_e GROUP BY src",
    "CREATE TEMP TABLE pr_r0 AS SELECT node, "
    "(1000000000000000 // (SELECT COUNT(*) FROM pr_nd)) AS rank_fp FROM pr_nd",
] + [sql for k in range(1, 6) for sql in (
    f"CREATE TEMP TABLE pr_r{k} AS SELECT nd.node, "
    f"((15 * (1000000000000000 // (SELECT COUNT(*) FROM pr_nd))) // 100) "
    f"+ COALESCE(SUM((85 * (r.rank_fp // d.outdeg)) // 100), 0) AS rank_fp "
    f"FROM pr_nd nd LEFT JOIN pr_e e ON e.dst = nd.node "
    f"LEFT JOIN pr_r{k - 1} r ON r.node = e.src "
    f"LEFT JOIN pr_deg d ON d.src = e.src GROUP BY nd.node",
    f"DROP TABLE pr_r{k - 1}",
)]

PPJOIN_SETUP = [
    # one shingle set per DISTINCT text; rep = min doc_id of the clone group
    "CREATE TEMP TABLE pp_g AS SELECT text, min(doc_id) AS rep, COUNT(*) AS gn "
    "FROM documents GROUP BY text",
    "CREATE TEMP TABLE pp_m AS SELECT d.doc_id, g.rep FROM documents d "
    "JOIN pp_g g USING (text)",
    "CREATE TEMP TABLE pp_sh AS SELECT rep AS doc_id, list_distinct(list_transform("
    "range(1, greatest(len(t)-2, 1)+1), i -> array_to_string(t[i:i+2], ' '))) AS s "
    "FROM (SELECT rep, string_split_regex(trim(text), '\\s+') AS t FROM pp_g)",
    "CREATE TEMP TABLE pp_reppairs AS "
    "WITH inv AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM pp_sh), "
    "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS common "
    "      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
    "      GROUP BY 1, 2, 3, 4) "
    "SELECT id_a, id_b, CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) AS jaccard "
    "FROM p WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) >= 0.3",
]

OVERRIDES = {
    "q144_pagerank": {
        "setup": PAGERANK_SETUP,
        "final": "SELECT node, CAST(rank_fp AS BIGINT) AS rank_fp, "
                 "CAST(rank_fp AS DOUBLE) / 1000000000000000.0 AS rank FROM pr_r5",
    },
    "q149_jaccard_prefix_join": {
        "setup": PPJOIN_SETUP,
        # cross pairs inherit the rep pair's jaccard; intra-clone pairs are 1.0
        "final": "SELECT least(ma.doc_id, mb.doc_id) AS id_a, "
                 "greatest(ma.doc_id, mb.doc_id) AS id_b, jaccard "
                 "FROM pp_reppairs p JOIN pp_m ma ON ma.rep = p.id_a "
                 "JOIN pp_m mb ON mb.rep = p.id_b "
                 "UNION ALL "
                 "SELECT x.doc_id AS id_a, y.doc_id AS id_b, 1.0::DOUBLE AS jaccard "
                 "FROM pp_m x JOIN pp_m y ON x.rep = y.rep AND x.doc_id < y.doc_id",
    },
}

CANON = {"TINYINT": "BIGINT", "SMALLINT": "BIGINT", "INTEGER": "BIGINT",
         "BIGINT": "BIGINT", "HUGEINT": "HUGEINT", "UTINYINT": "BIGINT",
         "USMALLINT": "BIGINT", "UINTEGER": "BIGINT", "UBIGINT": "HUGEINT",
         "FLOAT": "DOUBLE", "DOUBLE": "DOUBLE", "BOOLEAN": "BOOLEAN",
         "DATE": "DATE"}

def canon_type(t):
    t = t.upper()
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    if t.startswith("DECIMAL"):
        return t  # keep exact scale; both sides wrote/compute the same decimal
    return CANON.get(t, "VARCHAR")

def fingerprint(rel_sql, cols_types):
    exprs = ", ".join(f'CAST("{c}" AS {t})' for c, t in cols_types)
    q = (f"SELECT count(*) AS n, sum(CAST(hash({exprs}) AS HUGEINT)) AS h "
         f"FROM ({rel_sql})")
    n, h = con.execute(q).fetchone()
    return n, h

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
checked = 0
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    checked += 1
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"MISSING  {name} (no spark output)", flush=True)
        fails.append(name)
        continue
    if name in OVERRIDES:
        for stmt in OVERRIDES[name]["setup"]:
            con.execute(stmt)
        sql = OVERRIDES[name]["final"]
    spark_rel = f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')"
    schema = con.execute(f"DESCRIBE {spark_rel}").fetchall()
    cols_types = sorted((r[0], canon_type(r[1])) for r in schema)
    try:
        want_cols = {r[0] for r in con.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()}
    except Exception as e:
        print(f"ERROR    {name}: oracle describe: {e}", flush=True)
        fails.append(name)
        continue
    if want_cols != {c for c, _ in cols_types}:
        print(f"SCHEMA   {name}: spark={sorted(c for c, _ in cols_types)} duckdb={sorted(want_cols)}",
              flush=True)
        fails.append(name)
        continue
    t0 = time.time()
    try:
        gn, gh = fingerprint(spark_rel, cols_types)
        wn, wh = fingerprint(sql, cols_types)
    except Exception as e:
        print(f"ERROR    {name}: {e}", flush=True)
        fails.append(name)
        continue
    if gn != wn:
        print(f"ROWS     {name}: spark={gn} duckdb={wn}", flush=True)
        fails.append(name)
    elif gh != wh:
        print(f"VALUES   {name}: hash-sum mismatch over {gn} rows", flush=True)
        fails.append(name)
    else:
        print(f"OK       {name} ({gn} rows, hash-sum match, {time.time()-t0:.0f}s)", flush=True)

# report over the queries actually CHECKED (only= restricts the run — the
# unrestricted totals would over-claim on filtered invocations, r8 ADVICE)
print(f"\n{checked - len(fails)}/{checked} queries match"
      + (f" (of {len(oracle)} total)" if checked != len(oracle) else ""))
sys.exit(1 if fails else 0)
