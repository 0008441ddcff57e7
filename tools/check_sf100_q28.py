#!/usr/bin/env python3
"""sf100 value gate for q28 (MinHash+LSH near-dup) — r8 verdict directive #3.

A full DuckDB oracle for q28 is infeasible at ANY sf: which candidate pairs
LSH surfaces depends on xxhash64 banding, engine-local by construction
(recall >= 0.9 vs exact is spec-gated, DedupSpec). But every pair q28 EMITS
carries an EXACT jaccard — a value surface DuckDB can verify independently,
and at the sf100 clone fixture the verification reduces to REP level:
clone members share their text, so a member pair's jaccard equals its rep
pair's (cross) or 1.0 (intra). Three checks over the 2.75B-row dump, all
streaming aggregates (no pair set ever materializes):

 1. SOUNDNESS: every dumped pair's (rep_a, rep_b) is either intra
    (rep_a = rep_b) or present in the exact rep-level prefix join at the
    query's threshold — LSH never invents a pair;
 2. VALUES: the dumped jaccard is BIT-EQUAL to the rep-level exact value
    (1.0 for intra) — max |delta| must be 0 (both engines divide the same
    two integers);
 3. COMPLETENESS (deterministic subset): identical texts band identically,
    so ALL intra-clone pairs must be present: their count must equal
    sum over clone groups of C(gn, 2).

Usage: python3 tools/check_sf100_q28.py <sf100Dir> <dumpDir> [threshold]
"""
import os
import sys

import duckdb

sfdir, dump = sys.argv[1], sys.argv[2]
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.2

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
os.makedirs("/tmp/duckdb_spill", exist_ok=True)
con.execute("SET temp_directory='/tmp/duckdb_spill'")
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sfdir}/documents.parquet')")

# clone groups + rep-level exact jaccard (the check_oracle_sf10 collapse)
con.execute("CREATE TEMP TABLE g AS SELECT text, min(doc_id) AS rep, COUNT(*) AS gn "
            "FROM documents GROUP BY text")
con.execute("CREATE TEMP TABLE m AS SELECT d.doc_id, g.rep FROM documents d JOIN g USING (text)")
con.execute("CREATE TEMP TABLE sh AS SELECT rep AS doc_id, list_distinct(list_transform("
            "range(1, greatest(len(t)-2, 1)+1), i -> array_to_string(t[i:i+2], ' '))) AS s "
            "FROM (SELECT rep, string_split_regex(trim(text), '\\s+') AS t FROM g)")
con.execute(f"CREATE TEMP TABLE reppairs AS "
            "WITH inv AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh), "
            "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, "
            "             COUNT(*) AS common "
            "      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
            "      GROUP BY 1, 2, 3, 4) "
            "SELECT id_a, id_b, CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) AS j "
            f"FROM p WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) >= {thr}")

n, missing, maxdelta, intra = con.execute(f"""
    WITH d AS (SELECT da.rep AS ra, db.rep AS rb, t.jaccard
               FROM read_parquet('{dump}/*.parquet') t
               JOIN m da ON da.doc_id = t.id_a
               JOIN m db ON db.doc_id = t.id_b)
    SELECT count(*),
           sum(CASE WHEN d.ra <> d.rb AND r.j IS NULL THEN 1 ELSE 0 END),
           max(abs(d.jaccard - CASE WHEN d.ra = d.rb THEN 1.0 ELSE r.j END)),
           sum(CASE WHEN d.ra = d.rb THEN 1 ELSE 0 END)
    FROM d LEFT JOIN reppairs r
      ON r.id_a = least(d.ra, d.rb) AND r.id_b = greatest(d.ra, d.rb)
""").fetchone()
want_intra = con.execute("SELECT sum(gn * (gn - 1) // 2) FROM g").fetchone()[0]

ok = (missing == 0) and (maxdelta == 0.0) and (intra == want_intra)
print(f"q28 sf100: {n} pairs; soundness missing={missing}; value max|delta|={maxdelta}; "
      f"intra {intra} vs expected {want_intra}; {'OK' if ok else 'FAIL'}")
sys.exit(0 if ok else 1)
