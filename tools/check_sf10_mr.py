#!/usr/bin/env python3
"""sf10 hash gate for q164/q165 (unbounded MATCH_RECOGNIZE, skip-past) —
the same-function-feasibly override, q144/q149's discipline.

The catalog oracle's recursive CTE walks selected match -> next candidate,
so its iteration count is MATCHES PER KEY — fine at sf0.01 (a few per key),
~1,368 per key at sf10 (the gate run stalled ~1h deep in it). This script
computes the IDENTICAL greedy non-overlap selection with POINTER DOUBLING:

  next(c)  = the first candidate of c's key starting past c's last row
             (one ASOF join — smallest rn >= e+1 via the negation trick);
  jump_2k  = jump_k o jump_k (11 doublings cover 2^11 > max matches/key);
  selected = nodes reachable from each key's first candidate, built in
             log steps: reach_{k+1} = reach_k UNION jump_2^k(reach_k).

Selection depends only on (first candidate, next()) — the same chain the
recursive member walks one step at a time — so the result is equal BY
CONSTRUCTION, and this script additionally validates itself against the
recursive-oracle-green dump at sf0.01 before being trusted at sf10.

Usage: python3 tools/check_sf10_mr.py <sfDir> <verifyOutDir>
(expects dumps for q164_match_ticker_runs and q165_match_all_rows)
"""
import os
import sys
import time

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
os.makedirs("/tmp/duckdb_spill", exist_ok=True)
con.execute("SET temp_directory='/tmp/duckdb_spill'")

t0 = time.time()
con.execute(f"""
CREATE TEMP TABLE r AS
SELECT user_id, ts, event_id, value,
       row_number() OVER w AS rn,
       (value < lag(value) OVER w) AS dflag,
       (value > lag(value) OVER w) AS uflag
FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
      FROM read_parquet('{sfdir}/events.parquet')) e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""")
for flag, tbl in (("dflag", "dre"), ("uflag", "ure")):
    con.execute(f"""
CREATE TEMP TABLE {tbl} AS
SELECT user_id, rn, max(rn) OVER (PARTITION BY user_id, grp) AS run_end
FROM (SELECT user_id, rn, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM r WHERE {flag})""")
# next(c): smallest candidate rn past the skip point of the same key —
# skip-past resumes AFTER the match (rn >= e+1, q164/q165); SKIP TO LAST U
# resumes AT the peak row (rn >= e, q167). ASOF picks the GREATEST right
# <= left, so negate both sides to get the smallest >=.
mode = sys.argv[3] if len(sys.argv) > 3 else "skippast"

# candidate construction per family: the q164 ticker (maximal D then U runs),
# q169's cross-variable cap (U prefix below the anchor's value — rising
# islands are monotone so the cap is a prefix; no qualifying first row drops
# the candidate, mirroring the NFA's backtrack dead end), q170's self-first
# cap (prefix below 1.5x the run's own first row)
if mode in ("xvar", "subdef"):
    # q179 ("subdef") = q169's monotone-island prefix cap with a 2x anchor
    # threshold — FIRST(M.value) over SUBSET M = (S, D) is the anchor row
    # q169's cap (rising prefix below the anchor's value) over a STRICTLY
    # monotone island = ASOF binary search, same as selffirst — the naive
    # BETWEEN form was fine at sf10 (45 s) but superlinear at the sf100e
    # decade (5+ CPU-hours, killed)
    con.execute("""
CREATE TEMP TABLE isl AS
SELECT user_id, rn, value, grp,
       max(rn) OVER (PARTITION BY user_id, grp) AS isl_end
FROM (SELECT user_id, rn, value,
             rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM r WHERE uflag)""")
    con.execute("""
CREATE TEMP TABLE cand AS
WITH cand0 AS (SELECT s.user_id, s.rn, s.ts AS start_ts, s.event_id AS start_tie,
                      s.value AS sval, d.run_end AS m, f.grp, f.isl_end
               FROM r s
               JOIN dre d ON d.user_id = s.user_id AND d.rn = s.rn + 1
               JOIN isl f ON f.user_id = s.user_id AND f.rn = d.run_end + 1),
     capped AS (SELECT c.user_id, c.rn, c.start_ts, c.start_tie, c.m,
                       coalesce(x.rn - 1, c.isl_end) AS e_eff
                FROM cand0 c ASOF LEFT JOIN isl x
                  ON x.user_id = c.user_id AND x.grp = c.grp
                 AND -x.value <= -(%s))
SELECT user_id, rn, start_ts, start_tie, m, e_eff AS e
FROM capped WHERE e_eff >= m + 1""" % ("2 * c.sval" if mode == "subdef" else "c.sval"))
elif mode == "lazy":
    # q171 `S B{2,}?`: the shortest admissible run is EXACTLY two rising rows
    con.execute("""
CREATE TEMP TABLE cand AS
SELECT s.user_id, s.rn, s.ts AS start_ts, s.event_id AS start_tie,
       s.rn AS m, s.rn + 2 AS e
FROM r s
JOIN ure u ON u.user_id = s.user_id AND u.rn = s.rn + 1
WHERE u.run_end >= s.rn + 2""")
elif mode == "selffirst":
    # q170's cap is a prefix of a STRICTLY rising island, so "last row below
    # 1.5x the run's first value" = (first row >= the threshold) - 1 — an
    # ASOF binary search on value (monotone within the island), not a range
    # join: the naive BETWEEN form was O(sum of island-suffix pairs) and
    # burned 14 CPU-hours at sf10 before being killed
    con.execute("""
CREATE TEMP TABLE isl AS
SELECT user_id, rn, value, grp,
       max(rn) OVER (PARTITION BY user_id, grp) AS isl_end
FROM (SELECT user_id, rn, value,
             rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM r WHERE uflag)""")
    con.execute("""
CREATE TEMP TABLE cand AS
WITH anch AS (SELECT s.user_id, s.rn, s.ts, s.event_id,
                     f.grp, f.isl_end, 1.5 * f.value AS thr
              FROM r s
              JOIN isl f ON f.user_id = s.user_id AND f.rn = s.rn + 1),
     capped AS (SELECT a.user_id, a.rn, a.ts, a.event_id,
                       coalesce(x.rn - 1, a.isl_end) AS e_eff
                FROM anch a ASOF LEFT JOIN isl x
                  ON x.user_id = a.user_id AND x.grp = a.grp AND -x.value <= -a.thr)
SELECT user_id, rn, ts AS start_ts, event_id AS start_tie, rn AS m, e_eff AS e
FROM capped WHERE e_eff >= rn + 1""")
elif mode == "cls1":
    # q181 `S D+ U*` (r14): the rise run is OPTIONAL — e falls back to the
    # fall-run end; the ONE-ROW CLASSIFIER is then 'D' (empty U* run)
    con.execute("""
CREATE TEMP TABLE cand AS
SELECT s.user_id, s.rn, s.ts AS start_ts, s.event_id AS start_tie,
       d.run_end AS m, coalesce(u.run_end, d.run_end) AS e
FROM r s
JOIN dre d ON d.user_id = s.user_id AND d.rn = s.rn + 1
LEFT JOIN ure u ON u.user_id = s.user_id AND u.rn = d.run_end + 1""")
else:
    con.execute("""
CREATE TEMP TABLE cand AS
SELECT s.user_id, s.rn, s.ts AS start_ts, s.event_id AS start_tie,
       d.run_end AS m, u.run_end AS e
FROM r s
JOIN dre d ON d.user_id = s.user_id AND d.rn = s.rn + 1
JOIN ure u ON u.user_id = s.user_id AND u.rn = d.run_end + 1""")
resume = "c.e" if mode == "tolast" else "(c.e + 1)"
con.execute(f"""
CREATE TEMP TABLE jump AS
SELECT c.user_id, c.rn, n.rn AS nxt
FROM cand c ASOF LEFT JOIN cand n
  ON n.user_id = c.user_id AND -n.rn <= -{resume}""")
maxchain = con.execute(
    "SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM cand GROUP BY user_id)").fetchone()[0]
k = 0
while (1 << k) < maxchain:
    prev = "jump" if k == 0 else f"j{1 << k}"
    con.execute(f"""
CREATE TEMP TABLE j{2 << k} AS
SELECT a.user_id, a.rn, b.nxt
FROM {prev} a
JOIN {prev} b ON b.user_id = a.user_id AND b.rn = a.nxt
WHERE a.nxt IS NOT NULL""")
    k += 1
# heads: the first candidate per key is always selected (the cursor starts
# before it and nothing earlier can consume its anchor); then
# reach_{p+1} = reach_p UNION jump_{2^p}(reach_p), ascending powers — after
# the last power every chain node is reached (chain length <= 2^k)
con.execute("CREATE TEMP TABLE reach AS "
            "SELECT user_id, min(rn) AS rn FROM cand GROUP BY user_id")
for p in range(0, k):
    jt = "jump" if p == 0 else f"j{1 << p}"
    con.execute(f"""
INSERT INTO reach
SELECT j.user_id, j.nxt FROM reach x JOIN {jt} j
  ON j.user_id = x.user_id AND j.rn = x.rn
WHERE j.nxt IS NOT NULL""")
con.execute("CREATE TEMP TABLE sel AS "
            "SELECT DISTINCT c.user_id, c.rn, c.start_ts, c.start_tie, c.m, c.e "
            "FROM (SELECT DISTINCT user_id, rn FROM reach) x JOIN cand c USING (user_id, rn)")
print(f"setup+selection {time.time()-t0:.0f}s; selected =",
      con.execute("SELECT count(*) FROM sel").fetchone()[0], flush=True)

FINALS_CLS1 = { # q181 rides the optional-rise cand ("cls1" mode, r14)
    "q181_match_classifier_one_row": """
        SELECT sel.user_id, start_ts AS match_start_ts, start_tie,
               CASE WHEN e > m THEN 'U' ELSE 'D' END AS last_label,
               CAST(e - m AS BIGINT) AS n_up
        FROM sel""",
}

FINALS_TOLAST = {
    "q167_match_skip_to_last": """
        SELECT sel.user_id, start_ts AS match_start_ts, re.ts AS match_end_ts, start_tie,
               row_number() OVER (PARTITION BY sel.user_id ORDER BY sel.rn) AS match_seq
        FROM sel
        JOIN r re ON re.user_id = sel.user_id AND re.rn = sel.e""",
}

FINALS_XVAR = {
    "q169_match_xvar_cap": """
        SELECT sel.user_id, start_ts AS match_start_ts, re.ts AS match_end_ts, start_tie,
               rm.value AS bottom_value, re.value AS top_value
        FROM sel
        JOIN r rm ON rm.user_id = sel.user_id AND rm.rn = sel.m
        JOIN r re ON re.user_id = sel.user_id AND re.rn = sel.e""",
}

FINALS_SUBDEF = { # q179 rides the 2x-threshold island cap ("subdef" mode)
    "q179_match_subset_define": """
        SELECT sel.user_id, start_ts AS match_start_ts, re.ts AS match_end_ts, start_tie,
               rm.value AS bottom_value, re.value AS top_value
        FROM sel
        JOIN r rm ON rm.user_id = sel.user_id AND rm.rn = sel.m
        JOIN r re ON re.user_id = sel.user_id AND re.rn = sel.e""",
}

FINALS_NAV = { # q172 rides the same ticker cand/sel as q164 ("nav" mode).
    # NULL-target equi-joins, not expression conditions in ON: mixing the
    # equality with a side-local inequality made DuckDB plan an inequality
    # join (8+ CPU-hours at sf10 before being killed)
    "q172_match_nav_offsets": """
        WITH s2 AS (SELECT *,
                           CASE WHEN m + 2 <= e THEN m + 2 END AS su_rn,
                           CASE WHEN m - 1 >= rn + 1 THEN m - 1 END AS bb_rn
                    FROM sel)
        SELECT s2.user_id, start_ts AS match_start_ts, re.ts AS match_end_ts, start_tie,
               su.value AS second_up, bb.value AS before_bottom
        FROM s2
        JOIN r re ON re.user_id = s2.user_id AND re.rn = s2.e
        LEFT JOIN r su ON su.user_id = s2.user_id AND su.rn = s2.su_rn
        LEFT JOIN r bb ON bb.user_id = s2.user_id AND bb.rn = s2.bb_rn""",
}

FINALS_RUNNING = { # q173 rides the ticker cand/sel ("running" mode)
    "q173_match_running": """
        WITH rows0 AS (SELECT s.user_id, s.rn AS srn, s.m, s.e, r.rn, r.ts, r.event_id, r.value
                       FROM sel s JOIN r ON r.user_id = s.user_id AND r.rn BETWEEN s.rn AND s.e),
             rows1 AS (SELECT *, CASE WHEN rn >= srn + 1 THEN least(rn, m) END AS rd_rn FROM rows0)
        SELECT w.user_id, w.ts, w.event_id, w.value,
               CASE WHEN w.rn = w.srn THEN 'S' WHEN w.rn <= w.m THEN 'D' ELSE 'U' END AS cls,
               rd.value AS run_bottom,
               CASE WHEN w.rn > w.m THEN w.value END AS run_top,
               re.value AS final_top
        FROM rows1 w
        LEFT JOIN r rd ON rd.user_id = w.user_id AND rd.rn = w.rd_rn
        JOIN r re ON re.user_id = w.user_id AND re.rn = w.e""",
}

FINALS_RUNNINGAGG = { # q174 rides the ticker cand/sel ("runningagg" mode):
    # running aggregates = windowed prefix aggregates within the match
    "q174_match_running_aggs": """
        WITH rows0 AS (SELECT s.user_id, s.rn AS srn, s.m, s.e, r.rn, r.ts, r.event_id, r.value
                       FROM sel s JOIN r ON r.user_id = s.user_id AND r.rn BETWEEN s.rn AND s.e)
        SELECT user_id, ts, event_id, value,
               CASE WHEN rn = srn THEN 'S' WHEN rn <= m THEN 'D' ELSE 'U' END AS cls,
               COUNT(CASE WHEN rn > srn AND rn <= m THEN 1 END)
                 OVER (PARTITION BY user_id, srn ORDER BY rn) AS d_seen,
               CAST(SUM(CASE WHEN rn > m THEN CAST(value AS DECIMAL(25,6)) END)
                 OVER (PARTITION BY user_id, srn ORDER BY rn) AS DOUBLE) AS run_up_sum,
               MIN(CASE WHEN rn > srn AND rn <= m THEN value END)
                 OVER (PARTITION BY user_id, srn ORDER BY rn) AS run_bottom,
               e - m AS final_n_up
        FROM rows0""",
}

FINALS_LAZY = {
    "q171_match_reluctant": """
        SELECT sel.user_id, start_ts AS match_start_ts, re.ts AS match_end_ts, start_tie,
               re.value AS top_value
        FROM sel
        JOIN r re ON re.user_id = sel.user_id AND re.rn = sel.e""",
}

FINALS_SELFFIRST = {
    "q170_match_self_first": """
        SELECT sel.user_id, start_ts AS match_start_ts, re.ts AS match_end_ts, start_tie,
               rf.value AS first_up, re.value AS top_value
        FROM sel
        JOIN r rf ON rf.user_id = sel.user_id AND rf.rn = sel.rn + 1
        JOIN r re ON re.user_id = sel.user_id AND re.rn = sel.e""",
}

FINALS = {
    "q168_match_aggregates": """
        WITH ua AS (SELECT s.user_id, s.rn,
                           COUNT(*) AS n_up,
                           CAST(SUM(CAST(r.value AS DECIMAL(25,6))) AS DOUBLE) AS sum_up,
                           MAX(r.value) AS peak
                    FROM sel s JOIN r ON r.user_id = s.user_id AND r.rn BETWEEN s.m + 1 AND s.e
                    GROUP BY s.user_id, s.rn),
             da AS (SELECT s.user_id, s.rn,
                           CAST(SUM(CAST(r.value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(r.value) AS avg_down
                    FROM sel s JOIN r ON r.user_id = s.user_id AND r.rn BETWEEN s.rn + 1 AND s.m
                    GROUP BY s.user_id, s.rn)
        SELECT sel.user_id, start_ts AS match_start_ts, start_tie,
               ua.n_up, ua.sum_up, ua.peak, da.avg_down
        FROM sel
        JOIN ua ON ua.user_id = sel.user_id AND ua.rn = sel.rn
        JOIN da ON da.user_id = sel.user_id AND da.rn = sel.rn""",
    "q164_match_ticker_runs": """
        SELECT sel.user_id, start_ts AS match_start_ts, re.ts AS match_end_ts, start_tie,
               rm.value AS bottom_value, re.value AS top_value
        FROM sel
        JOIN r rm ON rm.user_id = sel.user_id AND rm.rn = sel.m
        JOIN r re ON re.user_id = sel.user_id AND re.rn = sel.e""",
    "q165_match_all_rows": """
        SELECT s.user_id, r.ts, r.event_id, r.value,
               CASE WHEN r.rn = s.rn THEN 'S' WHEN r.rn <= s.m THEN 'D' ELSE 'U' END AS cls,
               re.value AS final_top
        FROM sel s
        JOIN r ON r.user_id = s.user_id AND r.rn BETWEEN s.rn AND s.e
        JOIN r re ON re.user_id = s.user_id AND re.rn = s.e""",
    # r11: SUBSET M = (D, U) rides the same ticker sel — M's span is rn+1..e
    "q177_match_subset": """
        WITH ma AS (SELECT s.user_id, s.rn,
                           COUNT(*) AS move_rows,
                           CAST(SUM(CAST(r.value AS DECIMAL(25,6))) AS DOUBLE) AS move_sum,
                           MIN(r.value) AS move_min
                    FROM sel s JOIN r ON r.user_id = s.user_id AND r.rn BETWEEN s.rn + 1 AND s.e
                    GROUP BY s.user_id, s.rn)
        SELECT sel.user_id, start_ts AS match_start_ts, start_tie,
               rf.ts AS move_start_ts, re.ts AS move_end_ts,
               ma.move_rows, ma.move_sum, ma.move_min
        FROM sel
        JOIN r rf ON rf.user_id = sel.user_id AND rf.rn = sel.rn + 1
        JOIN r re ON re.user_id = sel.user_id AND re.rn = sel.e
        JOIN ma ON ma.user_id = sel.user_id AND ma.rn = sel.rn""",
    # r11: exclusion {- D+ -} rides the ticker sel too — q165 minus D rows.
    # UNION ALL of an equi-join (the S row) and ONE range join (the U rows):
    # the OR-combined ON clause plans as an inequality join in DuckDB and
    # never finishes at the decade (the q172 oracle lesson, again)
    "q178_match_exclusion": """
        SELECT s.user_id, r.ts, r.event_id, r.value, 'S' AS cls,
               s.m - s.rn AS n_down, re.value AS final_top
        FROM sel s
        JOIN r ON r.user_id = s.user_id AND r.rn = s.rn
        JOIN r re ON re.user_id = s.user_id AND re.rn = s.e
        UNION ALL
        SELECT s.user_id, r.ts, r.event_id, r.value, 'U' AS cls,
               s.m - s.rn AS n_down, re.value AS final_top
        FROM sel s
        JOIN r ON r.user_id = s.user_id AND r.rn BETWEEN s.m + 1 AND s.e
        JOIN r re ON re.user_id = s.user_id AND re.rn = s.e""",
}

CANON = {"TINYINT": "BIGINT", "SMALLINT": "BIGINT", "INTEGER": "BIGINT",
         "BIGINT": "BIGINT", "FLOAT": "DOUBLE", "DOUBLE": "DOUBLE",
         "BOOLEAN": "BOOLEAN", "DATE": "DATE"}

def canon_type(t):
    t = t.upper()
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    return CANON.get(t, "VARCHAR")

def fingerprint(rel, cols_types):
    exprs = ", ".join(f'CAST("{c}" AS {t})' for c, t in cols_types)
    return con.execute(f"SELECT count(*), sum(CAST(hash({exprs}) AS HUGEINT)) "
                       f"FROM ({rel})").fetchone()

MODE_FINALS = {"tolast": FINALS_TOLAST, "xvar": FINALS_XVAR, "cls1": FINALS_CLS1,
               "subdef": FINALS_SUBDEF,
               "selffirst": FINALS_SELFFIRST, "lazy": FINALS_LAZY,
               "nav": FINALS_NAV, "running": FINALS_RUNNING,
               "runningagg": FINALS_RUNNINGAGG}
fails = []
skipped = 0
for name, final in MODE_FINALS.get(mode, FINALS).items():
    if not os.path.isdir(f"{outdir}/{name}"):
        print(f"SKIP     {name}: no dump in {outdir} (partial-decade run)", flush=True)
        skipped += 1
        continue
    spark_rel = f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
    schema = con.execute(f"DESCRIBE {spark_rel}").fetchall()
    cols_types = sorted((row[0], canon_type(row[1])) for row in schema)
    t1 = time.time()
    gn, gh = fingerprint(spark_rel, cols_types)
    wn, wh = fingerprint(final, cols_types)
    if (gn, gh) == (wn, wh):
        print(f"OK       {name} ({gn} rows, hash-sum match, {time.time()-t1:.0f}s)", flush=True)
    else:
        print(f"FAIL     {name}: spark=({gn},{gh}) duckdb=({wn},{wh})", flush=True)
        fails.append(name)
checked = len(MODE_FINALS.get(mode, FINALS)) - skipped
print(f"\n{checked - len(fails)}/{checked} queries match" +
      (f" ({skipped} skipped, no dump)" if skipped else ""))
sys.exit(1 if fails else 0)
