#!/usr/bin/env python3
"""Engine-vs-engine dump comparison: given two Verify output dirs, reduce
each query's parquet directory to an order-independent fingerprint (row
count + HUGEINT sum of per-row hash() over type-canonicalized columns) in
DuckDB and compare. Exact — any value difference shifts the hash sum; no
pandas materialization (check_oracle_sf10's reduction, applied dump-to-dump).

Built for refactor A/Bs: when a change claims bit-identical output (e.g. the
r12 ordered-choice program walk vs the r11 branch loop), compare the two
binaries' dumps directly instead of re-running the (much slower) DuckDB
recursive-CTE oracles.

Usage: python3 tools/compare_dumps.py <dirA> <dirB> [only=qa,qb]
"""
import glob
import os
import sys

import duckdb

dira, dirb = sys.argv[1], sys.argv[2]
only = None
for a in sys.argv[3:]:
    if a.startswith("only="):
        only = set(a[5:].split(","))

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
con.execute("SET preserve_insertion_order=false")


def canon_cols(path):
    cols = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{path}/*.parquet')").fetchall()
    outs = []
    for name, typ, *_ in cols:
        t = typ.upper()
        if any(k in t for k in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT")):
            c = f'CAST("{name}" AS BIGINT)'
        elif any(k in t for k in ("FLOAT", "DOUBLE", "REAL")):
            c = f'CAST("{name}" AS DOUBLE)'
        elif "DECIMAL" in t:
            c = f'CAST("{name}" AS VARCHAR)'
        elif "TIMESTAMP" in t:
            c = f'CAST(CAST("{name}" AS TIMESTAMP) AS VARCHAR)'
        else:
            c = f'CAST("{name}" AS VARCHAR)'
        outs.append((name, c))
    return sorted(outs)


def fp(path):
    cols = canon_cols(path)
    expr = ", ".join(c for _, c in cols)
    n, h = con.execute(
        f"SELECT COUNT(*), COALESCE(SUM(CAST(hash(concat_ws(chr(1), {expr})) "
        f"AS HUGEINT)), 0) FROM read_parquet('{path}/*.parquet')").fetchone()
    return [c[0] for c in cols], n, h


names = sorted(os.path.basename(d) for d in glob.glob(f"{dira}/q*") if os.path.isdir(d))
fails = []
for name in names:
    if only and name not in only:
        continue
    if not os.path.isdir(f"{dirb}/{name}"):
        print(f"MISSING  {name} (absent from {dirb})")
        fails.append(name)
        continue
    ca, na, ha = fp(f"{dira}/{name}")
    cb, nb, hb = fp(f"{dirb}/{name}")
    if ca != cb:
        print(f"SCHEMA   {name}: {ca} vs {cb}")
        fails.append(name)
    elif na != nb:
        print(f"ROWS     {name}: {na} vs {nb}")
        fails.append(name)
    elif ha != hb:
        print(f"VALUES   {name}: hash-sum differs over {na} rows")
        fails.append(name)
    else:
        print(f"OK       {name} ({na} rows, hash-equal)")
print(f"\n{len([n for n in names if not only or n in only]) - len(fails)}"
      f"/{len([n for n in names if not only or n in only])} dumps match")
sys.exit(1 if fails else 0)
