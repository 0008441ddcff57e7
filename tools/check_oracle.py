#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify's parquet dumps,
run each oracle SQL in DuckDB over the same source tables, compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"MISSING  {name} (no spark output)")
        fails.append(name)
        continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ERROR    {name}: {e}")
        fails.append(name)
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"SCHEMA   {name}: spark={list(got.columns)} duckdb={list(want.columns)}")
        fails.append(name)
        continue
    if len(got) != len(want):
        print(f"ROWS     {name}: spark={len(got)} duckdb={len(want)}")
        fails.append(name)
        continue
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    # stringify to compare like a value-hash would (dtype-tolerant for ints)
    import pandas as pd
    def canon(df):
        out = pd.DataFrame()
        for c in df.columns:
            s = df[c]
            if s.dtype.kind in "iu":
                out[c] = s.astype("int64").astype(str)
            elif s.dtype.kind == "f":
                out[c] = s.map(lambda x: repr(float(x)))
            elif s.dtype.kind == "M":
                out[c] = s.astype("datetime64[us]").astype(str)
            else:
                out[c] = s.astype(str)
        return out
    cg, cw = canon(gs), canon(ws)
    if not cg.equals(cw):
        diff_cols = [c for c in cg.columns if not cg[c].equals(cw[c])]
        print(f"VALUES   {name}: diff cols={diff_cols}")
        for c in diff_cols[:2]:
            m = cg[c] != cw[c]
            print(f"  {c}: {int(m.sum())}/{len(cg)} differ; first: spark={cg[c][m].iloc[0]!r} duckdb={cw[c][m].iloc[0]!r}")
        fails.append(name)
        continue
    print(f"OK       {name} ({len(got)} rows)")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
