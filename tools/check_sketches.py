#!/usr/bin/env python3
"""Bounds gate for q70_approx_sketches (r16) — the one remaining no_oracle
entry with no independent recomputation. A fingerprint gate is IMPOSSIBLE by
construction (the documented-why stands: HLL++ bias tables and GK merge
order are Spark internals — transcribing them verifies Spark against
itself), but the SKETCH CONTRACTS are engine-independent and CAN be checked
externally at scale, which this does:

  - approx_count_distinct (HLL++, default rsd 0.05): the estimate must lie
    within 3·rsd = 15% of the EXACT distinct count (DuckDB COUNT(DISTINCT)
    over the same parquet) — the SketchSpec bound, now checked by an
    independent engine at sf10 instead of only on the unit fixture;
  - percentile_approx(0.5, accuracy=10000) (Greenwald-Khanna, nominal rank
    error eps = 1/accuracy): the reported value must BE an element of the
    group's multiset (GK reports real elements, not interpolations), and
    its rank window must intersect [(0.5-2eps)N, (0.5+2eps)N]. The bound is
    2*eps, not eps: Spark's distributed percentile MERGES per-partition
    QuantileSummaries, and merging eps-approximate GK summaries degrades
    the guarantee up to 2*eps (observed empirically too: at sf0.01 one
    group's reported median sits exactly 2.0 ranks from the target where
    eps*N = 1.99 — outside the single-summary bound, inside the merge
    bound).

This is deliberately a BOUNDS gate, not a value gate — recorded as such in
BASELINE's no_oracle audit; q70 stays the documented decline for
fingerprinting.

Usage: python3 tools/check_sketches.py <sfDir> <verifyOutDir>
(expects a Verify dump for q70_approx_sketches)
"""
import math
import os
import sys

import duckdb

RSD, RSD_MULT = 0.05, 3.0
EPS = 2.0 / 10000.0  # 2x the nominal 1/accuracy: the GK merge degradation


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    eng = con.execute(
        f"SELECT l_returnflag, approx_orders, approx_parts, median_price_approx "
        f"FROM read_parquet('{outdir}/q70_approx_sketches/*.parquet') "
        f"ORDER BY l_returnflag").fetchall()
    exact = dict((r[0], r[1:]) for r in con.execute(f"""
        SELECT l_returnflag, COUNT(DISTINCT l_orderkey), COUNT(DISTINCT l_partkey),
               COUNT(*)
        FROM read_parquet('{sfdir}/lineitem.parquet') GROUP BY 1""").fetchall())
    assert sorted(exact) == sorted(r[0] for r in eng), \
        f"group mismatch: {sorted(exact)} vs {sorted(r[0] for r in eng)}"
    ok = True
    for flag, ao, ap, med in eng:
        xo, xp, n = exact[flag]
        for name, approx, ex in (("orders", ao, xo), ("parts", ap, xp)):
            rel = abs(approx - ex) / ex
            good = rel <= RSD * RSD_MULT
            ok &= good
            print(f"[q70] {flag} {name}: approx={approx} exact={ex} "
                  f"rel={rel:.4f} (bound {RSD * RSD_MULT:.2f}) "
                  f"{'OK' if good else 'VIOLATION'}")
        is_elem, le, lt = con.execute(f"""
            SELECT MAX(CASE WHEN l_extendedprice = ? THEN 1 ELSE 0 END),
                   SUM(CASE WHEN l_extendedprice <= ? THEN 1 ELSE 0 END),
                   SUM(CASE WHEN l_extendedprice <  ? THEN 1 ELSE 0 END)
            FROM read_parquet('{sfdir}/lineitem.parquet')
            WHERE l_returnflag = ?""", [med, med, med, flag]).fetchone()
        lo = math.ceil((0.5 - EPS) * n)
        hi = math.ceil((0.5 + EPS) * n)
        # v's possible ranks are [lt+1, le]; intersecting [lo, hi] needs
        # lt+1 <= hi (not lt <= hi — that off-by-one would admit a window
        # starting exactly one rank above the band)
        good = is_elem == 1 and le >= lo and lt + 1 <= hi
        ok &= good
        print(f"[q70] {flag} median: v={med} element={bool(is_elem)} "
              f"rank window [{lt + 1}, {le}] must intersect [{lo}, {hi}] "
              f"{'OK' if good else 'VIOLATION'}")
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
