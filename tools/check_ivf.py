#!/usr/bin/env python3
"""Value gate for q36_ivf_ann (r16 — previously in the DECLINED
distributed-float-avg class): an INDEPENDENT pure-Python transcription of the
full IVF chain (graft.vector.IvfIndex, q36's exact parameters nLists=8
iterations=2 / queries vec_id<15 k=3 nProbes=4) fingerprinted against the
engine dump.

What unlocked the gate (IvfIndex.scala r16): the Lloyd step's centroid mean
is no longer a distributed float avg (partition-layout-dependent summation
order — the r15 documented-why) but an EXACT DECIMAL(38,12) sum with one
double division, which is commutative, so the whole build is a pure function
of the corpus values:

  - init: ORDER BY xxhash64(CAST(embedding AS STRING)) LIMIT 8 with
    row_number list ids — the cast renders via Java Float.toString
    (transcribed + unit-tested in check_pq.py, copied here); signed-long
    hash order;
  - assign (per Lloyd pass + final): broadcast centroids ASC by list_id,
    guarded cosine (norms and dots are STRICTLY-SEQUENTIAL double sums of
    exact float32 widenings, via np.cumsum — a plain .sum() is an
    8-accumulator unrolled loop that drifts in the last ulp; see
    seqsum_rows), zero-norm product guard -> -1.0, first-max tie (lowest
    list_id);
  - Lloyd mean: per (list, dim), each float32 member casts
    float->double->Decimal(Double.toString)->HALF_UP scale 12 (the engine's
    cast-to-DECIMAL(38,12) path; python Decimal(repr(float(x))) is the same
    value), exact integer-unit sum, ONE double division by the count,
    cast to float32;
  - probes: per query, centroid sims sorted by (-sim, list_id), first 4;
  - search: candidates from probed lists, self excluded, exact
    CosineSimilarity (sequential double), top-3 by (nan-last, -sim, nid)
    (TopKAgg's deterministic ordering), rank 1-based.

Self-validation discipline: run at sf0.01 (500 vectors — exercises every
stage including the hash-ordered init) BEFORE trusting sf10 (200k vectors).

Usage: python3 tools/check_ivf.py <sfDir> <verifyOutDir>
(expects a Verify dump for q36_ivf_ann)
"""
import math
import sys
import time
from decimal import Decimal, ROUND_HALF_UP

import duckdb
import numpy as np

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

N_LISTS, ITERS, N_QUERIES, K, N_PROBES = 8, 2, 15, 3, 4


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        while i + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * P2) & M64, 31) * P1) & M64
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little") * P2) & M64, 31) * P1) & M64
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little") * P2) & M64, 31) * P1) & M64
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little") * P2) & M64, 31) * P1) & M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M64, 31) * P1) & M64
            h = (h * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i:i + 8], "little") * P2) & M64, 31) * P1) & M64
        h = ((_rotl(h ^ k, 27) * P1) + P4) & M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M64
        h = ((_rotl(h, 23) * P2) + P3) & M64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        i += 1
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def signed64(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def java_float_str(x):
    """java.lang.Float.toString (transcription unit-tested in check_pq.py;
    copied with its self-test so a drift fails HERE, not at sf10)."""
    f = np.float32(x)
    if np.isnan(f):
        return "NaN"
    if np.isinf(f):
        return "-Infinity" if f < 0 else "Infinity"
    if f == 0:
        return "-0.0" if np.signbit(f) else "0.0"
    sci = np.format_float_scientific(f, unique=True, trim="-")
    neg = sci.startswith("-")
    if neg:
        sci = sci[1:]
    mant, _, ex = sci.partition("e")
    e10 = int(ex)
    digits = mant.replace(".", "")
    digits = digits.rstrip("0") or "0"
    sign = "-" if neg else ""
    dec_exp = e10 + 1
    if -3 < dec_exp <= 7:
        if dec_exp <= 0:
            return f"{sign}0.{'0' * (-dec_exp)}{digits}"
        if dec_exp >= len(digits):
            return f"{sign}{digits}{'0' * (dec_exp - len(digits))}.0"
        return f"{sign}{digits[:dec_exp]}.{digits[dec_exp:]}"
    frac = digits[1:] if len(digits) > 1 else "0"
    return f"{sign}{digits[0]}.{frac}E{dec_exp - 1}"


_FMT_CASES = [(0.1, "0.1"), (1.0, "1.0"), (-2.5, "-2.5"), (0.001, "0.001"),
              (0.0001, "1.0E-4"), (12345678.0, "1.2345678E7"),
              (9999999.0, "9999999.0"), (100.0, "100.0"),
              (1e7, "1.0E7"), (-3.25e-8, "-3.25E-8"), (0.5, "0.5")]
for v, want in _FMT_CASES:
    got = java_float_str(v)
    assert got == want, f"java_float_str({v}) = {got}, want {want}"


def java_array_str(vec):
    """Spark cast(ARRAY<FLOAT> AS STRING): '[a, b, c]' with ', ' separators."""
    return "[" + ", ".join(java_float_str(x) for x in vec) + "]"


QUANT = Decimal("1e-12")


def dec12_units(x) -> int:
    """cast(FLOAT AS DECIMAL(38,12)) as integer 1e-12 units: Spark widens the
    float to double and goes Decimal(BigDecimal(Double.toString(d))) then
    changePrecision HALF_UP — python's repr(float) is the same shortest
    round-trip value."""
    d = Decimal(repr(float(x))).quantize(QUANT, ROUND_HALF_UP)
    return int(d.scaleb(12))


assert dec12_units(np.float32(0.1)) == 100000001490  # 0.10000000149011612
assert dec12_units(np.float32(-2.5)) == -2500000000000
assert dec12_units(np.float32(1.25e-13)) == 0  # 0.000000000000125 -> 0.000
assert dec12_units(np.float32(6.25e-13)) == 1  # rounds HALF_UP at scale 12


def seqsum_rows(prod):
    """Strictly-sequential per-row double sum: np.cumsum along the last axis
    IS left-to-right accumulation. A plain .sum(axis=1) is NOT — numpy's
    8-accumulator unrolled loop drifts from the engine's sequential loop in
    the last ulp on most 64-dim inputs (measured in check_semdedup.py:
    1592/2000 random vectors differ). q36's gate compares ranks only, which
    tolerated the drift at both scales, but exactness costs nothing
    (r16 review hardening)."""
    return np.cumsum(prod, axis=1)[:, -1]


def guarded_cosine_sims(mat64, norms, cent64, cnorm):
    """IvfIndex.guardedCosine for ONE centroid against all rows: sequential
    double dot over 64 dims; zero norm-PRODUCT guards to -1.0."""
    denom = norms * cnorm
    with np.errstate(divide="ignore", invalid="ignore"):
        sims = seqsum_rows(mat64 * cent64[None, :]) / denom
    sims[denom == 0.0] = -1.0
    return sims


def assign_all(mat64, norms, centroids):
    """IvfIndex.assign: best sim wins, FIRST max in ascending-list_id scan
    order (strict > replacement)."""
    best_sim = np.full(mat64.shape[0], -np.inf)
    best_id = np.full(mat64.shape[0], -1, dtype=np.int64)
    for lid, c32 in centroids:
        c64 = c32.astype(np.float64)
        cn = math.sqrt(float(np.cumsum(c64 * c64)[-1]))
        sims = guarded_cosine_sims(mat64, norms, c64, cn)
        upd = sims > best_sim
        best_sim[upd] = sims[upd]
        best_id[upd] = lid
    return best_id


def lloyd_mean(mat32, members):
    """Order-independent centroid: per-dim exact DECIMAL(38,12) integer-unit
    sum, ONE double division by the count, cast to float32."""
    dim = mat32.shape[1]
    n = len(members)
    out = np.empty(dim, dtype=np.float32)
    for d in range(dim):
        s = 0
        col = mat32[members, d]
        for x in col:
            s += dec12_units(x)
        # sum DECIMAL -> cast double -> / count (double division)
        out[d] = np.float32(float(Decimal(s).scaleb(-12)) / n)
    return out


def build_and_search(sfdir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sfdir}/embeddings.parquet') "
        f"ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat32 = np.array([r[1] for r in rows], dtype=np.float32)
    mat64 = mat32.astype(np.float64)
    norms = np.sqrt(seqsum_rows(mat64 * mat64))

    # init: ORDER BY signed xxhash64(render) LIMIT 8, list_id in hash order.
    # Hash ties happen only between IDENTICAL renders (= identical vectors,
    # xxh64 collisions aside), so the arbitrary tie order cannot change any
    # centroid VALUE — stable sort is as good as the engine's.
    t0 = time.time()
    hs = [signed64(xxh64(java_array_str(v).encode("utf-8"))) for v in mat32]
    order = sorted(range(len(rows)), key=lambda i: hs[i])[:N_LISTS]
    centroids = [(lid, mat32[i].copy()) for lid, i in enumerate(order)]
    print(f"[ivf] init sample done in {time.time() - t0:.1f}s")

    for it in range(ITERS):
        t0 = time.time()
        assigned = assign_all(mat64, norms, centroids)
        new_centroids = []
        for lid, _ in centroids:
            members = np.nonzero(assigned == lid)[0]
            if len(members) == 0:
                continue  # drained list: no rows -> no centroid row
            new_centroids.append((lid, lloyd_mean(mat32, members)))
        centroids = new_centroids
        print(f"[ivf] lloyd pass {it + 1} done in {time.time() - t0:.1f}s "
              f"({len(centroids)} lists)")

    final_assign = assign_all(mat64, norms, centroids)

    # search: queries vec_id < 15 in corpus order
    out = []
    by_list = {lid: np.nonzero(final_assign == lid)[0] for lid, _ in centroids}
    for qpos in np.nonzero(ids < N_QUERIES)[0]:
        qid = int(ids[qpos])
        qv = mat64[qpos]
        qn = norms[qpos]
        # probeLists: per-centroid guarded cosine, sortBy (-sim, list_id)
        cs = []
        for lid, c32 in centroids:
            c64 = c32.astype(np.float64)
            cn = math.sqrt(float(np.cumsum(c64 * c64)[-1]))
            denom = qn * cn
            if denom == 0.0:
                sim = -1.0
            else:
                sim = float(np.cumsum(qv * c64)[-1] / denom)
            cs.append((sim, lid))
        cs.sort(key=lambda s: (-s[0], s[1]))
        probed = [lid for _, lid in cs[:N_PROBES]]
        # candidates: probed lists' members, self excluded; exact
        # CosineSimilarity (NO zero guard — dot/(sqrt*sqrt))
        cand = []
        for lid in probed:
            for i in by_list.get(lid, ()):
                nid = int(ids[i])
                if nid == qid:
                    continue
                with np.errstate(divide="ignore", invalid="ignore"):
                    sim = float(np.cumsum(qv * mat64[i])[-1] / (qn * norms[i]))
                cand.append((sim, nid))
        # TopKAgg ordering: score DESC, id ASC, NaN last (java Double
        # ordering treats NaN as the largest, so -score puts it last)
        cand.sort(key=lambda s: (math.isnan(s[0]),
                                 -s[0] if not math.isnan(s[0]) else 0.0, s[1]))
        for rank, (sim, nid) in enumerate(cand[:K], start=1):
            out.append((qid, rank, nid))
    return sorted(out)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    py = build_and_search(sfdir)
    con = duckdb.connect()
    eng = con.execute(
        f"SELECT qid, rank, nid FROM read_parquet('{outdir}/q36_ivf_ann/*.parquet') "
        f"ORDER BY qid, rank, nid").fetchall()
    eng = [(int(a), int(b), int(c)) for a, b, c in eng]
    ok = py == eng
    print(f"[q36_ivf_ann] python rows={len(py)} engine rows={len(eng)} -> "
          f"{'PASS' if ok else 'FAIL'}")
    if not ok:
        diff = [(p, e) for p, e in zip(py, eng) if p != e][:10]
        print("  first diffs:", diff)
        print("  py-only:", [r for r in py if r not in set(eng)][:10])
        print("  eng-only:", [r for r in eng if r not in set(py)][:10])
        sys.exit(1)


if __name__ == "__main__":
    main()
