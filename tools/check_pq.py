#!/usr/bin/env python3
"""Value gate for q75_pq_ann (r15 stretch — previously recall-spec-only): an
INDEPENDENT pure-Python transcription of the PQ chain
(graft.vector.PqIndex, q75's exact parameters m=8 ks=16 iterations=3
sampleSize=8192 k=3 rerankFactor=4) fingerprinted against the engine dump.

Unlike q125's IVF (declined — distributed float avg, no engine-independent
bit target), q75's ENTIRE training is driver-sequential and its per-row
stages are row-local, so every float op has a fixed order:
  - sample: ORDER BY xxhash64(CAST(vec AS STRING)) LIMIT 8192 — the cast
    renders each float via Java Float.toString (shortest float32 digits,
    plain decimal in [1e-3, 1e7), else d.dddE±e), elements joined ", "
    inside brackets; transcribed with a unit self-test below. When the
    corpus fits the sample bound (sf0.01: 500 rows), the sample is the
    whole corpus and the rendering never matters — that run self-validates
    everything else first (the memory-bank discipline);
  - l2normalize: sequential double norm, per-element double-div -> float32;
  - kmeans (per subspace): init = first k DISTINCT sub-vectors in sample
    order; assignment by squared L2 where the diff and square are FLOAT32
    ops accumulated in double (subDim=8 — numpy's sequential regime);
    means accumulate float64 in point order, divide, round to float32;
  - encode: row-local nearest sub-centroid per subspace (ties -> lowest
    code = numpy argmin's first-min);
  - ADC: lookup table = float32(seq-double sum of float32 products),
    candidate score = double sum of m table floats; top-12 by
    (-score, id) (TopKAgg's deterministic ordering), self-pairs excluded;
  - rerank: exact CosineSimilarity (sequential double products this time)
    over the full vectors of the 12 candidates, top-3, rank 1-based.

Usage: python3 tools/check_pq.py <sfDir> <verifyOutDir>
(expects a Verify dump for q75_pq_ann)
"""
import os
import sys
import time

import duckdb
import numpy as np

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

M_SUB, KS, ITERS, SAMPLE, K, RERANK = 8, 16, 3, 8192, 3, 4


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
        h ^= k
        h = (_rotl(h, 27) * P1 + P4) & M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
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


def java_float_str(x):
    """java.lang.Float.toString: shortest-unique float32 digits; plain
    decimal when 1e-3 <= |x| < 1e7, else d.dddE±e (no '+', no exponent
    padding); at least one fraction digit either way.
    """
    f = np.float32(x)
    if np.isnan(f):
        return "NaN"
    if np.isinf(f):
        return "-Infinity" if f < 0 else "Infinity"
    if f == 0:
        return "-0.0" if np.signbit(f) else "0.0"
    sci = np.format_float_scientific(f, unique=True, trim="-")
    # parse numpy's 'd[.ddd]e±EE' into (sign, digit string, decimal exp)
    neg = sci.startswith("-")
    if neg:
        sci = sci[1:]
    mant, _, ex = sci.partition("e")
    e10 = int(ex)
    digits = mant.replace(".", "")
    digits = digits.rstrip("0") or "0"
    sign = "-" if neg else ""
    # value = 0.digits * 10 ** dec_exp  (FloatingDecimal's convention)
    dec_exp = e10 + 1
    if -3 < dec_exp <= 7:
        if dec_exp <= 0:
            return f"{sign}0.{'0' * (-dec_exp)}{digits}"
        if dec_exp >= len(digits):
            return f"{sign}{digits}{'0' * (dec_exp - len(digits))}.0"
        return f"{sign}{digits[:dec_exp]}.{digits[dec_exp:]}"
    frac = digits[1:] if len(digits) > 1 else "0"
    return f"{sign}{digits[0]}.{frac}E{dec_exp - 1}"


# Java-known outputs (semantics of Float.toString) — a wrong transcription
# of the rendering must fail HERE, not as an opaque sf10 mismatch
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


def l2normalize(v):
    s = 0.0
    for x in v:
        s += float(x) * float(x)
    n = np.sqrt(s)
    if n == 0.0:
        return v.astype(np.float32)
    return np.array([np.float32(float(x) / n) for x in v], dtype=np.float32)


def sub_dists(subs, cents):
    """Squared L2 per (row, centroid): FLOAT32 diff and square, double sum
    over the subDim axis (len 8 — numpy's sequential-sum regime)."""
    t = subs[:, None, :] - cents[None, :, :]          # float32
    return (t * t).astype(np.float64).sum(axis=2)     # f32 square, f64 sum


def kmeans(points, k, iterations):
    """PqIndex.kmeans transcribed: first-k-distinct init, Lloyd steps with
    float64 sums in point order, float32 rounded means, empty keeps old."""
    seen = set()
    init = []
    for p in points:
        key = p.tobytes()
        if len(init) < k and key not in seen:
            seen.add(key)
            init.append(p)
    cents = np.array(init, dtype=np.float32)
    if len(cents) == 0:
        return points[:1].copy()
    for _ in range(iterations):
        d = sub_dists(points, cents)
        assign = d.argmin(axis=1)
        sums = np.zeros((len(cents), points.shape[1]), dtype=np.float64)
        counts = np.zeros(len(cents), dtype=np.int64)
        for idx in range(len(points)):       # point order — the Scala loop's
            c = assign[idx]                  # accumulation order exactly
            sums[c] += points[idx]
            counts[c] += 1
        new = cents.copy()
        for c in range(len(cents)):
            if counts[c] > 0:
                new[c] = (sums[c] / counts[c]).astype(np.float32)
        cents = new
    return cents


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    t0 = time.time()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sfdir}/embeddings.parquet') "
        f"ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    vecs = np.array([r[1] for r in rows], dtype=np.float32)
    n, dim = vecs.shape
    sub_dim = dim // M_SUB
    print(f"corpus {n} x {dim}", flush=True)

    # ---- sample (ORDER BY xxhash64(cast-to-string) LIMIT 8192). The ORDER
    # matters even when the limit doesn't bind: kmeans inits on the first k
    # DISTINCT sub-vectors in hash order and Lloyd accumulates means in
    # sample order — so every run (sf0.01 included) exercises the Java
    # Float.toString rendering transcription
    t1 = time.time()
    keys = np.array([xxh64(java_array_str(v).encode()) for v in vecs],
                    dtype=np.uint64)
    sample_idx = np.argsort(keys.view(np.int64), kind="stable")[:min(n, SAMPLE)]
    print(f"sample keys hashed ({time.time()-t1:.0f}s)", flush=True)
    sample = np.array([l2normalize(vecs[i]) for i in sample_idx], dtype=np.float32)

    # ---- train
    cents = [kmeans(np.ascontiguousarray(sample[:, j * sub_dim:(j + 1) * sub_dim]),
                    min(KS, len(sample)), ITERS) for j in range(M_SUB)]
    print(f"codebooks trained ({time.time()-t0:.0f}s)", flush=True)

    # ---- encode the whole corpus
    normed = np.array([l2normalize(v) for v in vecs], dtype=np.float32)
    codes = np.empty((n, M_SUB), dtype=np.int64)
    for j in range(M_SUB):
        codes[:, j] = sub_dists(
            np.ascontiguousarray(normed[:, j * sub_dim:(j + 1) * sub_dim]),
            cents[j]).argmin(axis=1)
    print(f"encoded ({time.time()-t0:.0f}s)", flush=True)

    # ---- queries: vec_id < 20, ADC top-12, exact rerank top-3
    out = []
    qsel = np.nonzero(ids < 20)[0]
    for qi in qsel:
        qid = int(ids[qi])
        nq = l2normalize(vecs[qi])
        # ADC lookup table: float32(seq-double sum of FLOAT32 products)
        table = np.empty((M_SUB, len(cents[0])), dtype=np.float32)
        for j in range(M_SUB):
            cj = cents[j]
            for c in range(len(cj)):
                d = 0.0
                for i in range(sub_dim):  # float32 product, double accumulate
                    d += float(np.float32(nq[j * sub_dim + i] * cj[c][i]))
                table[j, c] = np.float32(d)
        # candidate scores: double sum of m float32 lookups, self excluded
        sims = np.zeros(n, dtype=np.float64)
        for j in range(M_SUB):
            sims += table[j][codes[:, j]].astype(np.float64)
        cand = [(float(sims[i]), int(ids[i])) for i in range(n) if ids[i] != qid]
        cand.sort(key=lambda s: (-s[0], s[1]))
        short = cand[:K * RERANK]
        # exact rerank: CosineSimilarity's sequential DOUBLE-product loop
        pos_by_id = {int(ids[i]): i for i in range(n)}
        rer = []
        for _, nid in short:
            v = vecs[pos_by_id[nid]]
            dot = na = nb = 0.0
            for i in range(dim):
                xi = float(vecs[qi][i]); yi = float(v[i])
                dot += xi * yi; na += xi * xi; nb += yi * yi
            rer.append((dot / (np.sqrt(na) * np.sqrt(nb)), nid))
        rer.sort(key=lambda s: (-s[0], s[1]))
        for r, (sim, nid) in enumerate(rer[:K], start=1):
            out.append((qid, r, nid, float(sim)))
    print(f"{len(out)} result rows for {len(qsel)} queries ({time.time()-t0:.0f}s)",
          flush=True)

    con.execute("CREATE TABLE py_pq(qid BIGINT, rank BIGINT, nid BIGINT, sim DOUBLE)")
    con.executemany("INSERT INTO py_pq VALUES (?, ?, ?, ?)", out)
    fp = ("SELECT COUNT(*), COALESCE(SUM(CAST(hash(concat_ws(chr(1), "
          "CAST(qid AS BIGINT), CAST(rank AS BIGINT), CAST(nid AS BIGINT), "
          "CAST(sim AS DOUBLE))) AS HUGEINT)), 0) FROM {}")
    py_n, py_h = con.execute(fp.format("py_pq")).fetchone()
    eng_n, eng_h = con.execute(fp.format(
        f"read_parquet('{outdir}/q75_pq_ann/*.parquet')")).fetchone()
    ok = (py_n, py_h) == (eng_n, eng_h)
    print(f"python rows={py_n} engine rows={eng_n} hash_match={py_h == eng_h} "
          f"({time.time()-t0:.0f}s total)")
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
