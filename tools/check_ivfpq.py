#!/usr/bin/env python3
"""Value gate for q125_ivfpq_ann (r16 — previously in the DECLINED
distributed-float-avg class): an INDEPENDENT pure-Python transcription of the
composed IVF-PQ chain (graft.vector.IvfPq, q125's exact parameters nLists=8
m=8 ks=64 iterations=2 pqIterations=4 pqSampleSize=8192 / queries vec_id<20
k=3 nProbes=3 rerankFactor=4) fingerprinted against the engine dump.

What unlocked the gate: the r16 order-independent IVF Lloyd step
(IvfIndex.scala — exact DECIMAL(38,12) sums, one double division), proven
for q36 by tools/check_ivf.py, whose transcription this file REUSES (import)
for the coarse structure. The PQ half was already engine-local: codebooks
train driver-sequentially on a hash-ordered sample and every per-row stage
is row-local — transcribed and proven by tools/check_pq.py (q75), reused
here with q125's ks=64/iterations=4.

The composition (IvfPq.search):
  - coarse: IVF build (init sample -> 2 Lloyd passes -> final assignment)
    exactly as check_ivf;
  - codebook: PQ train on the xxhash64-ordered (cast-to-string render)
    sample of the WHOLE corpus, l2-normalized, first-k-distinct init, Lloyd
    with float64 sums in sample order — exactly as check_pq but ks=64,
    pqIterations=4;
  - encode: per corpus row, l2normalize -> nearest sub-centroid per
    subspace (squared L2, FLOAT32 diff/square accumulated in double, ties
    -> lowest code);
  - probes: per query, top-nProbes(3) centroid lists by (-guardedCosine,
    list_id);
  - ADC: per-query lookup table = float32(seq-double sum of FLOAT32
    products of the l2-normalized query x sub-centroid); candidate score =
    double sum of m table floats over the probed lists' codes, self
    excluded; shortlist = top-(k*rerankFactor)=12 by (-score, nid)
    (TopKAgg's deterministic ordering);
  - rerank: exact CosineSimilarity (sequential double products) of the
    ORIGINAL vectors for shortlist ids, final top-3 by (nan-last, -sim,
    nid), rank 1-based. Output (qid, rank, nid, sim DOUBLE) fingerprinted.

Self-validation discipline: run at sf0.01 (500 vectors — the sample bound
does not bind, but the hash ORDER still drives kmeans init and accumulation
order, so every transcription is exercised) BEFORE trusting sf10 (200k).

Usage: python3 tools/check_ivfpq.py <sfDir> <verifyOutDir>
(expects a Verify dump for q125_ivfpq_ann)
"""
import math
import os
import sys
import time

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_ivf  # noqa: E402  (xxh64, java_array_str, assign/lloyd, signed64)
import check_pq   # noqa: E402  (l2normalize, sub_dists, kmeans)

N_LISTS, IVF_ITERS = 8, 2
M_SUB, KS, PQ_ITERS, PQ_SAMPLE = 8, 64, 4, 8192
N_QUERIES, K, N_PROBES, RERANK = 20, 3, 3, 4


def build_ivf(mat32, mat64, norms, uhashes):
    """check_ivf's coarse build at q125's parameters: returns (centroids
    [(lid, float32 vec)], final assignment array)."""
    hs = [check_ivf.signed64(u) for u in uhashes]
    order = sorted(range(len(mat32)), key=lambda i: hs[i])[:N_LISTS]
    centroids = [(lid, mat32[i].copy()) for lid, i in enumerate(order)]
    for it in range(IVF_ITERS):
        t0 = time.time()
        assigned = check_ivf.assign_all(mat64, norms, centroids)
        new_centroids = []
        for lid, _ in centroids:
            members = np.nonzero(assigned == lid)[0]
            if len(members) == 0:
                continue
            new_centroids.append((lid, check_ivf.lloyd_mean(mat32, members)))
        centroids = new_centroids
        print(f"[ivfpq] lloyd pass {it + 1} done in {time.time() - t0:.1f}s "
              f"({len(centroids)} lists)", flush=True)
    return centroids, check_ivf.assign_all(mat64, norms, centroids)


def train_codebook(vecs, uhashes):
    """check_pq's train at q125's parameters (m=8, ks=64, iterations=4,
    sample 8192 in xxhash64-of-render order)."""
    n, dim = vecs.shape
    sub_dim = dim // M_SUB
    keys = np.array(uhashes, dtype=np.uint64)
    sample_idx = np.argsort(keys.view(np.int64), kind="stable")[:min(n, PQ_SAMPLE)]
    sample = np.array([check_pq.l2normalize(vecs[i]) for i in sample_idx],
                      dtype=np.float32)
    cents = [check_pq.kmeans(
        np.ascontiguousarray(sample[:, j * sub_dim:(j + 1) * sub_dim]),
        min(KS, len(sample)), PQ_ITERS) for j in range(M_SUB)]
    return cents, sub_dim


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    t0 = time.time()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sfdir}/embeddings.parquet') "
        f"ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat32 = np.array([r[1] for r in rows], dtype=np.float32)
    mat64 = mat32.astype(np.float64)
    norms = np.sqrt(check_ivf.seqsum_rows(mat64 * mat64))  # sequential (cumsum)
    n, dim = mat32.shape
    print(f"corpus {n} x {dim}", flush=True)

    # one render+hash pass serves BOTH the IVF init order and the PQ sample
    # order (identical xxhash64 of the cast-to-string render). Clone-heavy
    # corpora memoize per distinct vector.
    hmemo = {}
    uhashes = []
    for v in mat32:
        vk = v.tobytes()
        if vk not in hmemo:
            hmemo[vk] = check_ivf.xxh64(check_ivf.java_array_str(v).encode("utf-8"))
        uhashes.append(hmemo[vk])
    print(f"[ivfpq] {len(hmemo)} distinct renders hashed ({time.time() - t0:.0f}s)",
          flush=True)

    centroids, final_assign = build_ivf(mat32, mat64, norms, uhashes)
    print(f"[ivfpq] coarse built ({time.time() - t0:.0f}s)", flush=True)

    cents, sub_dim = train_codebook(mat32, uhashes)
    print(f"[ivfpq] codebooks trained ({time.time() - t0:.0f}s)", flush=True)

    # encode the whole corpus (l2normalize then nearest sub-centroid)
    normed = np.array([check_pq.l2normalize(v) for v in mat32], dtype=np.float32)
    codes = np.empty((n, M_SUB), dtype=np.int64)
    for j in range(M_SUB):
        codes[:, j] = check_pq.sub_dists(
            np.ascontiguousarray(normed[:, j * sub_dim:(j + 1) * sub_dim]),
            cents[j]).argmin(axis=1)
    print(f"[ivfpq] encoded ({time.time() - t0:.0f}s)", flush=True)

    by_list = {lid: np.nonzero(final_assign == lid)[0] for lid, _ in centroids}
    pos_by_id = {int(ids[i]): i for i in range(n)}
    out = []
    for qpos in np.nonzero(ids < N_QUERIES)[0]:
        qid = int(ids[qpos])
        qv64 = mat64[qpos]
        qn = norms[qpos]
        # probeLists: per-centroid guarded cosine, sortBy (-sim, list_id)
        cs = []
        for lid, c32 in centroids:
            c64 = c32.astype(np.float64)
            cn = math.sqrt(float(np.cumsum(c64 * c64)[-1]))
            denom = qn * cn
            sim = -1.0 if denom == 0.0 else float(np.cumsum(qv64 * c64)[-1] / denom)
            cs.append((sim, lid))
        cs.sort(key=lambda s: (-s[0], s[1]))
        probed = [lid for _, lid in cs[:N_PROBES]]
        # ADC lookup table over the l2-normalized query: float32(seq-double
        # sum of FLOAT32 products) per (subspace, code)
        nq = check_pq.l2normalize(mat32[qpos])
        table = [np.empty(len(cents[j]), dtype=np.float32) for j in range(M_SUB)]
        for j in range(M_SUB):
            cj = cents[j]
            for c in range(len(cj)):
                d = 0.0
                for i in range(sub_dim):
                    d += float(np.float32(nq[j * sub_dim + i] * cj[c][i]))
                table[j][c] = np.float32(d)
        # candidates: probed lists' members, self excluded; score = double
        # sum of m float32 table entries
        cand = []
        for lid in probed:
            for i in by_list.get(lid, ()):
                nid = int(ids[i])
                if nid == qid:
                    continue
                s = 0.0
                for j in range(M_SUB):
                    s += float(table[j][codes[i, j]])
                cand.append((s, nid))
        cand.sort(key=lambda s: (math.isnan(s[0]),
                                 -s[0] if not math.isnan(s[0]) else 0.0, s[1]))
        short = cand[:K * RERANK]
        # exact rerank: CosineSimilarity's sequential DOUBLE-product loop
        # over the ORIGINAL vectors
        rer = []
        for _, nid in short:
            v = mat32[pos_by_id[nid]]
            dot = na = nb = 0.0
            for i in range(dim):
                xi = float(mat32[qpos][i]); yi = float(v[i])
                dot += xi * yi; na += xi * xi; nb += yi * yi
            rer.append((dot / (np.sqrt(na) * np.sqrt(nb)), nid))
        rer.sort(key=lambda s: (math.isnan(s[0]),
                                -s[0] if not math.isnan(s[0]) else 0.0, s[1]))
        for rank, (sim, nid) in enumerate(rer[:K], start=1):
            out.append((qid, rank, nid, float(sim)))
    print(f"[ivfpq] {len(out)} result rows ({time.time() - t0:.0f}s)", flush=True)

    con.execute("CREATE TABLE py_ivfpq(qid BIGINT, rank BIGINT, nid BIGINT, sim DOUBLE)")
    con.executemany("INSERT INTO py_ivfpq VALUES (?, ?, ?, ?)", out)
    fp = ("SELECT COUNT(*), COALESCE(SUM(CAST(hash(concat_ws(chr(1), "
          "CAST(qid AS BIGINT), CAST(rank AS BIGINT), CAST(nid AS BIGINT), "
          "CAST(sim AS DOUBLE))) AS HUGEINT)), 0) FROM {}")
    py_n, py_h = con.execute(fp.format("py_ivfpq")).fetchone()
    eng_n, eng_h = con.execute(fp.format(
        f"read_parquet('{outdir}/q125_ivfpq_ann/*.parquet')")).fetchone()
    ok = (py_n, py_h) == (eng_n, eng_h)
    print(f"[q125_ivfpq_ann] python rows={py_n} engine rows={eng_n} "
          f"hash_match={py_h == eng_h} ({time.time() - t0:.0f}s total)")
    if not ok:
        eng = con.execute(
            f"SELECT qid, rank, nid, sim FROM "
            f"read_parquet('{outdir}/q125_ivfpq_ann/*.parquet') "
            f"ORDER BY qid, rank").fetchall()
        pys = sorted(out)
        print("  first diffs:", [(p, e) for p, e in zip(pys, sorted(eng)) if p != e][:6])
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
