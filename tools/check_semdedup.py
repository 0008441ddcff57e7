#!/usr/bin/env python3
"""Value gate for q131_semantic_dedup (r16 — previously in the DECLINED
distributed-float-avg class): an INDEPENDENT pure-Python transcription of the
SemDeDup chain (graft.llmops.Dedup.semanticDedup, q131's exact parameters
threshold=0.35 nClusters=16 iterations=2 maxClusterSize=10000) fingerprinted
against the engine dump.

What unlocked the gate: the r16 order-independent IVF Lloyd step
(IvfIndex.scala — semanticDedup reuses IvfIndex.build for its cluster
routing), proven for q36 by tools/check_ivf.py, whose transcription this
file imports for the k-means (init sample -> 2 Lloyd passes -> final
assignment at nLists=16).

Everything after routing is exact set/join algebra + row-local cosine:
  - collapseGroups on (nvec, list_id): identical vectors collapse under a
    min-id representative; groups larger than 10000 drop whole (cap
    modeled, not assumed absent);
  - capBuckets on list_id: clusters with more than 10000 DISTINCT vectors
    (reps) drop whole;
  - intra pairs: every member pair of a kept clone group, cosine
    RE-COMPUTED as CosineSimilarity(v, v) (sequential double: dot /
    (sqrt(na)*sqrt(nb)) — NOT assumed 1.0; sqrt(x)^2 != x at the last
    ulp), kept when >= 0.35 OR NaN (Spark orders NaN above every double,
    so a zero vector's NaN >= t holds — modeled identically);
  - cross pairs: rep x rep within a cluster (id_a < id_b), exact cosine,
    threshold'd the same way, then expanded to member pairs with
    least/greatest id ordering.
The expansion joins run in DuckDB (the check_lshembed precedent); the
fingerprint is the order-independent count + per-row hash sum over
(id_a, id_b, cosine DOUBLE).

Self-validation discipline: sf0.01 (500 vectors, 16 real clusters,
multi-member clone groups) BEFORE sf10 (200k rows / 2000 distinct vectors —
the 100x-clone corpus where the rep-counted cap discipline matters).

Usage: python3 tools/check_semdedup.py <sfDir> <verifyOutDir>
(expects a Verify dump for q131_semantic_dedup)
"""
import math
import os
import sys
import time

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_ivf  # noqa: E402  (xxh64, java_array_str, assign_all, lloyd_mean)

N_LISTS, ITERS, THRESHOLD, CAP = 16, 2, 0.35, 10000


def build_ivf(mat32, mat64, norms):
    """check_ivf's build at q131's parameters: returns the final
    assignment array (vector -> list_id)."""
    hmemo = {}  # clone-heavy corpora: one render+hash per distinct vector
    hs = []
    for v in mat32:
        vk = v.tobytes()
        if vk not in hmemo:
            hmemo[vk] = check_ivf.signed64(
                check_ivf.xxh64(check_ivf.java_array_str(v).encode("utf-8")))
        hs.append(hmemo[vk])
    order = sorted(range(len(mat32)), key=lambda i: hs[i])[:N_LISTS]
    centroids = [(lid, mat32[i].copy()) for lid, i in enumerate(order)]
    for it in range(ITERS):
        t0 = time.time()
        assigned = check_ivf.assign_all(mat64, norms, centroids)
        new_centroids = []
        for lid, _ in centroids:
            members = np.nonzero(assigned == lid)[0]
            if len(members) == 0:
                continue
            new_centroids.append((lid, check_ivf.lloyd_mean(mat32, members)))
        centroids = new_centroids
        print(f"[semdedup] lloyd pass {it + 1} done in {time.time() - t0:.1f}s "
              f"({len(centroids)} lists)", flush=True)
    return check_ivf.assign_all(mat64, norms, centroids)


def cosine(a64, b64):
    """CosineSimilarity: sequential double dot/norms, NO zero guard. The
    sums go through np.cumsum, which IS strictly left-to-right — a plain
    .sum() on 64 elements uses numpy's 8-accumulator unrolled loop and
    differs from the engine's sequential loop in the last ulp on most
    inputs (verified: 1592/2000 random 64-vectors differ), which this
    gate's value fingerprint would catch."""
    dot = float(np.cumsum(a64 * b64)[-1])
    na = float(np.cumsum(a64 * a64)[-1])
    nb = float(np.cumsum(b64 * b64)[-1])
    with np.errstate(divide="ignore", invalid="ignore"):
        return dot / (math.sqrt(na) * math.sqrt(nb))


def keep(c):
    """Spark `cosine >= 0.35`: NaN compares ABOVE every double."""
    return math.isnan(c) or c >= THRESHOLD


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
    norms = np.sqrt((mat64 * mat64).sum(axis=1))
    n = len(ids)
    print(f"corpus {n} vectors", flush=True)

    assigned = build_ivf(mat32, mat64, norms)

    # ---- collapseGroups on (nvec, list_id): identical rows share a group
    groups = {}  # (vec bytes, list_id) -> [row indices]
    for i in range(n):
        groups.setdefault((mat32[i].tobytes(), int(assigned[i])), []).append(i)
    # rep = min id; groups larger than CAP drop whole
    kept_groups = []
    dropped_groups = 0
    for (_, lid), members in groups.items():
        if len(members) > CAP:
            dropped_groups += 1
            continue
        gids = sorted(int(ids[i]) for i in members)
        kept_groups.append((lid, gids[0], gids, members[0]))  # (list, rep, ids, a row idx)
    # ---- capBuckets on list_id: lists with more than CAP reps drop whole
    per_list = {}
    for g in kept_groups:
        per_list.setdefault(g[0], []).append(g)
    kept, dropped_lists = [], 0
    for lid, gs in per_list.items():
        if len(gs) > CAP:
            dropped_lists += 1
            continue
        kept.extend(gs)
    print(f"[semdedup] {len(groups)} groups ({dropped_groups} group-capped), "
          f"{len(per_list)} lists ({dropped_lists} list-capped), "
          f"{len(kept)} kept reps ({time.time() - t0:.0f}s)", flush=True)

    # ---- per-rep self-cosine (intra pairs re-compute cosine(v, v))
    members_rows = []   # (nid, rep)
    intra_vals = []     # (rep, selfcos) for groups passing the threshold
    for lid, rep, gids, rowi in kept:
        for g in gids:
            members_rows.append((g, rep))
        if len(gids) > 1:
            c = cosine(mat64[rowi], mat64[rowi])
            if keep(c):
                intra_vals.append((rep, c))
    # ---- rep-pair cosines within each kept list
    rep_pairs = []
    by_list = {}
    for lid, rep, gids, rowi in kept:
        by_list.setdefault(lid, []).append((rep, rowi))
    for lid, reps in by_list.items():
        reps.sort()
        for i in range(len(reps)):
            for j in range(i + 1, len(reps)):
                ra, ia = reps[i]
                rb, ib = reps[j]
                c = cosine(mat64[ia], mat64[ib])
                if keep(c):
                    rep_pairs.append((ra, rb, c))
    print(f"[semdedup] {len(intra_vals)} intra groups, {len(rep_pairs)} rep pairs "
          f"({time.time() - t0:.0f}s)", flush=True)

    # ---- expansion + fingerprint in DuckDB
    con.execute("CREATE TABLE m(nid BIGINT, rep BIGINT)")
    if members_rows:
        con.executemany("INSERT INTO m VALUES (?, ?)", members_rows)
    con.execute("CREATE TABLE iv(rep BIGINT, c DOUBLE)")
    if intra_vals:
        con.executemany("INSERT INTO iv VALUES (?, ?)", intra_vals)
    con.execute("CREATE TABLE rp(ra BIGINT, rb BIGINT, c DOUBLE)")
    if rep_pairs:
        con.executemany("INSERT INTO rp VALUES (?, ?, ?)", rep_pairs)
    con.execute("""
        CREATE TABLE py_pairs AS
        SELECT least(ma.nid, mb.nid) AS id_a, greatest(ma.nid, mb.nid) AS id_b,
               rp.c AS cosine
        FROM rp JOIN m ma ON ma.rep = rp.ra JOIN m mb ON mb.rep = rp.rb
        UNION ALL
        SELECT x.nid AS id_a, y.nid AS id_b, iv.c AS cosine
        FROM m x JOIN m y ON x.rep = y.rep AND x.nid < y.nid
        JOIN iv ON iv.rep = x.rep""")
    fp = ("SELECT COUNT(*), COALESCE(SUM(CAST(hash(concat_ws(chr(1), "
          "CAST(id_a AS BIGINT), CAST(id_b AS BIGINT), "
          "CAST(cosine AS DOUBLE))) AS HUGEINT)), 0) FROM {}")
    py_n, py_h = con.execute(fp.format("py_pairs")).fetchone()
    eng_n, eng_h = con.execute(fp.format(
        f"read_parquet('{outdir}/q131_semantic_dedup/*.parquet')")).fetchone()
    ok = (py_n, py_h) == (eng_n, eng_h)
    print(f"[q131_semantic_dedup] python rows={py_n} engine rows={eng_n} "
          f"hash_match={py_h == eng_h} ({time.time() - t0:.0f}s total)")
    if not ok:
        print(con.execute(
            f"SELECT * FROM (SELECT id_a, id_b, cosine FROM py_pairs EXCEPT ALL "
            f"SELECT id_a, id_b, cosine FROM "
            f"read_parquet('{outdir}/q131_semantic_dedup/*.parquet')) LIMIT 5").fetchall())
        print(con.execute(
            f"SELECT * FROM (SELECT id_a, id_b, cosine FROM "
            f"read_parquet('{outdir}/q131_semantic_dedup/*.parquet') EXCEPT ALL "
            f"SELECT id_a, id_b, cosine FROM py_pairs) LIMIT 5").fetchall())
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
