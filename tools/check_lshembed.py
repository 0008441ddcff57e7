#!/usr/bin/env python3
"""Value gate for q59_embed_neardup_lsh (r14 stretch — previously a
recall-vs-exact spec only): an INDEPENDENT transcription of the whole
random-hyperplane LSH pipeline (graft.llmops.Dedup.embeddingNearDupLsh at
q59's parameters: threshold 0.35, bitsPerBand 4, numBands 32, seed 42,
maxBucketSize 10000).

Every stage is deterministic, so the output is closed-form:
  1. vector-identical collapse: groups keyed on the EXACT embedding, rep =
     min doc_id; a group larger than the cap is dropped WHOLE (capFilter) —
     modeled, not assumed absent;
  2. hyperplanes: java.util.Random(42).nextGaussian().toFloat in
     Array.fill(numPlanes, dim) order — transcribed LCG + Marsaglia polar
     (Java's algorithm verbatim; sqrt is IEEE everywhere, and a last-ulp
     libm-log divergence would FAIL the fingerprint loudly, never pass);
  3. signatures on reps only: per plane, left-to-right double dot >= 0 sets
     bit (j % 4) of band (j / 4);
  4. banding: a rep pair is a candidate iff it shares one NON-oversized
     (band, bucket) — capBuckets drops whole oversized side-a buckets, the
     same deterministic rule check_simhash models;
  5. verification + intra pairs: exact cosine IN DuckDB —
     list_dot_product's left-to-right double accumulation is bit-identical
     to the engine's CosineSimilarity codegen (that equality is the q30
     oracle's own foundation); NaN (zero vectors) passes >= like Spark.

Python does only what SQL cannot (the PRNG, the sign bits, the bucket sets);
the expansion and the order-independent count+hash fingerprint run in DuckDB
(the check_oracle_sf10 discipline).

Self-validation contract: run at sf0.01 FIRST (500 distinct vectors, no
clones — collapse degenerates) and require a fingerprint match before
trusting the sf10 verdict (2,000 reps x 100 clones).

Usage: python3 tools/check_lshembed.py <sfDir> <verifyOutDir>
(expects a Verify dump for q59_embed_neardup_lsh)
"""
import math
import os
import sys
import time
from collections import defaultdict

import duckdb
import numpy as np

MASK48 = (1 << 48) - 1


class JavaRandom:
    """java.util.Random: 48-bit LCG + Marsaglia-polar nextGaussian."""

    def __init__(self, seed):
        self.seed = (seed ^ 0x5DEECE66D) & MASK48
        self.have_next = False
        self.next_g = 0.0

    def _next(self, bits):
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & MASK48
        return self.seed >> (48 - bits)

    def next_double(self):
        return ((self._next(26) << 27) + self._next(27)) * (2.0 ** -53)

    def next_gaussian(self):
        if self.have_next:
            self.have_next = False
            return self.next_g
        while True:
            v1 = 2 * self.next_double() - 1
            v2 = 2 * self.next_double() - 1
            s = v1 * v1 + v2 * v2
            if 0.0 < s < 1.0:
                break
        mul = math.sqrt(-2 * math.log(s) / s)
        self.next_g = v2 * mul
        self.have_next = True
        return v1 * mul


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    threshold, bits_per_band, num_bands, seed, cap = 0.35, 4, 32, 42, 10000
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")

    t0 = time.time()
    # vector-identical collapse (rep = min id), oversized groups dropped
    # whole; NULL embeddings excluded (null keys never equi-join)
    con.execute(f"""
        CREATE TABLE grp AS
        SELECT embedding AS emb, min(vec_id) AS rep, count(*) AS gn
        FROM read_parquet('{sfdir}/embeddings.parquet')
        WHERE embedding IS NOT NULL GROUP BY embedding""")
    dropped_groups = con.execute(f"SELECT count(*) FROM grp WHERE gn > {cap}").fetchone()[0]
    con.execute(f"CREATE TABLE reps AS SELECT rep, emb FROM grp WHERE gn <= {cap}")
    con.execute(f"""
        CREATE TABLE members AS
        SELECT g.rep, e.vec_id AS doc_id
        FROM read_parquet('{sfdir}/embeddings.parquet') e
        JOIN (SELECT emb, rep FROM grp WHERE gn <= {cap}) g ON e.embedding = g.emb""")
    rep_rows = con.execute("SELECT rep, emb FROM reps ORDER BY rep").fetchall()
    print(f"{len(rep_rows)} reps ({dropped_groups} oversized groups dropped) "
          f"({time.time()-t0:.0f}s)", flush=True)

    # hyperplanes in Array.fill(numPlanes, dim) evaluation order, cast float32
    dim = len(rep_rows[0][1])
    n_planes = bits_per_band * num_bands
    rnd = JavaRandom(seed)
    planes = np.array([[np.float32(rnd.next_gaussian()) for _ in range(dim)]
                       for _ in range(n_planes)], dtype=np.float64)

    # signatures: per plane, LEFT-TO-RIGHT double dot >= 0. A sequential
    # fold of exact double products equals np.cumsum... it does NOT — order
    # matters only WITHIN one dot product, so do the honest loop per rep
    # (2k reps x 128 planes x 64 dims is cheap).
    t1 = time.time()
    rep_bands = {}
    bucket_docs = defaultdict(int)  # (band, bucket) -> member-rep count
    rep_members = dict(con.execute("SELECT rep, count(*) FROM members GROUP BY rep").fetchall())
    for rep, emb in rep_rows:
        e = [float(np.float32(x)) for x in emb]
        bands = [0] * num_bands
        for j in range(n_planes):
            p = planes[j]
            dot = 0.0
            for i in range(min(len(e), dim)):
                dot += e[i] * p[i]
            if dot >= 0:
                bands[j // bits_per_band] |= 1 << (j % bits_per_band)
        rep_bands[rep] = bands
        for band, bucket in enumerate(bands):
            bucket_docs[(band, bucket)] += 1
    oversized = {k for k, n in bucket_docs.items() if n > cap}
    print(f"signatures done; {len(oversized)} oversized band buckets "
          f"({time.time()-t1:.0f}s)", flush=True)

    # candidate rep pairs: share >= 1 live (band, bucket)
    t2 = time.time()
    by_bucket = defaultdict(list)
    for rep, bands in rep_bands.items():
        for band, bucket in enumerate(bands):
            if (band, bucket) not in oversized:
                by_bucket[(band, bucket)].append(rep)
    cand = set()
    for reps_in in by_bucket.values():
        reps_in.sort()
        for i in range(len(reps_in)):
            for j in range(i + 1, len(reps_in)):
                cand.add((reps_in[i], reps_in[j]))
    print(f"{len(cand)} candidate rep pairs ({time.time()-t2:.0f}s)", flush=True)

    # verification + intra + expansion + fingerprint in DuckDB; cosine =
    # list_dot_product form (bit-identical to the engine's CosineSimilarity);
    # NaN passes the threshold like Spark's NaN-is-greatest ordering
    con.execute("CREATE TABLE cand(rep_a BIGINT, rep_b BIGINT)")
    con.executemany("INSERT INTO cand VALUES (?, ?)", [(a, b) for a, b in sorted(cand)])
    cos = ("list_dot_product(a.v, b.v) / "
           "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))")
    con.execute("CREATE TABLE repd AS SELECT rep, CAST(emb AS DOUBLE[]) AS v FROM reps")
    con.execute(f"""
        CREATE TABLE py_pairs AS
        WITH ver AS (
          SELECT c.rep_a, c.rep_b, {cos} AS cosine
          FROM cand c JOIN repd a ON a.rep = c.rep_a JOIN repd b ON b.rep = c.rep_b),
        keep AS (SELECT * FROM ver WHERE cosine >= {threshold} OR isnan(cosine))
        SELECT least(ma.doc_id, mb.doc_id) AS id_a,
               greatest(ma.doc_id, mb.doc_id) AS id_b, k.cosine
        FROM keep k JOIN members ma ON ma.rep = k.rep_a
                    JOIN members mb ON mb.rep = k.rep_b
        UNION ALL
        SELECT x.doc_id, y.doc_id, s.cosine
        FROM (SELECT rep, {cos.replace('b.v', 'a.v').replace(' b ', ' a2 ')} AS cosine
              FROM repd a) s
        JOIN members x ON x.rep = s.rep
        JOIN members y ON y.rep = s.rep AND x.doc_id < y.doc_id
        WHERE s.cosine >= {threshold} OR isnan(s.cosine)""")

    fp = ("SELECT COUNT(*), COALESCE(SUM(CAST(hash(concat_ws(chr(1), "
          "CAST(id_a AS BIGINT), CAST(id_b AS BIGINT), "
          "CAST(cosine AS DOUBLE))) AS HUGEINT)), 0) FROM {}")
    py_n, py_h = con.execute(fp.format("py_pairs")).fetchone()
    eng_n, eng_h = con.execute(fp.format(
        f"read_parquet('{outdir}/q59_embed_neardup_lsh/*.parquet')")).fetchone()
    ok = (py_n, py_h) == (eng_n, eng_h)
    print(f"python pairs={py_n} engine pairs={eng_n} hash_match={py_h == eng_h} "
          f"({time.time()-t0:.0f}s total)")
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
