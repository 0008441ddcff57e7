#!/usr/bin/env python3
"""Value gate for q28_minhash_lsh (r15 — previously a recall spec + sf100
bit-equal-jaccard evidence only): an INDEPENDENT pure-Python transcription of
graft.llmops.Dedup.minHashLsh's full chain and a fingerprint compare against
the engine's Verify dump.

Transcribed chain (Dedup.scala minHashLsh / minHashSignatures / RowHash):
  - tokens: Spark trim (U+0020 only) then Java split("\\s+", -1) with edge
    empties kept;
  - shingles: n=3 windows, short-doc single clipped shingle;
  - shingle hash: xxhash64(utf8, seed 42) — the per-doc DISTINCT set is both
    the signature input and the verification payload;
  - signature: sig_j = min over set hashes h of XXH64.hashInt(j, h) (Spark's
    xxhash64(shingle, lit(j)) chain: a 4-byte little-endian int with the
    string hash as seed), SIGNED 64-bit min, j in 0..15;
  - banding: 4 bands of 4 consecutive signature values; bucket id =
    Murmur3 hash() of the 4-long array, seed 42, per-element hashLong chain;
  - candidates: doc pairs sharing any (band, bucket), id_a < id_b, distinct;
  - verification: exact jaccard |a∩b| / (|a|+|b|-|a∩b|) as one IEEE double
    division, kept at >= threshold (0.2).

Path-identity argument: the engine picks direct vs set-identical-collapse by
an HLL probe (approx_count_distinct) this gate does NOT transcribe — instead
it verifies that NO cap binds in EITHER path (group sizes, per-(band,bucket)
doc counts AND rep counts all <= maxBucketSize), under which the two paths
are output-identical (DedupSpec's collapse≡direct pin): identical shingle
sets have identical signatures, so clone pairs are jaccard-1.0 candidates in
every band and cross pairs inherit the rep pair's jaccard bit-for-bit. The
model computes on distinct SETS (the collapse view) and expands members in
DuckDB. If any cap binds, the gate aborts loudly (exit 2) — the paths then
drop different units by documented contract and the model is not applicable.

Self-validation contract (memory-bank discipline): run at sf0.01 FIRST
(texts ~all distinct, expansion degenerates to the naive pair set) and
require a fingerprint match before trusting the sf10 verdict.

Usage: python3 tools/check_minhash.py <sfDir> <verifyOutDir>
(expects a Verify dump for q28_minhash_lsh, e.g.
 sbt "runMain graft.Verify benchdata/sf10 /tmp/v_sf10 q28_minhash_lsh")
"""
import os
import re
import sys
import time
from collections import defaultdict

import duckdb
import numpy as np

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SHINGLE = 3
NUM_HASHES = 16
NUM_BANDS = 4
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS
THRESHOLD = 0.2
MAX_BUCKET = 10000


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Standard XXH64 (what Spark's xxhash64 computes), unsigned result."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * P2) & M, 31) * P1) & M
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little") * P2) & M, 31) * P1) & M
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little") * P2) & M, 31) * P1) & M
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little") * P2) & M, 31) * P1) & M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M, 31) * P1) & M
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i:i + 8], "little") * P2) & M, 31) * P1) & M
        h ^= k
        h = (_rotl(h, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # Java regex \s exactly


def tokens(text):
    """Mirror of Dedup.RowHash.tokens: Spark trim (U+0020 only) then Java
    split("\\s+", -1) — edge empties kept.
    """
    t = "" if text is None else text
    t = t.strip(" ")
    return JAVA_WS.split(t)


def shingle_set(text):
    """Mirror of Dedup.shingleHashSet: n=3 token windows (short doc -> one
    clipped shingle), xxhash64 seed 42, DISTINCT. Returned as a Python
    frozenset of UNSIGNED hash values.
    """
    toks = tokens(text)
    count = max(len(toks) - (SHINGLE - 1), 1)
    return frozenset(
        xxh64(" ".join(toks[k:min(k + SHINGLE, len(toks))]).encode("utf-8"))
        for k in range(count))


def signature(hashes_u64):
    """Mirror of minHashSignatures' recurrence over the distinct set:
    sig_j = SIGNED min over h of XXH64.hashInt(j, h) — Spark's
    xxhash64(shingle, lit(j)) chains the int literal as a 4-byte block with
    the string hash as the running seed. Vectorized over the set.
    Returns a tuple of 16 signed ints.
    """
    seeds = np.fromiter(hashes_u64, dtype=np.uint64, count=len(hashes_u64))
    out = []
    for j in range(NUM_HASHES):
        h = seeds + np.uint64((P5 + 4) & M)
        h = h ^ np.uint64(((j & 0xFFFFFFFF) * P1) & M)
        h = ((h << np.uint64(23)) | (h >> np.uint64(41))) * np.uint64(P2) + np.uint64(P3)
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(P2)
        h = h ^ (h >> np.uint64(29))
        h = h * np.uint64(P3)
        h = h ^ (h >> np.uint64(32))
        out.append(int(h.view(np.int64).min()))
    return tuple(out)


MC1 = 0xCC9E2D51
MC2 = 0x1B873593
M32 = 0xFFFFFFFF


def _mm_mix_k1(k1):
    k1 = (k1 * MC1) & M32
    k1 = ((k1 << 15) | (k1 >> 17)) & M32
    return (k1 * MC2) & M32


def _mm_mix_h1(h1, k1):
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & M32
    return (h1 * 5 + 0xE6546B64) & M32


def _mm_hash_long(v_signed, seed):
    """Spark Murmur3_x86_32.hashLong: low then high 32 bits, fmix length 8."""
    u = v_signed & M
    h1 = _mm_mix_h1(seed, _mm_mix_k1(u & M32))
    h1 = _mm_mix_h1(h1, _mm_mix_k1((u >> 32) & M32))
    h1 ^= 8
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M32
    h1 ^= h1 >> 16
    return h1


def band_bucket(band_vals):
    """Spark hash(array<bigint>) seed 42: per-element hashLong chain (no
    nulls here). Signed 32-bit result is irrelevant — bucket identity only —
    keep unsigned.
    """
    h = 42
    for v in band_vals:
        h = _mm_hash_long(v, h)
    return h


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")

    t0 = time.time()
    texts = con.execute(
        f"SELECT text, list(doc_id ORDER BY doc_id) FROM "
        f"read_parquet('{sfdir}/documents.parquet') WHERE text IS NOT NULL "
        f"GROUP BY text").fetchall()
    # group by identical shingle SET (the collapse key): rep = min doc_id
    by_set = {}
    doc_lists = defaultdict(list)
    for text, ids in texts:
        s = shingle_set(text)
        by_set.setdefault(s, s)
        doc_lists[s].extend(ids)
    groups = [(s, sorted(ids)) for s, ids in doc_lists.items()]
    print(f"hashed {len(texts)} distinct texts -> {len(groups)} distinct "
          f"shingle sets ({time.time()-t0:.0f}s)", flush=True)

    # cap regime check 1: group sizes (collapse drops groups > cap whole)
    big_groups = [len(ids) for _, ids in groups if len(ids) > MAX_BUCKET]
    if big_groups:
        print(f"ABORT: {len(big_groups)} identical-set groups exceed the "
              f"{MAX_BUCKET} cap — cap-free model not applicable")
        sys.exit(2)

    t1 = time.time()
    sigs = [signature(s) for s, _ in groups]
    print(f"signatures for {len(sigs)} sets ({time.time()-t1:.0f}s)", flush=True)

    # band buckets; cap regime check 2: per-(band,bucket) counts in BOTH
    # units (docs = direct path, reps/sets = collapse path) must be <= cap
    buckets = defaultdict(list)  # (band, bucket) -> [group index]
    for gi, sig in enumerate(sigs):
        for b in range(NUM_BANDS):
            buckets[(b, band_bucket(sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]))].append(gi)
    oversized = 0
    for key, gis in buckets.items():
        n_reps = len(gis)
        n_docs = sum(len(groups[g][1]) for g in gis)
        if n_reps > MAX_BUCKET or n_docs > MAX_BUCKET:
            oversized += 1
    if oversized:
        print(f"ABORT: {oversized} band buckets exceed the {MAX_BUCKET} cap "
              f"in docs or reps — cap-free model not applicable")
        sys.exit(2)
    print(f"{len(buckets)} band buckets, none capped (max reps "
          f"{max(len(g) for g in buckets.values())})", flush=True)

    # candidate set-pairs sharing any bucket, then exact jaccard verification
    cand = set()
    for gis in buckets.values():
        if len(gis) > 1:
            gis = sorted(set(gis))
            for i in range(len(gis)):
                for j in range(i + 1, len(gis)):
                    cand.add((gis[i], gis[j]))
    t2 = time.time()
    rep_pairs = []
    for ga, gb in cand:
        sa, sb = groups[ga][0], groups[gb][0]
        c = len(sa & sb)
        jac = c / (len(sa) + len(sb) - c)  # one IEEE double division
        if jac >= THRESHOLD:
            ra, rb = groups[ga][1][0], groups[gb][1][0]
            rep_pairs.append((min(ra, rb), max(ra, rb), ga, gb, jac))
    print(f"{len(cand)} candidate set pairs -> {len(rep_pairs)} verified "
          f"({time.time()-t2:.0f}s)", flush=True)

    # member expansion + fingerprint in DuckDB (check_oracle_sf10 discipline)
    con.execute("CREATE TABLE members(g BIGINT, doc_id BIGINT)")
    con.executemany("INSERT INTO members VALUES (?, ?)",
                    [(gi, int(d)) for gi, (_, ids) in enumerate(groups) for d in ids])
    con.execute("CREATE TABLE rep_pairs(g_a BIGINT, g_b BIGINT, jaccard DOUBLE)")
    if rep_pairs:
        con.executemany("INSERT INTO rep_pairs VALUES (?, ?, ?)",
                        [(ga, gb, jac) for _, _, ga, gb, jac in rep_pairs])
    con.execute("""
        CREATE TABLE py_pairs AS
        SELECT least(ma.doc_id, mb.doc_id) AS id_a,
               greatest(ma.doc_id, mb.doc_id) AS id_b, p.jaccard
        FROM rep_pairs p
        JOIN members ma ON ma.g = p.g_a
        JOIN members mb ON mb.g = p.g_b
        UNION ALL
        SELECT m1.doc_id, m2.doc_id, 1.0::DOUBLE
        FROM members m1 JOIN members m2 ON m1.g = m2.g AND m1.doc_id < m2.doc_id""")

    fp = ("SELECT COUNT(*), COALESCE(SUM(CAST(hash(concat_ws(chr(1), "
          "CAST(id_a AS BIGINT), CAST(id_b AS BIGINT), "
          "CAST(jaccard AS DOUBLE))) AS HUGEINT)), 0) FROM {}")
    py_n, py_h = con.execute(fp.format("py_pairs")).fetchone()
    eng_n, eng_h = con.execute(fp.format(
        f"read_parquet('{outdir}/q28_minhash_lsh/*.parquet')")).fetchone()
    ok = (py_n, py_h) == (eng_n, eng_h)
    print(f"python pairs={py_n} engine pairs={eng_n} hash_match={py_h == eng_h} "
          f"({time.time()-t0:.0f}s total)")
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
