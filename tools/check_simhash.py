#!/usr/bin/env python3
"""Value gate for q29_simhash_pairs (r14 — previously a Spark-vs-Spark
sig-equality spec only): an INDEPENDENT pure-Python transcription of the
SimHash chain (graft.llmops.Dedup.simHashSignatures — Spark-trim tokens
split on Java \\s+ with -1 limit, xxhash64(token, seed 42) over UTF-8, 64
bit-votes with STRICT-positive majority) and of the pairing contract
(Dedup.simHashPairs): the 4x16-bit quarter banding guarantees recall at
Hamming <= 3 by pigeonhole — and the hot-bucket cap is DETERMINISTIC
(capBuckets drops EVERY side-a row of a bucket larger than `cap`, never a
sample), so the engine's output is closed-form either way: every unordered
doc pair with popcount(sig_a XOR sig_b) <= 3 that shares at least one
NON-oversized (quarter, 16-bit-value) bucket. With no oversized buckets
(sf0.01) that degenerates to the pure Hamming ball; at sf10 the x100 clone
groups push some quarter buckets past 10k and the dropped buckets are
modeled exactly (and counted, the CapStats discipline).

Signatures are computed once per DISTINCT text (sf10 documents is a x100
replication fixture: 500k rows, ~5k distinct texts); sig-level Hamming pairs
come from a numpy bit-matrix product; the member-pair expansion and the
order-independent count+hash fingerprint run in DuckDB (the
check_oracle_sf10 discipline — nothing materializes in pandas).

Self-validation contract: run at sf0.01 FIRST (every text distinct there, so
the expansion degenerates to the naive pair set) and require a fingerprint
match against the engine dump before trusting the sf10 verdict.

Usage: python3 tools/check_simhash.py <sfDir> <verifyOutDir>
(expects a Verify dump for q29_simhash_pairs, e.g.
 sbt "runMain graft.Verify benchdata/sf10 /tmp/v_sf10 q29_simhash_pairs")
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


JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # Java regex \s exactly, not Python's


def tokens(text):
    """Mirror of Dedup.RowHash.tokens: Spark trim (U+0020 only) then Java
    split("\\s+", -1) — edge empties kept, null -> "" -> the single empty
    token (hashed like any other, the UDF's exact behavior).
    """
    t = "" if text is None else text
    t = t.strip(" ")
    return JAVA_WS.split(t)


def simhash(text):
    """Mirror of Dedup.simHashSignatures' UDF: 64 bit-votes over
    xxhash64(token, 42); bit set iff votes STRICTLY positive. Unsigned.
    """
    votes = [0] * 64
    for tok in tokens(text):
        h = xxh64(tok.encode("utf-8"))
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(64):
        if votes[b] > 0:
            sig |= 1 << b
    return sig


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    max_hamming = 3       # q29's parameter
    max_bucket = 10000    # simHashPairs' hot-bucket cap — must NOT engage
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")

    t0 = time.time()
    texts = con.execute(
        f"SELECT text, list(doc_id ORDER BY doc_id) FROM "
        f"read_parquet('{sfdir}/documents.parquet') GROUP BY text").fetchall()
    by_sig = defaultdict(list)
    for text, ids in texts:
        by_sig[simhash(text)].extend(ids)
    sigs = sorted(by_sig)
    print(f"hashed {len(texts)} distinct texts -> {len(sigs)} distinct sigs "
          f"({time.time()-t0:.0f}s)", flush=True)

    # per (quarter, 16-bit-value) doc counts -> the engine's dropped-bucket
    # set (capBuckets removes the WHOLE side-a bucket when its size > cap, so
    # the surviving pair set is deterministic: a pair needs one SHARED
    # non-oversized quarter bucket)
    buckets = defaultdict(int)
    for sig, ids in by_sig.items():
        for q in range(4):
            buckets[(q, (sig >> (16 * q)) & 0xFFFF)] += len(ids)
    oversized = {k for k, n in buckets.items() if n > max_bucket}
    print(f"{len(oversized)} oversized quarter buckets (cap {max_bucket}, "
          f"max {max(buckets.values())}) — dropped-bucket set modeled exactly",
          flush=True)

    def shares_live_bucket(s1, s2):
        for q in range(4):
            b1 = (s1 >> (16 * q)) & 0xFFFF
            if b1 == (s2 >> (16 * q)) & 0xFFFF and (q, b1) not in oversized:
                return True
        return False

    # sig-level Hamming pairs via a bit-matrix product: H = B (1-B)^T + (1-B) B^T
    t1 = time.time()
    arr = np.array(sigs, dtype=np.uint64)
    bits = np.unpackbits(arr.view(np.uint8).reshape(len(sigs), 8), axis=1,
                         bitorder="little").astype(np.int32)
    ham = bits @ (1 - bits).T + (1 - bits) @ bits.T
    ia, ib = np.nonzero(np.triu(ham <= max_hamming, k=1))
    sig_pairs = [(sigs[a], sigs[b], int(ham[a, b])) for a, b in zip(ia, ib)
                 if shares_live_bucket(sigs[a], sigs[b])]
    print(f"{len(sig_pairs)} cross-sig pairs at hamming<= {max_hamming} "
          f"({time.time()-t1:.0f}s)", flush=True)

    # member expansion + fingerprint in DuckDB (signed views of the uint sigs)
    def s64(u):
        return u - (1 << 64) if u >= (1 << 63) else u
    con.execute("CREATE TABLE members(sig BIGINT, doc_id BIGINT)")
    con.executemany("INSERT INTO members VALUES (?, ?)",
                    [(s64(sig), int(d)) for sig, ids in by_sig.items() for d in ids])
    # intra-sig (hamming-0) pairs survive iff one of THEIR OWN four buckets
    # is non-oversized (all four quarters are shared by construction)
    con.execute("CREATE TABLE live_intra(sig BIGINT)")
    con.executemany("INSERT INTO live_intra VALUES (?)",
                    [(s64(sig),) for sig in sigs if shares_live_bucket(sig, sig)])
    con.execute("CREATE TABLE sig_pairs(sig_a BIGINT, sig_b BIGINT, ham BIGINT)")
    if sig_pairs:
        con.executemany("INSERT INTO sig_pairs VALUES (?, ?, ?)",
                        [(s64(a), s64(b), h) for a, b, h in sig_pairs])
    con.execute("""
        CREATE TABLE py_pairs AS
        SELECT least(m1.doc_id, m2.doc_id) AS id_a,
               greatest(m1.doc_id, m2.doc_id) AS id_b, p.ham AS hamming
        FROM sig_pairs p
        JOIN members m1 ON m1.sig = p.sig_a
        JOIN members m2 ON m2.sig = p.sig_b
        UNION ALL
        SELECT m1.doc_id, m2.doc_id, 0
        FROM members m1 JOIN members m2 ON m1.sig = m2.sig AND m1.doc_id < m2.doc_id
        WHERE m1.sig IN (SELECT sig FROM live_intra)""")

    fp_sql = ("SELECT COUNT(*), COALESCE(SUM(CAST(hash(concat_ws(chr(1), "
              "CAST(id_a AS BIGINT), CAST(id_b AS BIGINT), "
              "CAST(hamming AS BIGINT))) AS HUGEINT)), 0) FROM {}")
    py_n, py_h = con.execute(fp_sql.format("py_pairs")).fetchone()
    eng_n, eng_h = con.execute(fp_sql.format(
        f"read_parquet('{outdir}/q29_simhash_pairs/*.parquet')")).fetchone()
    ok = (py_n, py_h) == (eng_n, eng_h)
    print(f"python pairs={py_n} engine pairs={eng_n} hash_match={py_h == eng_h} "
          f"({time.time()-t0:.0f}s total)")
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
