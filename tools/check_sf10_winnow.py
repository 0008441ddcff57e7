#!/usr/bin/env python3
"""sf10 value gate for q42_winnow_fingerprints (r11 — previously rows-only:
xxhash64 is engine-local, so no pure-SQL DuckDB oracle exists).

Independent recomputation: a pure-Python XXH64 (the standard algorithm, the
same one Spark's catalyst XXH64/`xxhash64` implements, seed 42 over UTF-8
bytes) + a faithful transcription of the winnowing pipeline (Spark-trim
tokens, 3-gram shingles, window-4 SIGNED minima, distinct set per doc), then
the identical-set clone collapse the engine itself uses (sf10 documents is a
x100 replication fixture: 500k rows, 4,992 distinct texts) — rep-level pair
counting in Python over an inverted index, member-pair expansion and the
order-independent count+hash fingerprint in DuckDB (the check_oracle_sf10
discipline; nothing is materialized in pandas).

Self-validation contract: run at sf0.01 FIRST (no clones there, groups of
size 1 — the expansion degenerates to the naive pair join) and require a
hash match against the engine dump before trusting the sf10 verdict.

Usage: python3 tools/check_sf10_winnow.py <sfDir> <verifyOutDir>
(expects a Verify dump for q42_winnow_fingerprints)
"""
import os
import re
import sys
import time
from collections import defaultdict

import duckdb

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
            for _ in range(1):
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


def signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # Java regex \s exactly, not Python's
JAVA_WS_ONLY = re.compile(r"[ \t\n\x0b\f\r]*\Z")


def fingerprint_set(text, k=3, w=4):
    """Mirror of Winnowing.fingerprintWord: Spark-trim (U+0020 only) tokens
    split on Java \\s+ with -1 limit, k-gram shingles (short doc = one),
    window-w SIGNED minima, distinct set. Whitespace-only/null -> empty.
    """
    if text is None or JAVA_WS_ONLY.match(text):
        return frozenset()
    t = text.strip(" ")  # Spark trim: U+0020 only
    toks = JAVA_WS.split(t)  # keeps edge empties, Java split(-1) parity
    n_sh = max(len(toks) - (k - 1), 1)
    hs = [signed(xxh64(" ".join(toks[j:j + k]).encode("utf-8"))) for j in range(n_sh)]
    n_win = max(len(hs) - (w - 1), 1)
    return frozenset(min(hs[s:min(s + w, len(hs))]) for s in range(n_win))


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    min_shared = 3  # q42's parameter
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")

    t0 = time.time()
    texts = con.execute(
        f"SELECT text, list(doc_id ORDER BY doc_id) FROM "
        f"read_parquet('{sfdir}/documents.parquet') GROUP BY text").fetchall()
    # per-distinct-text fingerprint sets, then group by IDENTICAL SET (the
    # engine collapses on __fp equality, not text equality)
    by_set = defaultdict(list)
    for text, ids in texts:
        s = fingerprint_set(text)
        if s:  # empty sets group with nobody
            by_set[s].extend(ids)
    groups = [(min(ids), sorted(ids), s) for s, ids in by_set.items()]
    print(f"hashed {len(texts)} distinct texts -> {len(groups)} fp-set groups "
          f"({time.time()-t0:.0f}s)", flush=True)

    # rep-level shared counts via an inverted index (reps only — the engine's
    # own scale shape)
    inv = defaultdict(list)
    for rep, _, s in groups:
        for fp in s:
            inv[fp].append(rep)
    shared = defaultdict(int)
    for reps in inv.values():
        if len(reps) > 1:
            reps.sort()
            for x in range(len(reps)):
                for y in range(x + 1, len(reps)):
                    shared[(reps[x], reps[y])] += 1
    rep_pairs = [(a, b, c) for (a, b), c in shared.items() if c >= min_shared]
    print(f"rep pairs >= {min_shared}: {len(rep_pairs)}", flush=True)

    # member expansion + fingerprint compare inside DuckDB (O(1) memory)
    con.execute("CREATE TEMP TABLE members (rep BIGINT, doc_id BIGINT)")
    con.executemany("INSERT INTO members VALUES (?, ?)",
                    [(rep, d) for rep, ids, _ in groups for d in ids])
    con.execute("CREATE TEMP TABLE repsize (rep BIGINT, n BIGINT)")
    con.executemany("INSERT INTO repsize VALUES (?, ?)",
                    [(rep, len(s)) for rep, _, s in groups])
    con.execute("CREATE TEMP TABLE reppairs (ra BIGINT, rb BIGINT, c BIGINT)")
    if rep_pairs:
        con.executemany("INSERT INTO reppairs VALUES (?, ?, ?)", rep_pairs)
    oracle = f"""
        SELECT least(ma.doc_id, mb.doc_id) AS id_a,
               greatest(ma.doc_id, mb.doc_id) AS id_b, p.c AS shared_fingerprints
        FROM reppairs p JOIN members ma ON ma.rep = p.ra
        JOIN members mb ON mb.rep = p.rb
        UNION ALL
        SELECT x.doc_id, y.doc_id, rs.n
        FROM members x JOIN members y ON x.rep = y.rep AND x.doc_id < y.doc_id
        JOIN repsize rs ON rs.rep = x.rep WHERE rs.n >= {min_shared}"""
    spark_rel = f"SELECT * FROM read_parquet('{outdir}/q42_winnow_fingerprints/*.parquet')"
    cols = "CAST(id_a AS BIGINT), CAST(id_b AS BIGINT), CAST(shared_fingerprints AS BIGINT)"
    fp = lambda rel: con.execute(
        f"SELECT count(*), sum(CAST(hash({cols}) AS HUGEINT)) FROM ({rel})").fetchone()
    gn, gh = fp(spark_rel)
    wn, wh = fp(oracle)
    if (gn, gh) == (wn, wh):
        print(f"OK       q42_winnow_fingerprints ({gn} rows, hash-sum match, "
              f"{time.time()-t0:.0f}s)\n\n1/1 queries match", flush=True)
        sys.exit(0)
    print(f"FAIL     q42_winnow_fingerprints: spark=({gn},{gh}) oracle=({wn},{wh})",
          flush=True)
    sys.exit(1)


if __name__ == "__main__":
    main()
