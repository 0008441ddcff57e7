#!/usr/bin/env python3
"""Value gate for q134_streaming_neardup (r15 — rows-only before; the 'greedy
online semantics are order-dependent' audit note is about BATCH-vs-ONLINE
divergence, not nondeterminism: q134's delta split is a FIXED id-parity
order, so the whole run is deterministic-from-input and transcribable).

Transcribed chain (streaming/StreamingNearDup.applyBatch at the q134 call
shape — two batches split on doc_id parity, Config(3, 16, 4, 0.5)):
  per batch, in order:
  1. within-batch dedup: minHashLsh pairs (the check_minhash transcription:
     xxhash64 shingle sets, signed-min chained signatures, Murmur3 band
     buckets, IEEE jaccard >= 0.5) -> connected components over the pair
     graph -> keep exactly each component's min id (Dedup.resolveKeepers);
  2. against-store dedup: the batch survivors' (band, bucket) entries
     bucket-join the entries of everything kept so far; candidates verify
     by exact jaccard vs the STORED shingle sets; >= 0.5 drops the new doc
     (the store prune by bucket membership is a scan optimization with no
     semantic effect);
  3. survivors land and append their banding + sets to the store.
Output = kept doc_ids. Path identity rides the same cap-free argument as
check_minhash (the gate aborts loudly if any group/bucket cap would bind).

Usage: python3 tools/check_neardup.py <sfDir> <verifyOutDir>
(expects a Verify dump for q134_streaming_neardup)
"""
import os
import re
import sys
import time
from collections import defaultdict

import duckdb
import numpy as np

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SHINGLE, NUM_HASHES, NUM_BANDS, THRESHOLD, MAX_BUCKET = 3, 16, 4, 0.5, 10000
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS


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


JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def shingle_set(text):
    t = "" if text is None else text
    t = t.strip(" ")
    toks = JAVA_WS.split(t)
    count = max(len(toks) - (SHINGLE - 1), 1)
    return frozenset(
        xxh64(" ".join(toks[k:min(k + SHINGLE, len(toks))]).encode("utf-8"))
        for k in range(count))


def signature(hashes_u64):
    seeds = np.fromiter(hashes_u64, dtype=np.uint64, count=len(hashes_u64))
    out = []
    for j in range(NUM_HASHES):
        h = seeds + np.uint64((P5 + 4) & M64)
        h = h ^ np.uint64(((j & 0xFFFFFFFF) * P1) & M64)
        h = ((h << np.uint64(23)) | (h >> np.uint64(41))) * np.uint64(P2) + np.uint64(P3)
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(P2)
        h = h ^ (h >> np.uint64(29))
        h = h * np.uint64(P3)
        h = h ^ (h >> np.uint64(32))
        out.append(int(h.view(np.int64).min()))
    return tuple(out)


M32 = 0xFFFFFFFF


def _mm_mix_k1(k1):
    k1 = (k1 * 0xCC9E2D51) & M32
    k1 = ((k1 << 15) | (k1 >> 17)) & M32
    return (k1 * 0x1B873593) & M32


def _mm_mix_h1(h1, k1):
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & M32
    return (h1 * 5 + 0xE6546B64) & M32


def _mm_hash_long(v_signed, seed):
    u = v_signed & M64
    h1 = _mm_mix_h1(seed, _mm_mix_k1(u & M32))
    h1 = _mm_mix_h1(h1, _mm_mix_k1((u >> 32) & M32))
    h1 ^= 8
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M32
    h1 ^= h1 >> 16
    return h1


def band_buckets(sig):
    out = []
    for b in range(NUM_BANDS):
        h = 42
        for v in sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]:
            h = _mm_hash_long(v, h)
        out.append((b, h))
    return out


class UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def minhash_pairs(groups, sigs):
    """check_minhash's collapse-view pair model at threshold 0.5: returns the
    set of unordered doc-id pairs with jaccard >= 0.5 (cross via rep pairs
    sharing a live bucket, intra = all clone pairs). Aborts on any cap bind.
    """
    buckets = defaultdict(list)
    for gi, sig in enumerate(sigs):
        for key in band_buckets(sig):
            buckets[key].append(gi)
    for key, gis in buckets.items():
        n_docs = sum(len(groups[g][1]) for g in gis)
        if len(gis) > MAX_BUCKET or n_docs > MAX_BUCKET:
            print("ABORT: cap regime — model not applicable")
            sys.exit(2)
    if any(len(ids) > MAX_BUCKET for _, ids in groups):
        print("ABORT: group cap regime")
        sys.exit(2)
    cand = set()
    for gis in buckets.values():
        if len(gis) > 1:
            gs = sorted(set(gis))
            for i in range(len(gs)):
                for j in range(i + 1, len(gs)):
                    cand.add((gs[i], gs[j]))
    pairs = []
    for ga, gb in cand:
        sa, sb = groups[ga][0], groups[gb][0]
        c = len(sa & sb)
        if c / (len(sa) + len(sb) - c) >= THRESHOLD:
            for da in groups[ga][1]:
                for db in groups[gb][1]:
                    pairs.append((da, db))
    for _, ids in groups:
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.append((ids[i], ids[j]))  # clones: jaccard 1.0 >= 0.5
    return pairs


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    t0 = time.time()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sfdir}/documents.parquet') "
        f"ORDER BY doc_id").fetchall()
    set_cache = {}
    def sset(text):
        if text not in set_cache:
            set_cache[text] = shingle_set(text)
        return set_cache[text]

    # store: list of (doc_id, set, band-bucket entries) of everything kept
    store_entries = defaultdict(set)   # (band, bucket) -> kept doc ids
    store_sets = {}
    kept_all = []
    for parity in (0, 1):
        batch = [(int(d), t) for d, t in docs if d % 2 == parity]
        # group by identical shingle set (collapse view)
        doc_lists = defaultdict(list)
        for did, text in batch:
            doc_lists[sset(text)].append(did)
        groups = [(s, sorted(ids)) for s, ids in doc_lists.items()]
        sigs = [signature(s) for s, _ in groups]
        # 1. within-batch components -> min-id keepers
        uf = UF()
        for a, b in minhash_pairs(groups, sigs):
            uf.union(a, b)
        comp_min = {}
        for did, _ in batch:
            r = uf.find(did) if did in uf.p else did
            comp_min[r] = min(comp_min.get(r, did), did)
        batch_kept = [did for did, _ in batch
                      if comp_min[uf.find(did) if did in uf.p else did] == did]
        # 2. against-store: shared (band, bucket) candidates, exact jaccard
        bb_by_group = {id(groups[gi][0]): band_buckets(sigs[gi])
                       for gi in range(len(groups))}
        set_by_id = {did: groups[gi][0]
                     for gi in range(len(groups)) for did in groups[gi][1]}
        survivors = []
        for did in batch_kept:
            s = set_by_id[did]
            olds = set()
            for key in bb_by_group[id(s)]:
                olds |= store_entries.get(key, set())
            dropped = False
            for old in olds:
                sb = store_sets[old]
                c = len(s & sb)
                if c / (len(s) + len(sb) - c) >= THRESHOLD:
                    dropped = True
                    break
            if not dropped:
                survivors.append(did)
        # 3. append survivors' state
        for did in survivors:
            s = set_by_id[did]
            store_sets[did] = s
            for key in bb_by_group[id(s)]:
                store_entries[key].add(did)
        kept_all.extend(survivors)
        print(f"batch {parity}: {len(batch)} in, {len(batch_kept)} after "
              f"within-batch, {len(survivors)} after store ({time.time()-t0:.0f}s)",
              flush=True)

    con.execute("CREATE TABLE py_nd(doc_id BIGINT)")
    con.executemany("INSERT INTO py_nd VALUES (?)", [(d,) for d in kept_all])
    fp = ("SELECT COUNT(*), COALESCE(SUM(CAST(hash(CAST(doc_id AS BIGINT)) "
          "AS HUGEINT)), 0) FROM {}")
    py_n, py_h = con.execute(fp.format("py_nd")).fetchone()
    eng_n, eng_h = con.execute(fp.format(
        f"read_parquet('{outdir}/q134_streaming_neardup/*.parquet')")).fetchone()
    ok = (py_n, py_h) == (eng_n, eng_h)
    print(f"python kept={py_n} engine kept={eng_n} hash_match={py_h == eng_h} "
          f"({time.time()-t0:.0f}s total)")
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
