#!/usr/bin/env python3
"""Value gate for q99_full_recipe (r15 — the flagship composite, rows-only
before): a pure-Python transcription of Curation.curateFull at q99's exact
parameters (raw = doc_id % 10 != 0, bench = % 10 == 0, lang='en',
minQuality=0.2, jaccardThreshold=0.5, minLmScore=0.0, 80/10 split).

Stage chain, each already proven individually in r15's tool family:
  1. cleanText (controls -> space, whitespace-run collapse, Spark trim),
     lang-ID + quality gates on the CLEANED text (check_curation's math);
  2. C4 span dedup (lineDedup, 20-token chunks, xxhash64 chunk identity,
     winner = min (doc_id, chunk_idx), docs rebuilt from surviving chunks,
     emptied docs re-gated);
  3. near-dup pair set at 0.5 (the check_minhash machinery) -> connected
     components -> keep each component's min id;
  4. decontamination vs the benchmark slice (distinct-trigram hash overlap
     >= 0.5 drops the doc);
  5. bigram LM scores against the clean corpus itself (add-1 smoothed
     (c+1)/(cc+V) in position order, mean; < 2 tokens -> NULL, kept);
  6. metadata join + leakage-safe split: bucket = base16(md5(cluster_id
     string)[:8]) % 100 -> train/valid/test at 80/10/10.

Usage: python3 tools/check_recipe.py <sfDir> <verifyOutDir>
(expects a Verify dump for q99_full_recipe)
"""
import hashlib
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
LANG, MIN_QUALITY, CHUNK = "en", 0.2, 20
TRAIN_PCT, VALID_PCT = 80, 10

EN = {"the", "a", "of", "and", "to", "in", "is", "it", "for", "on"}
ES = {"el", "la", "de", "y", "que", "en", "un", "es", "por", "con"}
DE = {"der", "die", "das", "und", "zu", "in", "ist", "ein", "mit", "von"}


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
CTRL = re.compile(r"[\x00-\x1f]")
PUNCT = re.compile(r"[!-/:-@\[-`{-~]")
DIGIT = re.compile(r"[0-9]")


def clean_text(text):
    t = CTRL.sub(" ", "" if text is None else text)
    t = JAVA_WS.sub(" ", t)
    return t.strip(" ")


def spark_tokens(text):
    t = "" if text is None else text
    t = t.strip(" ")
    return JAVA_WS.split(t)


def lang_id(toks):
    n = float(max(len(toks), 1))
    en = sum(1 for t in toks if t in EN) / n
    es = sum(1 for t in toks if t in ES) / n
    de = sum(1 for t in toks if t in DE) / n
    if en >= es and en >= de:
        return "en"
    if es >= de:
        return "es"
    return "de"


def quality(text, toks):
    n = float(max(len(toks), 1))
    chars = float(max(len(text), 1))
    stop = sum(1 for t in toks if t in EN) / n
    uniq = float(len(set(toks))) / n
    punct = float(len(PUNCT.findall(text))) / chars
    digit = float(len(DIGIT.findall(text))) / chars
    len_score = min(n / 64.0, 1.0)
    return (min(stop * 2.0, 1.0) * 0.3 + uniq * 0.3 + len_score * 0.2 +
            (1.0 - min(punct * 4.0, 1.0)) * 0.1 +
            (1.0 - min(digit * 4.0, 1.0)) * 0.1)


def shingles(toks, n):
    count = max(len(toks) - (n - 1), 1)
    return [" ".join(toks[k:min(k + n, len(toks))]) for k in range(count)]


def shingle_hash_set(text):
    return frozenset(xxh64(s.encode("utf-8")) for s in shingles(spark_tokens(text), SHINGLE))


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


def minhash_pairs(docs):
    """(id_a, id_b) pairs with jaccard >= 0.5 (collapse view == direct when
    cap-free, verified)."""
    doc_lists = defaultdict(list)
    for did, text in docs:
        doc_lists[shingle_hash_set(text)].append(did)
    groups = [(s, sorted(ids)) for s, ids in doc_lists.items()]
    if any(len(ids) > MAX_BUCKET for _, ids in groups):
        print("ABORT: group cap regime")
        sys.exit(2)
    sigs = [signature(s) for s, _ in groups]
    buckets = defaultdict(list)
    for gi, sig in enumerate(sigs):
        for key in band_buckets(sig):
            buckets[key].append(gi)
    for gis in buckets.values():
        if len(gis) > MAX_BUCKET or sum(len(groups[g][1]) for g in gis) > MAX_BUCKET:
            print("ABORT: bucket cap regime")
            sys.exit(2)
    pairs = []
    cand = set()
    for gis in buckets.values():
        if len(gis) > 1:
            gs = sorted(set(gis))
            for i in range(len(gs)):
                for j in range(i + 1, len(gs)):
                    cand.add((gs[i], gs[j]))
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
                pairs.append((ids[i], ids[j]))
    return pairs


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


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    t0 = time.time()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sfdir}/documents.parquet')"
    ).fetchall()
    raw = [(int(d), t) for d, t in docs if d % 10 != 0]
    bench = [(int(d), t) for d, t in docs if d % 10 == 0]

    # 1. clean + gate
    gated = []
    for did, text in raw:
        ct = clean_text(text)
        toks = spark_tokens(ct)
        lp = lang_id(toks)
        q = quality(ct, toks)
        if lp == LANG and q >= MIN_QUALITY:
            gated.append((did, ct, lp, q))
    print(f"{len(raw)} raw -> {len(gated)} gated ({time.time()-t0:.0f}s)", flush=True)

    # 2. span dedup (lineDedup, 20-token chunks), emptied docs re-gated
    chunks_by_doc = {}
    placements = defaultdict(list)  # chunk hash -> [(doc, idx)]
    for did, ct, _, _ in gated:
        toks = spark_tokens(ct)
        n_chunks = max(-(-len(toks) // CHUNK), 1)
        cs = [" ".join(toks[i * CHUNK:(i + 1) * CHUNK]) for i in range(n_chunks)]
        chunks_by_doc[did] = cs
        for i, c in enumerate(cs):
            placements[xxh64(c.encode("utf-8"))].append((did, i))
    winner = {h: min(ps) for h, ps in placements.items() if len(ps) >= 2}
    spanned = []
    for did, ct, lp, q in gated:
        keep = []
        for i, c in enumerate(chunks_by_doc[did]):
            w = winner.get(xxh64(c.encode("utf-8")))
            if w is None or w == (did, i):
                keep.append(c)
        rebuilt = " ".join(keep)
        if len(rebuilt.strip(" ")) > 0:
            spanned.append((did, rebuilt))
    meta = {did: (lp, q) for did, _, lp, q in gated}
    print(f"{len(spanned)} after span dedup ({time.time()-t0:.0f}s)", flush=True)

    # 3. near-dup components -> min-id keepers
    uf = UF()
    for a, b in minhash_pairs(spanned):
        uf.union(a, b)
    cluster = {}
    for did, _ in spanned:
        cluster[did] = uf.find(did) if did in uf.p else did
    kept = [(did, t) for did, t in spanned if cluster[did] == did]
    print(f"{len(kept)} after near-dup ({time.time()-t0:.0f}s)", flush=True)

    # 4. decontamination vs the benchmark slice (distinct trigram overlap)
    bench_hashes = set()
    for _, t in bench:
        for s in shingles(spark_tokens(t), SHINGLE):
            bench_hashes.add(xxh64(s.encode("utf-8")))
    clean = []
    for did, t in kept:
        hs = shingle_hash_set(t)
        matched = sum(1 for h in hs if h in bench_hashes)
        if not (matched / len(hs) >= THRESHOLD):
            clean.append((did, t))
    print(f"{len(clean)} after decontamination ({time.time()-t0:.0f}s)", flush=True)

    # 5. bigram LM score vs the clean corpus itself (add-1, position order)
    low_toks = {did: spark_tokens(t.lower()) for did, t in clean}
    bg = defaultdict(int)
    cc = defaultdict(int)
    vocab = set()
    for did, _ in clean:
        ts = low_toks[did]
        vocab.update(ts)
        for i in range(len(ts) - 1):
            bg[(ts[i], ts[i + 1])] += 1
            cc[ts[i]] += 1
    V = len(vocab)
    lm = {}
    for did, _ in clean:
        ts = low_toks[did]
        if len(ts) < 2:
            lm[did] = None
        else:
            s = 0.0
            for i in range(len(ts) - 1):
                s += float(bg.get((ts[i], ts[i + 1]), 0) + 1) / float(cc.get(ts[i], 0) + V)
            lm[did] = s / float(len(ts) - 1)
    # minLmScore = 0.0: NULL kept, every real score >= 0 — no drop at q99's params

    # 6. metadata + leakage-safe split on the cluster id
    rows = []
    for did, t in clean:
        lp, q = meta[did]
        cid = cluster[did]
        bucket = int(hashlib.md5(str(cid).encode()).hexdigest()[:8], 16) % 100
        split = ("train" if bucket < TRAIN_PCT
                 else "valid" if bucket < TRAIN_PCT + VALID_PCT else "test")
        rows.append((did, t, lp, q, lm[did], split))

    con.execute("CREATE TABLE py_rec(doc_id BIGINT, text VARCHAR, lang_pred VARCHAR, "
                "quality DOUBLE, lm_score DOUBLE, split VARCHAR)")
    con.executemany("INSERT INTO py_rec VALUES (?, ?, ?, ?, ?, ?)", rows)
    fp = ("SELECT COUNT(*), COALESCE(SUM(CAST(hash(concat_ws(chr(1), "
          "CAST(doc_id AS BIGINT), text, lang_pred, CAST(quality AS DOUBLE), "
          "COALESCE(CAST(lm_score AS VARCHAR), chr(2)), split)) AS HUGEINT)), 0) "
          "FROM {}")
    py_n, py_h = con.execute(fp.format("py_rec")).fetchone()
    eng_n, eng_h = con.execute(fp.format(
        f"read_parquet('{outdir}/q99_full_recipe/*.parquet')")).fetchone()
    ok = (py_n, py_h) == (eng_n, eng_h)
    print(f"python rows={py_n} engine rows={eng_n} hash_match={py_h == eng_h} "
          f"({time.time()-t0:.0f}s total)")
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
