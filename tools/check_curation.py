#!/usr/bin/env python3
"""Value gate for q54_curation_pipeline (r15 — rows-only before; the audit
row said 'LSH stage is engine-local', but every stage is deterministic and
the LSH stage transcribed in r15's check_minhash — so the COMPOSITE is
transcribable end-to-end).

Transcribed chain (llmops/Curation.curate at q54's parameters: lang='en',
minQuality=0.3, jaccardThreshold=0.5; output doc_id, lang_pred,
round(quality, 4)):
  1. exact dedup: keep the min doc_id per md5(text) fingerprint;
  2. near-dup losers: minHashLsh over the survivors (the check_minhash
     machinery, threshold 0.5, collapse semantics == direct when cap-free)
     -> drop every id that appears as a pair's GREATER id;
  3. lang-ID: stopword-ratio argmax with the en > es > de tie-break over
     Spark-trim + Java \\s+ tokens (edge empties COUNT toward n);
  4. quality: the written-order IEEE chain (stopword/unique/length ratios,
     punct/digit penalties over POSIX [!-/:-@[-`{-~] and [0-9] counts);
  5. filter lang_pred == 'en' AND quality >= 0.3; quality rounds via
     shortest-string BigDecimal HALF_UP scale 4 (Spark's double round).

Usage: python3 tools/check_curation.py <sfDir> <verifyOutDir>
(expects a Verify dump for q54_curation_pipeline)
"""
import hashlib
import os
import re
import sys
import time
from collections import defaultdict
from decimal import Decimal, ROUND_HALF_UP

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
LANG, MIN_QUALITY = "en", 0.3

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
PUNCT = re.compile(r"[!-/:-@\[-`{-~]")  # Java \p{Punct} (POSIX, ASCII)
DIGIT = re.compile(r"[0-9]")


def spark_tokens(text):
    """Text.tokens: Spark trim (U+0020 only) + Java split("\\s+", -1 -> Spark
    split default keeps edge empties like -1). "" -> [""].
    """
    t = "" if text is None else text
    t = t.strip(" ")
    return JAVA_WS.split(t) if t != "" else [""]


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


def spark_round4(x):
    """Spark round(double, 4): shortest-string BigDecimal, HALF_UP."""
    return float(Decimal(repr(float(x))).quantize(Decimal("0.0001"), ROUND_HALF_UP))


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


def minhash_losers(docs):
    """(id_b of every >= 0.5 pair) over the exact-deduped docs — the
    collapse-view model (== the engine's collapse-OFF direct path when no
    cap binds, which this verifies in both units).
    """
    doc_lists = defaultdict(list)
    set_of = {}
    for did, text in docs:
        s = shingle_set(text)
        doc_lists[s].append(did)
        set_of[did] = s
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
    losers = set()
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
                    losers.add(max(da, db))
    for _, ids in groups:
        for d in ids[1:]:
            losers.add(d)  # intra-clone pairs: greater ids lose
    return losers


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    t0 = time.time()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sfdir}/documents.parquet')"
    ).fetchall()
    # 1. exact dedup: min doc_id per md5(text)
    by_md5 = {}
    for did, text in docs:
        fp = hashlib.md5(("" if text is None else text).encode("utf-8")).hexdigest()
        if fp not in by_md5 or did < by_md5[fp][0]:
            by_md5[fp] = (int(did), text)
    deduped = sorted(by_md5.values())
    print(f"{len(docs)} docs -> {len(deduped)} after exact dedup "
          f"({time.time()-t0:.0f}s)", flush=True)
    # 2. near-dup losers
    losers = minhash_losers(deduped)
    kept = [(did, text) for did, text in deduped if did not in losers]
    print(f"{len(kept)} after near-dup ({time.time()-t0:.0f}s)", flush=True)
    # 3-5. lang + quality gates
    rows = []
    for did, text in kept:
        t = "" if text is None else text
        toks = spark_tokens(t)
        lp = lang_id(toks)
        q = quality(t, toks)
        if lp == LANG and q >= MIN_QUALITY:
            rows.append((did, lp, spark_round4(q)))

    con.execute("CREATE TABLE py_cur(doc_id BIGINT, lang_pred VARCHAR, quality DOUBLE)")
    con.executemany("INSERT INTO py_cur VALUES (?, ?, ?)", rows)
    fp = ("SELECT COUNT(*), COALESCE(SUM(CAST(hash(concat_ws(chr(1), "
          "CAST(doc_id AS BIGINT), lang_pred, CAST(quality AS DOUBLE))) "
          "AS HUGEINT)), 0) FROM {}")
    py_n, py_h = con.execute(fp.format("py_cur")).fetchone()
    eng_n, eng_h = con.execute(fp.format(
        f"read_parquet('{outdir}/q54_curation_pipeline/*.parquet')")).fetchone()
    ok = (py_n, py_h) == (eng_n, eng_h)
    print(f"python rows={py_n} engine rows={eng_n} hash_match={py_h == eng_h} "
          f"({time.time()-t0:.0f}s total)")
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
