#!/usr/bin/env python3
"""Value gate for q94_bpe_tokenize (r12 — previously rows-only).

Why no DuckDB oracle exists: BPE training is an ITERATIVE ARGMAX loop (200
rounds of "find the most frequent adjacent pair, fuse it everywhere") — not
monotone-recursive, so it has no plain recursive-CTE formulation the driver
gate could run. But it is fully deterministic-from-text (no engine-local
hashing), so an independent pure-Python transcription can value-verify it —
the tools/check_sf10_winnow.py discipline.

Transcription contract (mirrors src/main/scala/graft/llmops/Bpe.scala):
  - TRAIN word-freq: explode(split(trim(lower(text)), \\s+)) with Spark's
    trim (U+0020 only) and Java's \\s (ASCII class, split limit -1), empty
    tokens dropped; corpus multiplicity counts (clone fixtures weight words
    by replication, exactly like the engine's groupBy(word).count()).
  - Merge loop: weighted adjacent-pair counts over the word-frequency table,
    best = (count DESC, left ASC, right ASC), stop below weighted count 2,
    at most numMerges=200 merges.
  - ENCODE: greedy LOWEST-RANK-first fusing per word (merge order, not scan
    order); stats per doc = (sum of subword counts, word count, sum of word
    lengths).

Self-validation contract: run at sf0.01 FIRST (3k docs, all distinct) and
require an exact match against the engine dump before trusting the sf10
verdict (500k rows, 4,992 distinct texts — encoding runs per distinct text).

Usage: python3 tools/check_bpe.py <sfDir> <verifyOutDir>
(expects a Verify dump for q94_bpe_tokenize)
"""
import os
import re
import sys
import time
from collections import Counter, defaultdict

import duckdb

JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # Java regex \s exactly, not Python's
NUM_MERGES = 200  # q94's parameter


def words_of(text):
    """split(trim(lower(coalesce(text,''))), \\s+), empties dropped."""
    t = ("" if text is None else text).lower().strip(" ")
    return [w for w in JAVA_WS.split(t) if w]


def train(word_freq):
    """Bpe.train's merge loop over the (word -> weighted count) table."""
    seqs = [(list(w), c) for w, c in word_freq.items()]
    merges = []
    for rank in range(NUM_MERGES):
        pair_counts = Counter()
        for s, c in seqs:
            for i in range(len(s) - 1):
                pair_counts[(s[i], s[i + 1])] += c
        best = None
        for (l, r), c in pair_counts.items():
            if c < 2:
                continue
            key = (-c, l, r)
            if best is None or key < best[0]:
                best = (key, l, r)
        if best is None:
            break
        _, l, r = best
        merges.append((l, r))
        fused = l + r
        nxt = []
        for s, c in seqs:
            if len(s) < 2:
                nxt.append((s, c))
                continue
            out = []
            i = 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    out.append(fused)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            nxt.append((out, c))
        seqs = nxt
    return {pair: rank for rank, pair in enumerate(merges)}


def encode_len(word, ranks, cache):
    """Greedy lowest-rank-first fusing; returns the subword count."""
    n = cache.get(word)
    if n is not None:
        return n
    s = list(word)
    while len(s) >= 2:
        best_rank, best_at = None, -1
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_at = r, i
        if best_at < 0:
            break
        s = s[:best_at] + [s[best_at] + s[best_at + 1]] + s[best_at + 2:]
    cache[word] = len(s)
    return len(s)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    t0 = time.time()
    # distinct texts with their doc multiplicity lists — training weights
    # words by corpus multiplicity, encoding runs once per distinct text
    texts = con.execute(
        f"SELECT text, list(doc_id ORDER BY doc_id) FROM "
        f"read_parquet('{sfdir}/documents.parquet') GROUP BY text").fetchall()
    word_freq = Counter()
    tok_cache = {}
    for text, ids in texts:
        ws = words_of(text)
        tok_cache[id(text)] = ws
        for w in ws:
            word_freq[w] += len(ids)
    print(f"tokenized {len(texts)} distinct texts, vocab {len(word_freq)} "
          f"({time.time()-t0:.0f}s)", flush=True)

    ranks = train(word_freq)
    print(f"trained {len(ranks)} merges ({time.time()-t0:.0f}s)", flush=True)

    enc_cache = {}
    expect = {}  # doc_id -> (n_bpe_tokens, n_words, n_chars)
    for text, ids in texts:
        ws = tok_cache[id(text)]
        bpe = sum(encode_len(w, ranks, enc_cache) for w in ws)
        stats = (bpe, len(ws), sum(len(w) for w in ws))
        for d in ids:
            expect[d] = stats
    print(f"encoded ({time.time()-t0:.0f}s)", flush=True)

    got = con.execute(
        f"SELECT doc_id, n_bpe_tokens, n_words, n_chars FROM "
        f"read_parquet('{outdir}/q94_bpe_tokenize/*.parquet')").fetchall()
    bad = 0
    seen = set()
    for doc_id, b, w, c in got:
        seen.add(doc_id)
        if expect.get(doc_id) != (b, w, c):
            if bad < 5:
                print(f"MISMATCH doc {doc_id}: engine=({b},{w},{c}) "
                      f"python={expect.get(doc_id)}")
            bad += 1
    missing = len(expect) - len(seen)
    ok = bad == 0 and missing == 0 and len(got) == len(expect)
    print(f'[check_bpe] {{"docs":{len(expect)},"engineRows":{len(got)},'
          f'"mismatches":{bad},"missing":{missing},"merges":{len(ranks)},'
          f'"sec":{time.time()-t0:.0f},"ok":{"true" if ok else "false"}}}')
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
