#!/usr/bin/env python3
"""Value gates for the deterministic lab pipelines q32/q33/q35 (r15 — rows-only
checks before): INDEPENDENT pure-Python transcriptions of the three
batch lab DAGs (graft.pipelines.Labs) driven by the deterministic local
models (SURVEY.md §5 test plan), fingerprint-compared against the engine's
Verify dumps. q34 is excluded by design: it is the declared exact twin of
ANN q161 and its surge stage is q08/q09-oracle-backed already.

Transcribed components:
  - LocalHashEmbedding (ml/Model.scala:40): Java trim + split("\\s+"),
    scala MurmurHash3.stringHash(tok, 42), signed buckets mod 64, L2
    normalize via sequential double accumulation, float32 rounding;
  - BruteForceStore.search (vector/VectorStore.scala:41): sequential-order
    double dot products, score = dot/(qnorm*norm), ties (-score, doc_id),
    NaN last (TotalOrdering) — the same output contract as the distributed
    route (spec-pinned identical);
  - LocalTemplateTextGen: "[name] summary(N tokens): head12";
  - ScriptedChatModel + AgentRuntime (agent/Agent.scala): the 3-turn lab1
    tool chain (http_get/send_email with Java hashCode-derived scripted
    outputs) and the 0-tool lab4 judge, VERDICT via floorMod(hashCode, m);
  - Scalars.moneyFmt: shortest-repr double -> BigDecimal scale 2 HALF_UP;
  - lab4 spike stage: the q08/q09-PROVEN DuckDB digit-decimal anomaly twin
    (Catalog.anomalySql shape) at 6-hour tumble over sumMoney(value), z from
    the transcribed Acklam invCdf (bit-equal to Gaussian.invCdf);
  - IntervalJoin + top-10 queue in DuckDB.

Self-validation contract (memory-bank discipline): run at sf0.01 FIRST and
require all three fingerprints to match before trusting any larger scale.

Usage: python3 tools/check_labs.py <sfDir> <verifyOutDir> [q32,q33,q35]
(expects Verify dumps for q32_lab1_pricematch, q33_lab2_rag, q35_lab4_fraud)
"""

import math
import os
import re
import sys
import time
from decimal import Decimal, ROUND_HALF_UP

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_ivf  # noqa: E402  (q161: xxh64 render hashing, decimal Lloyd units)

I32 = 0xFFFFFFFF


def _i32(x):
    x &= I32
    return x - (1 << 32) if x >= (1 << 31) else x


def utf16_units(s):
    b = s.encode("utf-16-be")
    return [int.from_bytes(b[i:i + 2], "big") for i in range(0, len(b), 2)]


def java_hash(s):
    """java.lang.String.hashCode: h = 31*h + c over UTF-16 units, int32."""
    h = 0
    for c in utf16_units(s):
        h = (31 * h + c) & I32
    return _i32(h)


def scala_abs(x):
    """scala Int .abs: Int.MinValue stays negative."""
    return x if x == -(1 << 31) else abs(x)


def java_rem(a, b):
    """Java %: truncation toward zero, sign of the dividend."""
    r = abs(a) % abs(b)
    return -r if a < 0 else r


def floor_mod(a, b):
    return a % b if b > 0 else -((-a) % b)  # python % IS floorMod for b>0


def java_trim(s):
    """java.lang.String.trim: strips chars <= U+0020 from both ends."""
    i, j = 0, len(s)
    while i < j and s[i] <= " ":
        i += 1
    while j > i and s[j - 1] <= " ":
        j -= 1
    return s[i:j]


JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # Java regex \s exactly


def java_split_ws(s):
    """Java split("\\s+") limit 0: trailing empties removed, leading empty
    kept when the string starts with a separator. "" -> [""].
    """
    if s == "":
        return [""]
    parts = JAVA_WS.split(s)
    while parts and parts[-1] == "":
        parts.pop()
    return parts if parts else [""]


# ------------------------------------------------- scala MurmurHash3.stringHash
def _mm_rotl(x, r):
    return ((x << r) | ((x & I32) >> (32 - r))) & I32


def mm3_string_hash(s, seed=42):
    """scala.util.hashing.MurmurHash3.stringHash: UTF-16 units pairwise."""
    u = utf16_units(s)
    h = seed & I32
    i = 0
    while i + 1 < len(u):
        data = ((u[i] << 16) + u[i + 1]) & I32
        k = (data * 0xCC9E2D51) & I32
        k = _mm_rotl(k, 15)
        k = (k * 0x1B873593) & I32
        h ^= k
        h = _mm_rotl(h, 13)
        h = (h * 5 + 0xE6546B64) & I32
        i += 2
    if i < len(u):
        k = (u[i] * 0xCC9E2D51) & I32
        k = _mm_rotl(k, 15)
        k = (k * 0x1B873593) & I32
        h ^= k
    h ^= len(u)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & I32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & I32
    h ^= h >> 16
    return _i32(h)


def embed(text):
    """LocalHashEmbedding('local-embed-64', dim=64, seed=42)."""
    v = [0] * 64  # += ±1.0f on float32 is exact while |v| < 2^24
    for tok in java_split_ws(java_trim("" if text is None else text)):
        h = mm3_string_hash(tok, 42)
        idx = floor_mod(h, 64)
        v[idx] += -1 if ((h & I32) >> 31) == 1 else 1
    n = math.sqrt(sum(float(x) * x for x in v))  # ints: order-exact
    if n > 0:
        return np.array([np.float32(x / n) for x in v], dtype=np.float32)
    return np.zeros(64, dtype=np.float32)


def seq_norm(vec32):
    s = 0.0
    for x in vec32:
        s += float(x) * float(x)
    return math.sqrt(s)


def seq_dot(a32, b32):
    s = 0.0
    for x, y in zip(a32, b32):
        s += float(x) * float(y)
    return s


def textgen(prompt):
    toks = java_split_ws(java_trim(prompt))
    head = " ".join(toks[:12])
    return f"[local-textgen] summary({len(toks)} tokens): {head}"


def money_fmt(x):
    """Scalars.moneyFmt: double -> DECIMAL(10,2) (Spark: shortest-string
    BigDecimal, HALF_UP) -> string. None on overflow (never in testdata).
    """
    d = Decimal(repr(float(x))).quantize(Decimal("0.01"), ROUND_HALF_UP)
    return str(d)


def long_str(x):
    return str(int(x))


def java_double_str(x):
    """Java Double.toString for the plain-decimal range (the scripted tool
    prices are in [10.0, 109.99]): python repr matches there.
    """
    return repr(float(x))


# --------------------------------------------------------------- agent runtime
def run_lab1_agent(prompt):
    """ScriptedChatModel('scripted-pricer', [http_get, send_email]) through
    AgentRuntime.run: two tool turns then the final verdict answer.
    """
    p48 = "".join(chr(c) for c in utf16_units(prompt)[:48])  # String.take(48)
    args = java_trim(p48)  # ToolCallRe group(2).trim
    h = java_hash(args)
    price = (java_rem(scala_abs(h), 9000) + 1000) / 100.0
    obs1 = f"<html>page:{java_rem(scala_abs(h), 1000)} price=${java_double_str(price)}</html>"
    obs2 = f"email sent ({len(utf16_units(args))} chars)"
    observations = f"{obs1} | {obs2}"
    verdict = "MATCH" if floor_mod(java_hash(prompt), 2) == 0 else "NO_MATCH"
    resp = f"Analysis complete. VERDICT: {verdict}\nEvidence: {observations[:120]}"
    return "SUCCESS", resp, verdict


LAB4_VERDICTS = ["APPROVE", "APPROVE_PARTIAL", "REQUEST_DOCS",
                 "DENY_INELIGIBLE", "DENY_FRAUD"]


def gaussian_inv_cdf(p):
    """graft.anomaly.Gaussian.invCdf transcribed: Acklam's rational
    approximation, identical IEEE operation order — bit-equal to the engine's
    z for any confidencePercentage.
    """
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    p_low = 0.02425
    if p < p_low:
        q = math.sqrt(-2 * math.log(p))
        return ((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) /
                ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
    if p <= 1 - p_low:
        q = p - 0.5
        r = q * q
        return (((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q) /
                (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1))
    q = math.sqrt(-2 * math.log(1 - p))
    return (-(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) /
            ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))


def run_lab4_judge(prompt):
    v = LAB4_VERDICTS[floor_mod(java_hash(prompt), 5)]
    return "SUCCESS", v


# ------------------------------------------------------------------ fingerprint
def fingerprint(con, table_expr, cols):
    parts = ", ".join(cols)
    n, h = con.execute(
        f"SELECT COUNT(*), COALESCE(SUM(CAST(hash(concat_ws(chr(1), {parts})) "
        f"AS HUGEINT)), 0) FROM {table_expr}").fetchone()
    return n, h


def check(name, con, py_rows, py_schema, fp_cols, outdir):
    con.execute(f"DROP TABLE IF EXISTS py_{name}")
    con.execute(f"CREATE TABLE py_{name}({py_schema})")
    if py_rows:
        ph = ", ".join("?" * len(py_rows[0]))
        con.executemany(f"INSERT INTO py_{name} VALUES ({ph})", py_rows)
    py = fingerprint(con, f"py_{name}", fp_cols)
    eng = fingerprint(con, f"read_parquet('{outdir}/{name}/*.parquet')", fp_cols)
    ok = py == eng
    print(f"[{name}] python rows={py[0]} engine rows={eng[0]} "
          f"hash_match={py[1] == eng[1]} -> {'PASS' if ok else 'FAIL'}")
    return ok


# ------------------------------------------------------------------------ labs
def lab2_rag(con, sfdir):
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sfdir}/documents.parquet') "
        f"ORDER BY doc_id").fetchall()
    # embedDistinct: one embed per distinct text; clones share score bits
    vec_by_text = {}
    for _, text in docs:
        if text not in vec_by_text:
            vec_by_text[text] = embed(text)
    norm_by_text = {t: seq_norm(v) for t, v in vec_by_text.items()}
    queries = docs[:5]  # orderBy(doc_id).limit(5)
    rows = []
    for qid, qtext in queries:
        qv = vec_by_text[qtext]
        qnorm = seq_norm(qv)
        score_by_text = {}
        for t, v in vec_by_text.items():
            score_by_text[t] = seq_dot(qv, v) / (qnorm * norm_by_text[t])
        scored = [(score_by_text[text], did, text) for did, text in docs]
        scored.sort(key=lambda s: (math.isnan(s[0]), -s[0] if not math.isnan(s[0]) else 0.0, s[1]))
        top = scored[:3]
        chunks = "\n".join(t for _, _, t in top)
        prompt = f"Answer using only this context:\n{chunks}\n\nQuestion: {qtext}"
        rows.append((int(qid), qtext, int(top[0][1]), float(top[0][0]),
                     len(top), textgen(prompt)))
    return rows


def lab1_pricematch(con, sfdir):
    base = con.execute(f"""
        SELECT o.o_orderkey, c.c_name, n.n_name, o.o_totalprice
        FROM read_parquet('{sfdir}/orders.parquet') o
        JOIN read_parquet('{sfdir}/customer.parquet') c ON o.o_custkey = c.c_custkey
        JOIN read_parquet('{sfdir}/nation.parquet') n ON c.c_nationkey = n.n_nationkey
        ORDER BY o.o_orderkey LIMIT 40""").fetchall()
    rows = []
    for okey, cname, nname, price in base:
        pstr = money_fmt(price)
        prompt = (f"Price-match check for order {long_str(okey)} customer {cname} "
                  f"nation {nname} at price {pstr}")
        status, resp, verdict = run_lab1_agent(prompt)
        rows.append((int(okey), cname, nname, pstr, status, resp, verdict))
    return rows


def lab4_fraud(con, sfdir, z_literal):
    queued = con.execute(f"""
        WITH series AS (
          SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start, event_type,
                 CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS total_amount
          FROM read_parquet('{sfdir}/events.parquet') GROUP BY 1, 2),
        hist AS (
          SELECT window_start, event_type, total_amount,
                 CAST(CAST(SUM(CAST(CAST(total_amount AS VARCHAR) AS DECIMAL(27,6))) OVER w AS VARCHAR) AS DOUBLE) AS s1,
                 CAST(CAST(SUM(CAST(CAST(total_amount * total_amount AS VARCHAR) AS DECIMAL(27,8))) OVER w AS VARCHAR) AS DOUBLE) AS s2,
                 CAST(COUNT(total_amount) OVER w AS DOUBLE) AS n
          FROM series
          WINDOW w AS (PARTITION BY event_type ORDER BY window_start ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)),
        det AS (
          SELECT window_start, event_type, total_amount, n,
                 s1 / n AS forecast,
                 sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0.0)) AS sd
          FROM hist),
        spikes AS (
          SELECT event_type AS city,
                 window_start + INTERVAL '6 hours' - INTERVAL '1 millisecond' AS window_time
          FROM det
          WHERE n >= 8 AND (total_amount > forecast + {z_literal} * sd
                            OR total_amount < forecast - {z_literal} * sd)
                AND total_amount > forecast + {z_literal} * sd),
        claims AS (
          SELECT event_id AS claim_id, event_type AS claim_city, ts AS claim_ts,
                 value AS claim_amount, props AS narrative
          FROM read_parquet('{sfdir}/events.parquet')),
        joined AS (
          SELECT c.claim_id, c.claim_city, c.claim_amount, c.narrative
          FROM claims c JOIN spikes s
            ON c.claim_city = s.city
           AND c.claim_ts >= s.window_time - INTERVAL '6 hours'
           AND c.claim_ts <= s.window_time)
        SELECT claim_id, claim_city, claim_amount, narrative
        FROM joined ORDER BY claim_amount DESC, claim_id LIMIT 10""").fetchall()
    rows = []
    for cid, city, amount, narrative in queued:
        prompt = (f"Claim {long_str(cid)} city {city} amount {money_fmt(amount)} "
                  f"narrative {narrative if narrative is not None else ''}")
        status, verdict = run_lab4_judge(prompt)
        rows.append((int(cid), city, float(amount), status, verdict))
    return rows


TOD = [(0, 4, "late night"), (4, 7, "early morning"), (7, 10, "morning rush"),
       (10, 12, "late morning"), (12, 14, "midday"), (14, 17, "afternoon"),
       (17, 20, "evening rush"), (20, 23, "night"), (23, 24, "late night")]


def time_of_day(hour):
    for lo, hi, label in TOD:
        if lo <= hour < hi:
            return label
    return "late night"


def spark_round4(x):
    """Spark round(double, 4): shortest-string BigDecimal, HALF_UP."""
    return float(Decimal(repr(float(x))).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def lab3_surges(con, sfdir):
    """The shared lab3 surge stage: 5-min tumble counts per zone -> z-band
    surges (the q08/q09-proven digit-decimal DuckDB twin at confidence
    99.9). Used by both q34 (exact search) and q161 (IVF ann search).
    """
    z = repr(gaussian_inv_cdf(0.5 + 99.9 / 200.0))
    return con.execute(f"""
        WITH series AS (
          SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
                 COUNT(*) AS request_count
          FROM read_parquet('{sfdir}/events.parquet') GROUP BY 1, 2),
        hist AS (
          SELECT window_start, event_type, request_count,
                 CAST(CAST(SUM(CAST(CAST(CAST(request_count AS DOUBLE) AS VARCHAR) AS DECIMAL(27,6))) OVER w AS VARCHAR) AS DOUBLE) AS s1,
                 CAST(CAST(SUM(CAST(CAST(CAST(request_count AS DOUBLE) * CAST(request_count AS DOUBLE) AS VARCHAR) AS DECIMAL(38,8))) OVER w AS VARCHAR) AS DOUBLE) AS s2,
                 CAST(COUNT(request_count) OVER w AS DOUBLE) AS n
          FROM series
          WINDOW w AS (PARTITION BY event_type ORDER BY window_start ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)),
        det AS (
          SELECT window_start, event_type, request_count, n,
                 s1 / n AS forecast,
                 sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0.0)) AS sd
          FROM hist)
        SELECT window_start, event_type, request_count,
               forecast + {z} * sd AS upper_bound
        FROM det
        WHERE n >= 8 AND (CAST(request_count AS DOUBLE) > forecast + {z} * sd
                          OR CAST(request_count AS DOUBLE) < forecast - {z} * sd)
              AND CAST(request_count AS DOUBLE) > forecast + {z} * sd""").fetchall()


def lab3_fleet(con, sfdir):
    """q34_lab3_fleet: surges -> query embed -> EXACT top-3 corpus search ->
    templated reason. Exact-by-contract (the ANN production twin is q161).
    """
    surges = lab3_surges(con, sfdir)
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sfdir}/documents.parquet') "
        f"ORDER BY doc_id").fetchall()
    texts = []
    docs_by_text = {}
    for did, text in docs:
        if text not in docs_by_text:
            docs_by_text[text] = []
            texts.append(text)
        docs_by_text[text].append(int(did))
    # bit-exact vectorized scoring: DOUBLE products (exact f32 widenings),
    # summed along the 64-dim axis — below numpy's 128-element pairwise
    # cutoff, so the reduction is sequential like the engine's loop
    mat = np.array([embed(t) for t in texts], dtype=np.float32).astype(np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    rows = []
    for ws, zone, rc, ub in surges:
        tod = time_of_day(ws.hour)
        qtext = f"surge in {zone} during {tod} with {int(rc)} requests"
        qv = embed(qtext).astype(np.float64)
        qnorm = math.sqrt(float((qv * qv).sum()))
        scores = (mat * qv[None, :]).sum(axis=1) / (qnorm * norms)
        # top-3 DOCS by (nan-last, -score, doc_id): take texts in score order
        # until the collected docs can no longer be displaced, then settle
        # ties at the doc level
        order = sorted(range(len(texts)),
                       key=lambda i: (math.isnan(scores[i]),
                                      -scores[i] if not math.isnan(scores[i]) else 0.0))
        cand = []
        k = 0
        while k < len(order):
            i = order[k]
            cand.extend((float(scores[i]), d, texts[i]) for d in docs_by_text[texts[i]])
            k += 1
            if len(cand) >= 3 and (k >= len(order) or scores[order[k]] != scores[i]):
                break
        cand.sort(key=lambda s: (math.isnan(s[0]),
                                 -s[0] if not math.isnan(s[0]) else 0.0, s[1]))
        chunks = " | ".join(t for _, _, t in cand[:3])
        prompt = f"Explain this surge: {qtext}\nContext: {chunks}"
        rows.append((ws, zone, int(rc), spark_round4(ub), tod, textgen(prompt)))
    return rows


def _seqsums(mat64, row64):
    """Strictly-sequential per-row double dot of `mat64` rows with `row64`:
    np.cumsum along the last axis IS left-to-right accumulation (a plain
    .sum() uses numpy's 8-accumulator unrolled loop and drifts in the last
    ulp vs the engine's sequential loop)."""
    return np.cumsum(mat64 * row64[None, :], axis=1)[:, -1]


def lab3_fleet_ann(con, sfdir):
    """q161_lab3_fleet_ann (r16 — previously in the DECLINED
    distributed-float-avg class, unlocked by the order-independent IVF Lloyd
    step proven in check_ivf.py): q34's surge/embed/reason stages with the
    reference's OWN search semantics — VectorSearchAgg.ann, an IVF index at
    AutoLists sizing (max(16, min(4096, int(4*sqrt(N)))) lists, 2 Lloyd
    passes) probed with numCandidates=500 breadth
    (nProbes = min(nLists, ceil(500 / (N // nLists)))), top-3 by
    (nan-last, -score, doc_id) with NO self-exclusion (query ids are
    surrogates). Clone-heavy corpora collapse to distinct vectors for the
    build (identical vectors hash, assign, and score identically; the
    decimal Lloyd sum scales each distinct unit row by its clone count —
    exact integer arithmetic either way).
    """
    surges = lab3_surges(con, sfdir)
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sfdir}/documents.parquet') "
        f"ORDER BY doc_id").fetchall()
    emb_by_text = {}
    for _, text in docs:
        if text not in emb_by_text:
            emb_by_text[text] = embed(text)
    # distinct VECTORS (two texts could in principle embed identically):
    # vkey -> (float32 vec, clone count, [(doc_id, text)])
    vecs, counts, rows_of = {}, {}, {}
    for did, text in docs:
        v = emb_by_text[text]
        vk = v.tobytes()
        if vk not in vecs:
            vecs[vk] = v
            counts[vk] = 0
            rows_of[vk] = []
        counts[vk] += 1
        rows_of[vk].append((int(did), text))
    vkeys = list(vecs.keys())
    dmat32 = np.array([vecs[k] for k in vkeys], dtype=np.float32)
    dmat64 = dmat32.astype(np.float64)
    dnorms = np.sqrt(np.cumsum(dmat64 * dmat64, axis=1)[:, -1])
    dcounts = np.array([counts[k] for k in vkeys], dtype=np.int64)
    n_rows = len(docs)
    n_lists = max(16, min(4096, int(4.0 * math.sqrt(float(n_rows)))))

    # init: ORDER BY signed xxhash64(render) LIMIT n_lists over ROWS — a
    # distinct vector with c clones occupies c consecutive slots (hash ties
    # are between identical renders, so slot order cannot move a VALUE)
    hs = sorted((check_ivf.signed64(
        check_ivf.xxh64(check_ivf.java_array_str(dmat32[i]).encode("utf-8"))), i)
        for i in range(len(vkeys)))
    centroids = []
    for _, i in hs:
        reps = min(int(dcounts[i]), n_lists - len(centroids))
        for _ in range(reps):
            centroids.append((len(centroids), dmat32[i].copy()))
        if len(centroids) >= n_lists:
            break

    def assign_distinct(cents):
        """Nearest centroid per distinct vector: guarded cosine, strict->
        first-max in ascending list order (check_ivf.assign_all's contract)
        with exact sequential sums."""
        best_sim = np.full(len(vkeys), -np.inf)
        best_id = np.full(len(vkeys), -1, dtype=np.int64)
        for lid, c32 in cents:
            c64 = c32.astype(np.float64)
            cn = math.sqrt(float(np.cumsum(c64 * c64)[-1]))
            denom = dnorms * cn
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = _seqsums(dmat64, c64) / denom
            sims[denom == 0.0] = -1.0
            upd = sims > best_sim
            best_sim[upd] = sims[upd]
            best_id[upd] = lid
        return best_id

    for it in range(2):
        t0 = time.time()
        assigned = assign_distinct(centroids)
        new_centroids = []
        for lid, _ in centroids:
            members = np.nonzero(assigned == lid)[0]
            if len(members) == 0:
                continue
            cnt = int(dcounts[members].sum())
            cent = np.empty(64, dtype=np.float32)
            for d in range(64):
                units = 0
                for i in members:
                    units += int(dcounts[i]) * check_ivf.dec12_units(dmat32[i, d])
                cent[d] = np.float32(
                    float(Decimal(units).scaleb(-12)) / cnt)
            new_centroids.append((lid, cent))
        centroids = new_centroids
        print(f"[q161] lloyd pass {it + 1} done in {time.time() - t0:.1f}s "
              f"({len(centroids)} lists)", flush=True)
    final_assign = assign_distinct(centroids)

    # searchNumCandidates breadth: Scala Long division on ROW counts
    n_lists_f = len(centroids)
    avg_per_list = max(n_rows // n_lists_f, 1)
    n_probes = min(n_lists_f, max(1, (500 + avg_per_list - 1) // avg_per_list))
    by_list = {lid: np.nonzero(final_assign == lid)[0] for lid, _ in centroids}
    cent64 = {lid: c32.astype(np.float64) for lid, c32 in centroids}
    cnorm = {lid: math.sqrt(float(np.cumsum(cent64[lid] * cent64[lid])[-1]))
             for lid, _ in centroids}

    rows = []
    for ws, zone, rc, ub in surges:
        tod = time_of_day(ws.hour)
        qtext = f"surge in {zone} during {tod} with {int(rc)} requests"
        qv32 = embed(qtext)
        qv64 = qv32.astype(np.float64)
        qn = math.sqrt(float(np.cumsum(qv64 * qv64)[-1]))
        # probeLists: guarded cosine per centroid, sortBy (-sim, list_id)
        cs = []
        for lid, _ in centroids:
            denom = qn * cnorm[lid]
            sim = -1.0 if denom == 0.0 else \
                float(np.cumsum(qv64 * cent64[lid])[-1]) / denom
            cs.append((sim, lid))
        cs.sort(key=lambda s: (-s[0], s[1]))
        probed = [lid for _, lid in cs[:n_probes]]
        # candidates: every DOC ROW in the probed lists (no self-exclusion);
        # CosineSimilarity per distinct vector (clones share the score)
        cand = []
        for lid in probed:
            for i in by_list.get(lid, ()):
                with np.errstate(divide="ignore", invalid="ignore"):
                    score = float(np.cumsum(qv64 * dmat64[i])[-1]) / (qn * dnorms[i])
                for did, text in rows_of[vkeys[i]]:
                    cand.append((score, did, text))
        cand.sort(key=lambda s: (math.isnan(s[0]),
                                 -s[0] if not math.isnan(s[0]) else 0.0, s[1]))
        chunks = " | ".join(t for _, _, t in cand[:3])
        prompt = f"Explain this surge: {qtext}\nContext: {chunks}"
        rows.append((ws, zone, int(rc), spark_round4(ub), tod, textgen(prompt)))
    return rows


def tool_invoke(con, sfdir):
    """q43_tool_invoke: the single-shot AI_TOOL_INVOKE chain — scripted model
    ('SENT' verdict), one send_email tool turn, SUCCESS status.
    """
    base = con.execute(
        f"SELECT o_orderkey FROM read_parquet('{sfdir}/orders.parquet') "
        f"ORDER BY o_orderkey LIMIT 20").fetchall()
    # the output exposes (order_id, status, verdict) only: the gate pins the
    # bounded queue's ids, the SUCCESS status (a broken TOOL: envelope would
    # surface FAILED/MAX_ITERATIONS), and the VERDICT extraction
    return [(int(okey), "SUCCESS", "SENT") for (okey,) in base]


def ml_embed(con, sfdir):
    """q21_ml_embed: (doc_id, dim, first_dim) — dim always 64, first_dim =
    the hash embedding's first float32 bucket (exact under double widening).
    """
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sfdir}/documents.parquet')").fetchall()
    cache = {}
    rows = []
    for did, text in docs:
        if text not in cache:
            cache[text] = embed(text)
        v = cache[text]
        rows.append((int(did), len(v), float(v[0])))
    return rows


def ml_textgen(con, sfdir):
    """q22_ml_textgen: (doc_id, response) — LocalTemplateTextGen over text."""
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sfdir}/documents.parquet')").fetchall()
    return [(int(did), textgen("" if t is None else t)) for did, t in docs]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    which = set(sys.argv[3].split(",")) if len(sys.argv) > 3 \
        else {"q21", "q22", "q32", "q33", "q34", "q35", "q43", "q161"}
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    t0 = time.time()
    ok = True
    if "q21" in which:
        ok &= check("q21_ml_embed", con, ml_embed(con, sfdir),
                    "doc_id BIGINT, dim BIGINT, first_dim DOUBLE",
                    ["CAST(doc_id AS BIGINT)", "CAST(dim AS BIGINT)",
                     "CAST(first_dim AS DOUBLE)"], outdir)
    if "q22" in which:
        ok &= check("q22_ml_textgen", con, ml_textgen(con, sfdir),
                    "doc_id BIGINT, response VARCHAR",
                    ["CAST(doc_id AS BIGINT)", "response"], outdir)
    if "q34" in which:
        rows = lab3_fleet(con, sfdir)
        ok &= check("q34_lab3_fleet", con, rows,
                    "window_start TIMESTAMP, zone VARCHAR, request_count BIGINT, "
                    "upper_bound DOUBLE, time_of_day VARCHAR, reason VARCHAR",
                    ["CAST(window_start AS TIMESTAMP)", "zone",
                     "CAST(request_count AS BIGINT)", "CAST(upper_bound AS DOUBLE)",
                     "time_of_day", "reason"], outdir)
    if "q161" in which:
        rows = lab3_fleet_ann(con, sfdir)
        ok &= check("q161_lab3_fleet_ann", con, rows,
                    "window_start TIMESTAMP, zone VARCHAR, request_count BIGINT, "
                    "upper_bound DOUBLE, time_of_day VARCHAR, reason VARCHAR",
                    ["CAST(window_start AS TIMESTAMP)", "zone",
                     "CAST(request_count AS BIGINT)", "CAST(upper_bound AS DOUBLE)",
                     "time_of_day", "reason"], outdir)
    if "q43" in which:
        ok &= check("q43_tool_invoke", con, tool_invoke(con, sfdir),
                    "order_id BIGINT, invoke_status VARCHAR, verdict VARCHAR",
                    ["CAST(order_id AS BIGINT)", "invoke_status", "verdict"],
                    outdir)
    if "q33" in which:
        rows = lab2_rag(con, sfdir)
        ok &= check("q33_lab2_rag", con, rows,
                    "query_id BIGINT, query VARCHAR, top_doc_id BIGINT, "
                    "top_score DOUBLE, n_results BIGINT, response VARCHAR",
                    ["CAST(query_id AS BIGINT)", "query",
                     "CAST(top_doc_id AS BIGINT)", "CAST(top_score AS DOUBLE)",
                     "CAST(n_results AS BIGINT)", "response"], outdir)
    if "q32" in which:
        rows = lab1_pricematch(con, sfdir)
        ok &= check("q32_lab1_pricematch", con, rows,
                    "order_id BIGINT, customer_name VARCHAR, nation_name VARCHAR, "
                    "order_price VARCHAR, agent_status VARCHAR, "
                    "agent_response VARCHAR, verdict VARCHAR",
                    ["CAST(order_id AS BIGINT)", "customer_name", "nation_name",
                     "order_price", "agent_status", "agent_response", "verdict"],
                    outdir)
    if "q35" in which:
        # lab4's Config(.., confidencePercentage = 95.0): z via the
        # transcribed Acklam invCdf — repr round-trips, so the SQL literal
        # parses back to the engine's exact double
        z = gaussian_inv_cdf(0.5 + 95.0 / 200.0)
        rows = lab4_fraud(con, sfdir, repr(z))
        ok &= check("q35_lab4_fraud", con, rows,
                    "claim_id BIGINT, claim_city VARCHAR, claim_amount DOUBLE, "
                    "agent_status VARCHAR, verdict VARCHAR",
                    ["CAST(claim_id AS BIGINT)", "claim_city",
                     "CAST(claim_amount AS DOUBLE)", "agent_status", "verdict"],
                    outdir)
    print(f"{'PASS' if ok else 'FAIL'} ({time.time()-t0:.0f}s total)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
