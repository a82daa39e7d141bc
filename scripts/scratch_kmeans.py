#!/usr/bin/env python3
"""Scratch harness for the fixed-point Lloyd oracle CTE chains.

Validates, against /tmp/quantizer_dump.json (graft.tools.DumpQuantizer —
the Scala trainers' actual output):
  1. a direct python mirror of the fixed-point spherical/L2 trainers
     (including the XXH64 hashLong sample order), and
  2. the generated DuckDB CTE chain (iterated here before it is wired
     into ExtensionQueries as oracle SQL).
"""
import json
import sys
from decimal import Decimal, ROUND_HALF_UP

import duckdb

M64 = (1 << 64) - 1
P1, P2, P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
P4, P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5


def rotl(v, r):
    return ((v << r) | (v >> (64 - r))) & M64


def hash_long(x, seed=42):
    # Spark XXH64.hashLong(long, seed): one 8-byte lane + avalanche
    h0 = (seed + P5 + 8) & M64
    v = x & M64
    v = (v * P2) & M64
    v = rotl(v, 31)
    v = (v * P1) & M64
    v = (v ^ h0) & M64
    v = rotl(v, 27)
    v = (v * P1 + P4) & M64
    v ^= v >> 33
    v = (v * P2) & M64
    v ^= v >> 29
    v = (v * P3) & M64
    v ^= v >> 32
    return v - (1 << 64) if v >= (1 << 63) else v  # signed


def scale_elem(d):
    q = Decimal(repr(d)).quantize(Decimal("1.00000"), rounding=ROUND_HALF_UP)
    return int(q * 100000)


def div_half_up(num, den):
    s = -1 if num < 0 else 1
    return s * ((s * num * 2 + den) // (2 * den))


def isqrt_exact(n):
    import math
    r = int(math.sqrt(float(n)))
    while r > 0 and r * r > n:
        r -= 1
    while (r + 1) * (r + 1) <= n:
        r += 1
    return r


ELEM, CENT = 100000, 1000000


def spherical(scaled, k, iters=8):
    def rescale(mu):
        n = sum(m * m for m in mu)
        if n == 0:
            return None
        isq = isqrt_exact(n)
        return [div_half_up(m * CENT, isq) for m in mu]

    init, seen = [], set()
    for v in scaled:
        if len(init) >= k:
            break
        t = tuple(v)
        if t not in seen:
            seen.add(t)
            r = rescale(v)
            if r is not None:
                init.append(r)
    cents = init
    for _ in range(iters):
        sums = [[0] * len(scaled[0]) for _ in cents]
        counts = [0] * len(cents)
        for x in scaled:
            best, bd = 0, None
            for c, cv in enumerate(cents):
                d = sum(a * b for a, b in zip(x, cv))
                if bd is None or d > bd:
                    bd, best = d, c
            for i, a in enumerate(x):
                sums[best][i] += a
            counts[best] += 1
        nxt = []
        for c, old in enumerate(cents):
            if counts[c] == 0:
                nxt.append(old)
            else:
                mu = [div_half_up(s, counts[c]) for s in sums[c]]
                r = rescale(mu)
                nxt.append(old if r is None else r)
        cents = nxt
    return cents


def kmeans_l2(scaled, k, iters=10):
    init, seen = [], set()
    for p in scaled:
        if len(init) >= k:
            break
        t = tuple(p)
        if t not in seen:
            seen.add(t)
            init.append(list(p))
    cents = init
    for _ in range(iters):
        sums = [[0] * len(scaled[0]) for _ in cents]
        counts = [0] * len(cents)
        for p in scaled:
            best, bd = 0, None
            for c, cv in enumerate(cents):
                d = sum((a - b) * (a - b) for a, b in zip(p, cv))
                if bd is None or d < bd:
                    bd, best = d, c
            for i, a in enumerate(p):
                sums[best][i] += a
            counts[best] += 1
        cents = [
            old if counts[c] == 0
            else [div_half_up(s, counts[c]) for s in sums[c]]
            for c, old in enumerate(cents)
        ]
    return cents


def f32(x):
    import struct
    return struct.unpack("f", struct.pack("f", x))[0]


def main(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "WHERE embedding IS NOT NULL").fetchall()
    # hash-ordered sample (signed xxhash64 ascending)
    ordered = sorted(rows, key=lambda r: hash_long(r[0]))
    dump = json.load(open("/tmp/quantizer_dump.json"))

    # --- python mirror: spherical over first 1024 --------------------------
    km_sample = ordered[: 32 * 32]
    scaled = [[scale_elem(float(v)) for v in r[1]] for r in km_sample]
    scaled = [v for v in scaled if any(x != 0 for x in v)]
    cents = spherical(scaled, 32, 8)
    got = [[f32(c / CENT) for c in cv] for cv in cents]
    want = [d["f"] for d in dump["centroids"]]
    assert len(got) == len(want), (len(got), len(want))
    for c, (g, w) in enumerate(zip(got, want)):
        for i, (a, b) in enumerate(zip(g, w)):
            assert f32(a) == f32(b), (c, i, a, b)
    print("python spherical mirror == Scala dump")

    # --- python mirror: PQ codebooks over first 1024 -----------------------
    pq_sample = ordered[: 16 * 64]
    m, ksub, dsub = 8, 16, len(rows[0][1]) // 8
    for j in range(m):
        sub = [[scale_elem(float(v)) for v in r[1][j * dsub:(j + 1) * dsub]]
               for r in pq_sample]
        cb = kmeans_l2(sub, ksub, 10)
        gotb = [[f32(c / ELEM) for c in cv] for cv in cb]
        wantb = dump["codebooks"][j]
        assert len(gotb) == len(wantb), (j, len(gotb), len(wantb))
        for ci, (g, w) in enumerate(zip(gotb, wantb)):
            for i, (a, b) in enumerate(zip(g, w)):
                assert f32(a) == f32(b), (j, ci, i, a, b)
    print("python L2 codebook mirror == Scala dump")
    return con, ordered, cents, dump


# --- DuckDB CTE chain (the SQL that becomes the oracle generator) ---------

def hl_cte():
    """hashLong(vec_id, 42) chain -> sampled(vec_id, rnk); mirrors
    pqInitOracle's validated HUGEINT machinery."""
    M = "18446744073709551616::HUGEINT"
    S = "9223372036854775808::HUGEINT"

    def mulmod(a, p):
        return (f"((({a}) % 4294967296::HUGEINT) * {p}::HUGEINT"
                f" + ((({a}) // 4294967296::HUGEINT) * {p}::HUGEINT"
                f" % 4294967296::HUGEINT) * 4294967296::HUGEINT) % {M}")

    def rotl_s(v, r):
        lo = 1 << r
        hi = (1 << (64 - r))
        return f"((({v}) * {lo}::HUGEINT) % {M} + ({v}) // {hi}::HUGEINT)"

    def to_s(u):
        return f"CAST(({u}) - CASE WHEN ({u}) >= {S} THEN {M} ELSE 0::HUGEINT END AS BIGINT)"

    def to_u(x):
        return f"(CAST(({x}) AS HUGEINT) + CASE WHEN ({x}) < 0 THEN {M} ELSE 0::HUGEINT END)"

    def xor_u(a, b):
        return to_u(f"xor({to_s(a)}, {to_s(b)})")

    def xor_shift(u, sh):
        return to_u(f"xor({to_s(u)}, CAST(({u}) // {1 << sh}::HUGEINT AS BIGINT))")

    p1, p2, p3, p4 = ("11400714785074694791", "14029467366897019727",
                      "1609587929392839161", "9650029242287828579")
    h0 = str((42 + 0x27D4EB2F165667C5 + 8) & M64)
    steps = [
        mulmod("v", p2), rotl_s("v", 31), mulmod("v", p1),
        xor_u("v", f"{h0}::HUGEINT"), rotl_s("v", 27),
        f"({mulmod('v', p1)} + {p4}::HUGEINT) % {M}",
        xor_shift("v", 33), mulmod("v", p2), xor_shift("v", 29),
        mulmod("v", p3), xor_shift("v", 32),
    ]
    chain = ",\n".join(
        f"hl{i + 1} AS (SELECT vec_id, {e} AS v FROM "
        f"{'hl0' if i == 0 else f'hl{i}'})"
        for i, e in enumerate(steps))
    return (f"hl0 AS (SELECT vec_id, CAST(vec_id AS HUGEINT) AS v FROM vecs),\n"
            f"{chain},\n"
            f"sampled AS (SELECT vec_id, row_number() OVER (ORDER BY "
            f"{to_s('v')}) AS rnk FROM hl{len(steps)})")


def halfup(num, den):
    return (f"CASE WHEN ({num}) < 0 THEN -(((-({num})) * 2 + ({den})) // (2 * ({den})))"
            f" ELSE (({num}) * 2 + ({den})) // (2 * ({den})) END")


def kmeans_ctes(k=32, iters=8, sample_n=1024, cent_scale=1000000):
    """CTEs: svecs -> c0..c{iters} (cid, i0, cv) fixed-point spherical."""
    isq_corr = ("CASE WHEN (t0 + 1) * (t0 + 1) <= n2 THEN t0 + 1 "
                "WHEN t0 * t0 > n2 THEN t0 - 1 ELSE t0 END")
    parts = [f"""svecs AS MATERIALIZED (
      SELECT r.rnk, list_transform(v.embedding, x ->
        CAST(CAST(CAST(CAST(x AS DOUBLE) AS VARCHAR) AS DECIMAL(18,5)) * 100000 AS BIGINT)) AS sv
      FROM vecs v JOIN sampled r ON v.vec_id = r.vec_id AND r.rnk <= {sample_n}),
    selems AS MATERIALIZED (
      SELECT rnk, generate_subscripts(sv, 1) - 1 AS i0, unnest(sv) AS sx
      FROM (SELECT rnk, sv FROM svecs
            WHERE list_reduce(list_transform(sv, x -> abs(x)), (a, b) -> a + b) > 0)),
    kinit0 AS (SELECT sv, min(rnk) AS mr FROM svecs
      WHERE list_reduce(list_transform(sv, x -> abs(x)), (a, b) -> a + b) > 0
      GROUP BY sv),
    kinit1 AS (SELECT sv, row_number() OVER (ORDER BY mr) - 1 AS cid
      FROM kinit0 QUALIFY cid < {k}),
    kinit2 AS (SELECT cid, generate_subscripts(sv, 1) - 1 AS i0, unnest(sv) AS mu,
      list_reduce(list_transform(sv, x -> x * x), (a, b) -> a + b) AS n2
      FROM kinit1),
    kinit3 AS (SELECT cid, i0, mu, n2,
      CAST(floor(sqrt(CAST(n2 AS DOUBLE))) AS BIGINT) AS t0 FROM kinit2),
    c0 AS MATERIALIZED (SELECT cid, i0,
      {halfup(f'mu * {cent_scale}', isq_corr)} AS cv
      FROM kinit3)"""]
    for it in range(1, iters + 1):
        p = it - 1
        parts.append(f"""kd{it} AS (SELECT s.rnk, c.cid, sum(s.sx * c.cv) AS d
      FROM selems s JOIN c{p} c USING (i0) GROUP BY 1, 2),
    ka{it} AS MATERIALIZED (SELECT rnk, cid FROM (
      SELECT rnk, cid, row_number() OVER (PARTITION BY rnk ORDER BY d DESC, cid) AS rn
      FROM kd{it}) WHERE rn = 1),
    km{it} AS (SELECT a.cid, s.i0, sum(s.sx) AS sv, count(*) AS m
      FROM ka{it} a JOIN selems s USING (rnk) GROUP BY 1, 2),
    kmu{it} AS (SELECT cid, i0, {halfup('sv', 'm')} AS mu FROM km{it}),
    kn{it} AS (SELECT cid, sum(mu * mu) AS n2 FROM kmu{it} GROUP BY 1),
    kq{it} AS (SELECT cid, n2, CAST(floor(sqrt(CAST(n2 AS DOUBLE))) AS BIGINT) AS t0
      FROM kn{it} WHERE n2 > 0),
    kw{it} AS (SELECT cid, {isq_corr} AS isq FROM kq{it}),
    ku{it} AS (SELECT mu.cid, mu.i0, {halfup(f'mu.mu * {cent_scale}', 'w.isq')} AS cv
      FROM kmu{it} mu JOIN kw{it} w USING (cid)),
    c{it} AS MATERIALIZED (SELECT c.cid, c.i0, COALESCE(u.cv, c.cv) AS cv
      FROM c{p} c LEFT JOIN ku{it} u ON u.cid = c.cid AND u.i0 = c.i0)""")
    return ",\n    ".join(parts)


def check_kmeans_sql(sf_dir="/root/testdata/sf0.01"):
    con, ordered, cents, dump = main(sf_dir)
    sql = f"""WITH vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'
        WHERE embedding IS NOT NULL),
    {hl_cte()},
    {kmeans_ctes()}
    SELECT cid, i0, cv FROM c8 ORDER BY cid, i0"""
    got = con.execute(sql).fetchall()
    want = {(c, i): v for c, cv in enumerate(cents) for i, v in enumerate(cv)}
    assert len(got) == len(want), (len(got), len(want))
    bad = [(c, i, v, want[(c, i)]) for c, i, v in got if want[(c, i)] != v]
    assert not bad, bad[:5]
    print("DuckDB kmeans CTE chain == python mirror (exact integers)")




def ivf_tail(k=10, n_probe=8, spill_delta=0.4, spill_cap=6, cent_scale=1000000):
    """q_ann_ivf downstream: float conversion, SPANN spill assignment,
    probe list ranking, exact-cosine rerank — all ordered folds mirroring
    the native kernels' left-to-right double accumulation."""
    fold = lambda ex: f"list_reduce({ex}, (a, b) -> a + b)"
    dotf = lambda A, B: fold(f"list_transform(range(64), t -> {A}[t + 1] * {B}[t + 1])")
    sq = lambda A: fold(f"list_transform({A}, x -> x * x)")
    return f"""kcf AS MATERIALIZED (
      SELECT cid, list_transform(list(cv ORDER BY i0), x ->
        CAST(CAST(CAST(x AS DOUBLE) / {cent_scale}.0 AS FLOAT) AS DOUBLE)) AS fl
      FROM c8 GROUP BY cid),
    kcu AS MATERIALIZED (
      SELECT cid, list_transform(fl, x -> x / sqrt({sq('fl')})) AS ul
      FROM kcf),
    vl AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dl
      FROM vecs),
    vdots AS (SELECT v.vec_id, c.cid, {dotf('v.dl', 'c.ul')} AS d,
                     sqrt({sq('v.dl')}) AS nv
              FROM vl v, kcu c),
    vcos AS MATERIALIZED (
      SELECT vec_id, cid, d / nv AS cs FROM vdots WHERE nv > 0),
    vbest AS (SELECT vec_id, max(cs) AS best FROM vcos GROUP BY 1),
    assigned AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, v.cid, row_number() OVER (
          PARTITION BY v.vec_id ORDER BY v.cs DESC, v.cid) AS rn
        FROM vcos v JOIN vbest b USING (vec_id)
        WHERE v.cs >= b.best - {spill_delta}) WHERE rn <= {spill_cap}),
    probes AS (SELECT vec_id AS q_id, dl AS ql FROM vl WHERE vec_id < 3),
    pdots AS (SELECT p.q_id, c.cid,
                {dotf('p.ql', 'c.fl')} / (sqrt({sq('p.ql')}) * sqrt({sq('c.fl')})) AS cs
              FROM probes p, kcf c),
    plists AS (SELECT q_id, cid FROM (
        SELECT q_id, cid, row_number() OVER (
          PARTITION BY q_id ORDER BY cs DESC, cid) AS rn
        FROM pdots) WHERE rn <= {n_probe}),
    cand AS (SELECT DISTINCT p.q_id, a.vec_id
             FROM plists p JOIN assigned a USING (cid)
             WHERE a.vec_id <> p.q_id),
    rer AS (SELECT c.q_id, c.vec_id,
              {dotf('p.ql', 'v.dl')} / (sqrt({sq('p.ql')}) * sqrt({sq('v.dl')})) AS cs
            FROM cand c
            JOIN probes p ON p.q_id = c.q_id
            JOIN vl v ON v.vec_id = c.vec_id)
    SELECT q_id, vec_id, round(cs, 4) AS cosine
    FROM (SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rn
          FROM rer) r
    WHERE rn <= {k} ORDER BY q_id, vec_id"""


def check_ivf_sql(sf_dir="/root/testdata/sf0.01",
                  spark_out="/tmp/vq_ann/q_ann_ivf"):
    con = duckdb.connect()
    sql = f"""WITH vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'
        WHERE embedding IS NOT NULL),
    {hl_cte()},
    {kmeans_ctes()},
    {ivf_tail()}"""
    got = con.execute(sql).fetchall()
    want = con.execute(
        f"SELECT q_id, vec_id, cosine FROM '{spark_out}/*.parquet' "
        "ORDER BY q_id, vec_id").fetchall()
    assert len(got) == len(want), (len(got), len(want))
    bad = [(g, w) for g, w in zip(got, want) if g != w]
    assert not bad, bad[:5]
    print(f"DuckDB q_ann_ivf replay == Spark output ({len(got)} rows)")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "sql":
        check_kmeans_sql()
    elif mode == "ivf":
        check_ivf_sql()
    else:
        main(mode or "/root/testdata/sf0.01")


def pq_ctes(m=8, ksub=16, dsub=8, iters=10, sample_n=1024):
    """Per-subspace fixed-point L2 Lloyd: ssubs -> cb0..cb{iters}
    (j, ci, scaled-long codeword list) for all m subspaces at once."""
    parts = [f"""ssubs AS MATERIALIZED (
      SELECT r.rnk, u.j, list_transform(range({dsub}), t ->
        CAST(CAST(CAST(CAST(v.embedding[u.j * {dsub} + t + 1] AS DOUBLE)
             AS VARCHAR) AS DECIMAL(18,5)) * 100000 AS BIGINT)) AS ssv
      FROM vecs v
      JOIN sampled r ON v.vec_id = r.vec_id AND r.rnk <= {sample_n},
           unnest(range({m})) AS u(j)),
    cb0 AS MATERIALIZED (
      SELECT j, ssv, row_number() OVER (PARTITION BY j ORDER BY mr) - 1 AS ci
      FROM (SELECT j, ssv, min(rnk) AS mr FROM ssubs GROUP BY j, ssv)
      QUALIFY row_number() OVER (PARTITION BY j ORDER BY mr) <= {ksub})"""]
    dist = (f"list_reduce(list_transform(range({dsub}), t -> "
            f"(s.ssv[t + 1] - c.ssv[t + 1]) * (s.ssv[t + 1] - c.ssv[t + 1])), "
            f"(a, b) -> a + b)")
    for it in range(1, iters + 1):
        p = it - 1
        parts.append(f"""pa{it} AS MATERIALIZED (SELECT rnk, j, ci FROM (
      SELECT s.rnk, s.j, c.ci, row_number() OVER (
        PARTITION BY s.rnk, s.j ORDER BY {dist} ASC, c.ci) AS rn
      FROM ssubs s JOIN cb{p} c USING (j)) WHERE rn = 1),
    ps{it} AS (SELECT a.j, a.ci, t.t AS ti,
        sum(s.ssv[t.t + 1]) AS sv, count(*) AS cnt
      FROM pa{it} a JOIN ssubs s USING (rnk, j), unnest(range({dsub})) AS t(t)
      GROUP BY 1, 2, 3),
    pmu{it} AS (SELECT j, ci, list({halfup('sv', 'cnt')} ORDER BY ti) AS ssv
      FROM ps{it} GROUP BY 1, 2),
    cb{it} AS MATERIALIZED (SELECT c.j, c.ci, COALESCE(n.ssv, c.ssv) AS ssv
      FROM cb{p} c LEFT JOIN pmu{it} n ON n.j = c.j AND n.ci = c.ci)""")
    return ",\n    ".join(parts)


def pq_tail(m=8, ksub=16, dsub=8, iters=10, k=10, rerank=16):
    fold = lambda ex: f"list_reduce({ex}, (a, b) -> a + b)"
    sq = lambda A: fold(f"list_transform({A}, x -> x * x)")
    dotn = lambda A, B, n: fold(
        f"list_transform(range({n}), t -> {A}[t + 1] * {B}[t + 1])")
    top = k * rerank
    return f"""cbf AS MATERIALIZED (
      SELECT j, ci, list_transform(ssv, x ->
        CAST(CAST(CAST(x AS DOUBLE) / 100000.0 AS FLOAT) AS DOUBLE)) AS sv
      FROM cb{iters}),
    subs AS MATERIALIZED (
      SELECT v.vec_id, u.j, list_transform(range({dsub}), t ->
        CAST(v.embedding[u.j * {dsub} + t + 1] AS DOUBLE)) AS sv
      FROM vecs v, unnest(range({m})) AS u(j)),
    scores AS MATERIALIZED (
      SELECT s.vec_id, s.j, c.ci,
             {sq('c.sv')} - 2.0 * {dotn('s.sv', 'c.sv', dsub)} AS sc
      FROM subs s JOIN cbf c USING (j)),
    codes AS MATERIALIZED (
      SELECT vec_id, j, ci AS code FROM (
        SELECT vec_id, j, ci, row_number() OVER (
          PARTITION BY vec_id, j ORDER BY sc, ci) AS rn
        FROM scores) WHERE rn = 1),
    adcp AS (SELECT q.vec_id AS q_id, c.vec_id,
               list_reduce(list(q.sc ORDER BY q.j), (a, b) -> a + b) AS adc
             FROM codes c JOIN scores q
               ON q.j = c.j AND q.ci = c.code AND q.vec_id < 3
             WHERE c.vec_id <> q.vec_id
             GROUP BY 1, 2),
    survivors AS (SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id, row_number() OVER (
          PARTITION BY q_id ORDER BY adc, vec_id) AS rn
        FROM adcp) WHERE rn <= {top}),
    vl AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dl
      FROM vecs),
    rer AS (SELECT s.q_id, s.vec_id,
              {dotn('p.dl', 'v.dl', 64)} / (sqrt({sq('p.dl')}) * sqrt({sq('v.dl')})) AS cs
            FROM survivors s
            JOIN vl p ON p.vec_id = s.q_id
            JOIN vl v ON v.vec_id = s.vec_id)
    SELECT q_id, vec_id, round(cs, 4) AS cosine
    FROM (SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rn
          FROM rer) r
    WHERE rn <= {k} ORDER BY q_id, vec_id"""


def check_pq_sql(sf_dir="/root/testdata/sf0.01",
                 spark_out="/tmp/vq_ann/q_ann_pq"):
    con = duckdb.connect()
    sql = f"""WITH vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'
        WHERE embedding IS NOT NULL),
    {hl_cte()},
    {pq_ctes()},
    {pq_tail()}"""
    got = con.execute(sql).fetchall()
    want = con.execute(
        f"SELECT q_id, vec_id, cosine FROM '{spark_out}/*.parquet' "
        "ORDER BY q_id, vec_id").fetchall()
    assert len(got) == len(want), (len(got), len(want))
    bad = [(g, w) for g, w in zip(got, want) if g != w]
    assert not bad, bad[:5]
    print(f"DuckDB q_ann_pq replay == Spark output ({len(got)} rows)")


def ivfpq_check(sf_dir="/root/testdata/sf0.01",
                spark_out="/tmp/vq_ann/q_ann_ivfpq"):
    """IVFADC: spilled kmeans lists x PQ-ADC scoring, rerank 16k."""
    fold = lambda ex: f"list_reduce({ex}, (a, b) -> a + b)"
    sq = lambda A: fold(f"list_transform({A}, x -> x * x)")
    dotn = lambda A, B, n: fold(
        f"list_transform(range({n}), t -> {A}[t + 1] * {B}[t + 1])")
    k, rerank, n_probe, spill_delta, spill_cap = 10, 16, 8, 0.4, 6
    con = duckdb.connect()
    sql = f"""WITH vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'
        WHERE embedding IS NOT NULL),
    {hl_cte()},
    {kmeans_ctes()},
    {pq_ctes()},
    kcf AS MATERIALIZED (
      SELECT cid, list_transform(list(cv ORDER BY i0), x ->
        CAST(CAST(CAST(x AS DOUBLE) / 1000000.0 AS FLOAT) AS DOUBLE)) AS fl
      FROM c8 GROUP BY cid),
    kcu AS MATERIALIZED (
      SELECT cid, list_transform(fl, x -> x / sqrt({sq('fl')})) AS ul
      FROM kcf),
    vl AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dl
      FROM vecs),
    vdots AS (SELECT v.vec_id, c.cid, {dotn('v.dl', 'c.ul', 64)} AS d,
                     sqrt({sq('v.dl')}) AS nv
              FROM vl v, kcu c),
    vcos AS MATERIALIZED (
      SELECT vec_id, cid, d / nv AS cs FROM vdots WHERE nv > 0),
    vbest AS (SELECT vec_id, max(cs) AS best FROM vcos GROUP BY 1),
    assigned AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, v.cid, row_number() OVER (
          PARTITION BY v.vec_id ORDER BY v.cs DESC, v.cid) AS rn
        FROM vcos v JOIN vbest b USING (vec_id)
        WHERE v.cs >= b.best - {spill_delta}) WHERE rn <= {spill_cap}),
    probes AS (SELECT vec_id AS q_id, dl AS ql FROM vl WHERE vec_id < 3),
    pdots AS (SELECT p.q_id, c.cid,
                {dotn('p.ql', 'c.fl', 64)} / (sqrt({sq('p.ql')}) * sqrt({sq('c.fl')})) AS cs
              FROM probes p, kcf c),
    plists AS (SELECT q_id, cid FROM (
        SELECT q_id, cid, row_number() OVER (
          PARTITION BY q_id ORDER BY cs DESC, cid) AS rn
        FROM pdots) WHERE rn <= {n_probe}),
    cbf AS MATERIALIZED (
      SELECT j, ci, list_transform(ssv, x ->
        CAST(CAST(CAST(x AS DOUBLE) / 100000.0 AS FLOAT) AS DOUBLE)) AS sv
      FROM cb10),
    subs AS MATERIALIZED (
      SELECT v.vec_id, u.j, list_transform(range(8), t ->
        CAST(v.embedding[u.j * 8 + t + 1] AS DOUBLE)) AS sv
      FROM vecs v, unnest(range(8)) AS u(j)),
    scores AS MATERIALIZED (
      SELECT s.vec_id, s.j, c.ci,
             {sq('c.sv')} - 2.0 * {dotn('s.sv', 'c.sv', 8)} AS sc
      FROM subs s JOIN cbf c USING (j)),
    codes AS MATERIALIZED (
      SELECT vec_id, j, ci AS code FROM (
        SELECT vec_id, j, ci, row_number() OVER (
          PARTITION BY vec_id, j ORDER BY sc, ci) AS rn
        FROM scores) WHERE rn = 1),
    cand AS (SELECT DISTINCT p.q_id, a.vec_id
             FROM plists p JOIN assigned a USING (cid)
             WHERE a.vec_id <> p.q_id),
    adcp AS (SELECT n.q_id, n.vec_id,
               list_reduce(list(q.sc ORDER BY q.j), (a, b) -> a + b) AS adc
             FROM cand n
             JOIN codes c ON c.vec_id = n.vec_id
             JOIN scores q ON q.vec_id = n.q_id
               AND q.j = c.j AND q.ci = c.code
             GROUP BY 1, 2),
    survivors AS (SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id, row_number() OVER (
          PARTITION BY q_id ORDER BY adc, vec_id) AS rn
        FROM adcp) WHERE rn <= {k * rerank}),
    rer AS (SELECT s.q_id, s.vec_id,
              {dotn('p.dl', 'v.dl', 64)} / (sqrt({sq('p.dl')}) * sqrt({sq('v.dl')})) AS cs
            FROM survivors s
            JOIN vl p ON p.vec_id = s.q_id
            JOIN vl v ON v.vec_id = s.vec_id)
    SELECT q_id, vec_id, round(cs, 4) AS cosine
    FROM (SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rn
          FROM rer) r
    WHERE rn <= {k} ORDER BY q_id, vec_id"""
    got = con.execute(sql).fetchall()
    want = con.execute(
        f"SELECT q_id, vec_id, cosine FROM '{spark_out}/*.parquet' "
        "ORDER BY q_id, vec_id").fetchall()
    assert len(got) == len(want), (len(got), len(want))
    bad = [(g, w) for g, w in zip(got, want) if g != w]
    assert not bad, bad[:5]
    print(f"DuckDB q_ann_ivfpq replay == Spark output ({len(got)} rows)")


def kmeans_ctes_dyn(iters=8, cent_scale=1000000):
    """kmeans_ctes with DATA-DEPENDENT k: k = max(8, min(64, count/500)),
    sampleN = k*32 — the q_dedup_semdedup sizing rule."""
    base = kmeans_ctes(k=32, iters=iters, sample_n=1024, cent_scale=cent_scale)
    base = base.replace(
        "AND r.rnk <= 1024", "AND r.rnk <= (SELECT n FROM kparam)")
    base = base.replace(
        "QUALIFY cid < 32", "QUALIFY cid < (SELECT k FROM kparam)")
    return ("kparam AS (SELECT GREATEST(8, LEAST(64, count(*) // 500)) AS k, "
            "GREATEST(8, LEAST(64, count(*) // 500)) * 32 AS n FROM vecs),\n    "
            + base)


def semdedup_check(sf_dir="/root/testdata/sf0.01",
                   spark_out="/tmp/vq_ann/q_dedup_semdedup", eps=0.4):
    fold = lambda ex: f"list_reduce({ex}, (a, b) -> a + b)"
    sq = lambda A: fold(f"list_transform({A}, x -> x * x)")
    dotn = lambda A, B, n: fold(
        f"list_transform(range({n}), t -> {A}[t + 1] * {B}[t + 1])")
    con = duckdb.connect()
    sql = f"""WITH vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'
        WHERE embedding IS NOT NULL),
    {hl_cte()},
    {kmeans_ctes_dyn()},
    kcf AS MATERIALIZED (
      SELECT cid, list_transform(list(cv ORDER BY i0), x ->
        CAST(CAST(CAST(x AS DOUBLE) / 1000000.0 AS FLOAT) AS DOUBLE)) AS fl
      FROM c8 GROUP BY cid),
    kcu AS MATERIALIZED (
      SELECT cid, list_transform(fl, x -> x / sqrt({sq('fl')})) AS ul
      FROM kcf),
    vl AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dl
      FROM vecs),
    vdots AS (SELECT v.vec_id, c.cid, {dotn('v.dl', 'c.ul', 64)} AS d
              FROM vl v, kcu c),
    assigned AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (
          PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        FROM vdots) WHERE rn = 1),
    unitv AS MATERIALIZED (
      SELECT vec_id, list_transform(dl, x ->
        CAST(CAST(x / sqrt({sq('dl')}) AS FLOAT) AS DOUBLE)) AS ul
      FROM vl),
    dropped AS (
      SELECT DISTINCT a.vec_id
      FROM assigned a
      JOIN assigned b ON a.cid = b.cid AND b.vec_id < a.vec_id
      JOIN unitv u1 ON u1.vec_id = a.vec_id
      JOIN unitv u2 ON u2.vec_id = b.vec_id
      WHERE {dotn('u1.ul', 'u2.ul', 64)} >= {eps})
    SELECT a.vec_id, a.cid AS cluster_id
    FROM assigned a ANTI JOIN dropped d ON a.vec_id = d.vec_id
    ORDER BY a.vec_id"""
    got = con.execute(sql).fetchall()
    want = con.execute(
        f"SELECT vec_id, cluster_id FROM '{spark_out}/*.parquet' "
        "ORDER BY vec_id").fetchall()
    assert len(got) == len(want), (len(got), len(want))
    bad = [(g, w) for g, w in zip(got, want) if g != w]
    assert not bad, bad[:5]
    print(f"DuckDB q_dedup_semdedup replay == Spark output ({len(got)} rows)")
