"""Block-120 operators: BM25 NDCG curve, entropy-based tracking-param
classification, 2-hop betweenness."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_graph_betweenness2, q_text_bm25_ndcg,
                                   q_url_param_entropy)

SF = "/root/testdata/sf0.001"


def test_bm25_ndcg_curve_properties_and_python_replay(spark):
    rows = sorted(q_text_bm25_ndcg(spark, SF).collect(),
                  key=lambda r: r.pos)
    assert [r.pos for r in rows] == list(range(1, 11))
    for r in rows:
        # rel = distinct matched query terms, graded 1..3
        assert 1 <= r.rel <= 3
        # ideal cumulative gain dominates the actual one
        assert r.idcg_u >= r.dcg_u
        assert 0.0 < r.ndcg <= 1.0
        want = math.floor(r.dcg_u * 1e4 / r.idcg_u + 0.5) / 1e4
        assert r.ndcg == want
    # position-1 gains: rel / log2(2) = rel exactly
    assert rows[0].gain_u == rows[0].rel * 1000000
    # cumulative sums are consistent across the curve
    run = 0
    for r in rows:
        run += r.gain_u
        assert r.dcg_u == run


def test_url_param_entropy_verdicts_and_replay(spark):
    import hashlib

    occ = defaultdict(list)              # (host, param) -> values
    keys = [r.o_orderkey for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    for k in keys:
        h = f"h{k % 20}"
        occ[(h, "id")].append(str(k % 50))
        occ[(h, "page")].append(str(k % 5))
        occ[(h, "utm_c")].append(
            hashlib.md5(str(k).encode()).hexdigest()[:12])
        if k % 2 == 0:
            occ[(h, "sid")].append(
                hashlib.md5(f"s{k}".encode()).hexdigest()[:12])

    got = {(r.host_key, r.param): r for r in
           q_url_param_entropy(spark, SF).collect()}
    assert set(got) == set(occ)
    for key, vals in occ.items():
        n, cnt = len(vals), Counter(vals)
        nd = len(cnt)
        sum_u = sum(round(c * math.log2(n / c) * 1e6)
                    for c in cnt.values())
        r = got[key]
        assert (r.n, r.nd) == (n, nd), key
        assert r.ratio_ppm == nd * 1000000 // n
        assert r.entropy_mu == sum_u // n
        want = "tracking" if nd * 2 > n and n >= 20 else "content"
        assert r.verdict == want, key
    # md5-unique params are always flagged, the 5-value vocab never is
    for h in {k for k, _ in occ}:
        assert got[(h, "utm_c")].verdict == "tracking"
        assert got[(h, "page")].verdict == "content"


def test_betweenness2_python_replay_and_broker_semantics(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey").collect()
    edges = {(f"h{r.o_orderkey % 50}", f"h{r.o_custkey % 50}")
             for r in df if r.o_orderkey % 50 != r.o_custkey % 50}
    out = defaultdict(lambda: defaultdict(int))   # (s,t) -> v -> 1
    for s, v in edges:
        for v2, t in edges:
            if v == v2 and s != t and (s, t) not in edges:
                out[(s, t)][v] += 1
    bc = defaultdict(lambda: [0, 0])
    for (s, t), mids in out.items():
        sigma = sum(mids.values())
        for v in mids:
            bc[v][0] += 1
            bc[v][1] += 1000000 // sigma
    got = {r.host: (r.n_pairs, r.bc_u) for r in
           q_graph_betweenness2(spark, SF).collect()}
    assert got == {v: tuple(x) for v, x in bc.items()}
    # per-pair credit never exceeds one full unit, and the fixture
    # actually spreads brokerage unevenly across hosts
    for v, (n_pairs, bc_u) in got.items():
        assert bc_u <= n_pairs * 1000000
    assert len({bc for _, bc in got.values()}) > 1
