"""Block-70 operators: sitemap coverage audit, rate-limit header
consumption, bitext candidate mining."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from collections import defaultdict

from genesis_spark.queries import (q_corpus_bitext_mine,
                                   q_host_sitemap_coverage,
                                   q_http_ratelimit)

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]


def test_sitemap_coverage_golden(spark):
    pairs = defaultdict(lambda: [0, 0])
    for k in _orders(spark):
        d = pairs[(f"h{k % 20}", f"/p{k % 97}")]
        d[0] |= int((k // 20) % 2 == 0)
        d[1] |= int((k // 20) % 3 > 0)
    exp = defaultdict(lambda: [0, 0, 0, 0])
    for (host, _), (d, f) in pairs.items():
        e = exp[host]
        e[0] += d
        e[1] += f
        e[2] += d * f
        e[3] += int(f == 1 and d == 0)
    got = {r["host"]: r for r in
           q_host_sitemap_coverage(spark, SF).collect()}
    assert set(got) == set(exp)
    for host, (nd, nf, nb, no) in exp.items():
        r = got[host]
        assert (r["n_declared"], r["n_fetched"], r["n_both"],
                r["n_orphan"]) == (nd, nf, nb, no)
        assert r["coverage_ppm"] == nb * 10**6 // nd


def test_ratelimit_plan_golden(spark):
    exp = {}
    for k in _orders(spark):
        host, v = f"h{k % 25}", k % 6
        ts = 1000000 + (k % 500) * 7
        resume = None
        if v == 0:
            resume = ts + 30 + k % 90
        elif v == 1:
            resume = ts + 120 + k % 60
        e = exp.setdefault(host, [0, 0, -1])
        e[0] += 1
        e[1] += int(v <= 1)
        if resume is not None:
            e[2] = max(e[2], resume)
    got = {r["host"]: r for r in q_http_ratelimit(spark, SF).collect()}
    assert set(got) == set(exp)
    for host, (n, n429, until) in exp.items():
        r = got[host]
        assert (r["n_responses"], r["n_429"], r["backoff_until"],
                r["throttled"]) == (n, n429, until, int(n429 > 0))


def test_bitext_pairs_gated_by_ratio(spark):
    rows = q_corpus_bitext_mine(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["lang_b"] in ("de", "fr")
        assert (r["stem"], r["lang_b"]) not in seen  # one rep per pair
        seen.add((r["stem"], r["lang_b"]))
        lo, hi = sorted((r["tok_en"], r["tok_b"]))
        assert r["ratio_ppm"] == lo * 10**6 // hi >= 500_000
        # representative = min key per (stem, lang): en docs are
        # k%3==0, so doc_en % 3 == 0 and stems match their keys
        assert r["doc_en"] % 3 == 0 and r["doc_en"] % 80 == r["stem"]
    # the gate must actually reject something at this SF
    all_pairs = 80 * 2
    assert len(rows) < all_pairs
