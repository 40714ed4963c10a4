"""Block-79 operators: percent-encoding depth, freshness-decayed corpus
value, rich-club coefficient ladder."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import itertools

from genesis_spark.queries import (q_corpus_freshness_value,
                                   q_graph_rich_club, q_url_double_encoding)

SF = "/root/testdata/sf0.001"


def test_double_encoding_depth_golden(spark):
    got = {r["o_orderkey"]: r for r in
           q_url_double_encoding(spark, SF).collect()}
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    assert set(got) == set(keys)
    enc = {0: "%2520", 1: "%20", 2: "%252520", 3: "_"}
    depth = {0: 2, 1: 1, 2: 3, 3: 0}
    for k in keys:
        r = got[k]
        url = f"http://site{k % 30}.onion/a{enc[k % 4]}b{k}"
        assert r["url"] == url
        assert r["enc_depth"] == depth[k % 4]
        want_canon = (url.replace(enc[k % 4], " ")
                      if k % 4 != 3 else url)
        assert r["url_canonical"] == want_canon
        assert r["is_alias_risk"] == int(depth[k % 4] >= 2)
    # fully collapsed: no residual percent-encoding in any canonical form
    assert all("%2" not in r["url_canonical"] for r in got.values())


def test_freshness_value_decay_golden(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "source", "n_chars").collect()
    per = {}
    for r in docs:
        age = (r["doc_id"] * 3) % 180
        h = age // 30
        per.setdefault(r["source"], []).append(
            (r["n_chars"], r["n_chars"] >> h, h))
    got = {r["source"]: r for r in
           q_corpus_freshness_value(spark, SF).collect()}
    assert set(got) == set(per)
    for s, rows in per.items():
        r = got[s]
        base = sum(b for b, _, _ in rows)
        dec = sum(d for _, d, _ in rows)
        assert r["n_docs"] == len(rows)
        assert r["base_value"] == base
        assert r["decayed_value"] == dec
        assert r["n_stale"] == sum(1 for _, _, h in rows if h >= 3)
        assert r["retention_ppm"] == dec * 10**6 // base
        # decay is strict on this fixture (ages span all 6 buckets)
        assert dec < base


def test_rich_club_monotone_and_exact(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet") \
        .select("o_orderkey", "o_custkey").collect()
    edges = set()
    for r in orders:
        u = f"t{r['o_orderkey'] % 30}"
        v = f"t{(r['o_custkey'] % 30) % 20}"
        if u != v:
            edges.add((min(u, v), max(u, v)))
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    got = {r["k"]: r for r in q_graph_rich_club(spark, SF).collect()}
    assert set(got) == {2, 5, 10, 15}
    for k in (2, 5, 10, 15):
        club = {n for n, d in deg.items() if d > k}
        ek = sum(1 for a, b in edges if a in club and b in club)
        r = got[k]
        assert r["n_club"] == len(club)
        assert r["n_edges"] == ek
        if len(club) >= 2:
            assert r["phi_ppm"] == \
                2 * ek * 10**6 // (len(club) * (len(club) - 1))
        else:
            assert r["phi_ppm"] is None
    # club size shrinks monotonically with k
    sizes = [got[k]["n_club"] for k in (2, 5, 10, 15)]
    assert sizes == sorted(sizes, reverse=True)
