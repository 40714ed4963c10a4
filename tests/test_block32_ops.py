"""Closed-form modularity check on a two-clique graph, and cap-rule
assertions for domain frequency capping."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from genesis_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_modularity_two_cliques_closed_form():
    # Two 4-cliques + one bridge, perfect partition: replay the exact
    # integer contract (q4m2 contribution = 2*m*w_c - d_c^2) in Python.
    import itertools
    edges = set()
    for grp in (["a1", "a2", "a3", "a4"], ["b1", "b2", "b3", "b4"]):
        for x, y in itertools.combinations(grp, 2):
            edges.add((x, y))
    edges.add(("a4", "b1"))
    m = len(edges)                      # 13 undirected edges
    comm = {n: n[0] for e in edges for n in e}
    w_c = {"a": 0, "b": 0}
    d_c = {"a": 0, "b": 0}
    for x, y in edges:
        if comm[x] == comm[y]:
            w_c[comm[x]] += 2           # sym endpoints count
        d_c[comm[x]] += 1
        d_c[comm[y]] += 1
    contribs = {c: 2 * m * w_c[c] - d_c[c] ** 2 for c in w_c}
    q = sum(contribs.values()) / (4 * m * m)
    # known value: two near-disjoint cliques are strongly modular
    assert 0.35 < q < 0.5
    assert contribs["a"] == 2 * 13 * 12 - 13 ** 2
    assert contribs["b"] == 2 * 13 * 12 - 13 ** 2


def test_modularity_driver_row_invariants(spark):
    rows = Q.q_graph_modularity(spark, SF).collect()
    labels = Q.q_graph_label_prop(spark, SF).collect()
    n_comms = len({r["community"] for r in labels})
    assert len(rows) == n_comms
    # sum of community degrees = 2m; within-endpoints never exceed degrees
    total_d = sum(r["d_c"] for r in rows)
    assert total_d % 2 == 0
    for r in rows:
        assert 0 <= r["w_c"] <= r["d_c"]
        assert r["q4m2_contrib"] == (total_d // 2) * 2 * r["w_c"] \
            - r["d_c"] ** 2


def test_domain_cap_limits_and_ordering(spark):
    rows = Q.q_corpus_domain_cap(spark, SF).collect()
    from collections import defaultdict
    per = defaultdict(list)
    for r in rows:
        per[r["domain"]].append(r)
    for dom, rs in per.items():
        assert len(rs) <= 8
        rs.sort(key=lambda r: r["rk"])
        # kept docs are the longest-first prefix
        chars = [r["n_chars"] for r in rs]
        assert chars == sorted(chars, reverse=True)
        assert all(r["domain_total"] == rs[0]["domain_total"] for r in rs)
        if rs[0]["domain_total"] > 8:
            assert len(rs) == 8
