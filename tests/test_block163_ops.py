"""Block-163 operator: alias-graph canonical resolution."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import q_url_alias_resolve

SF = "/root/testdata/sf0.001"


def test_alias_resolve_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    edges = set()
    for k in ks:
        b = k % 200
        base = f"https://h{b % 20}.example.com/p{b}"
        if k % 3 == 0:
            v = f"https://amp.h{b % 20}.example.com/p{b}"
        elif k % 3 == 1:
            v = f"https://m.h{b % 20}.example.com/p{b}"
        else:
            v = base + "?utm_source=x"
        edges.add((v, base))
        if b % 10 == 0:
            edges.add((base, f"https://h{b % 20}.example.com/canonical"
                             f"{b // 10}"))
    # union-find ground truth (exact components, any diameter)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, c in edges:
        ra, rc = find(a), find(c)
        if ra != rc:
            parent[ra] = rc
    comp = defaultdict(set)
    for u in parent:
        comp[find(u)].add(u)
    want = {}
    for members in comp.values():
        rep = min(members)
        for u in members:
            want[u] = (rep, len(members))

    got = {r.url: (r.canonical_rep, r.component_size)
           for r in q_url_alias_resolve(spark, SF).collect()}
    assert got == want
    # the composition is real: canonical-declaring bases form 2-hop
    # chains, so some component holds a canon + base + >=1 variant
    assert max(s for _, s in got.values()) >= 3
    # representatives are closed: every rep maps to itself
    assert all(got[rep][0] == rep for rep, _ in got.values())
