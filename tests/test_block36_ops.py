"""Block-36 operators: conditional revalidation, anchor text, harmonic
centrality."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import duckdb

from genesis_spark.queries import (q_fetch_revalidate, q_graph_harmonic,
                                   q_host_anchor_text)

SF = "/root/testdata/sf0.001"


def _revalidate_python_replay(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, o_custkey FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    out = {}
    for k, c in rows:
        host = f"h{c % 40}"
        body = k % 4000 + 500
        has_prev = k % 3 != 0
        changed = k % 13 == 0
        if not has_prev:
            klass = "200_new"
        elif changed:
            klass = "200_changed"
        else:
            klass = "304"
        st = out.setdefault(host, [0, 0, 0, 0, 0, 0])
        st[0] += 1
        st[1] += klass == "304"
        st[2] += klass == "200_changed"
        st[3] += klass == "200_new"
        st[4] += body if klass == "304" else 0
        st[5] += body if klass != "304" else 0
    return {h: tuple(v) for h, v in out.items()}


def test_revalidate_matches_python_replay(spark):
    got = {r["host_key"]: (r["n_urls"], r["n_304"], r["n_changed"],
                           r["n_new"], r["bytes_saved"], r["bytes_fetched"])
           for r in q_fetch_revalidate(spark, SF).collect()}
    want = _revalidate_python_replay(SF)
    assert got == want
    # The protocol's point: conditional requests actually save bytes, and
    # every class is represented on the fixture.
    tot = [sum(v[i] for v in got.values()) for i in range(6)]
    assert tot[1] > 0 and tot[2] > 0 and tot[3] > 0
    assert tot[4] > 0  # bytes_saved nonzero -> 304s carry real weight
    assert all(v[1] + v[2] + v[3] == v[0] for v in got.values())


def _anchor_python_replay(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT p.p_partkey, p.p_name
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/part.parquet' p ON p.p_partkey = l.l_partkey"""
    ).fetchall()
    counts = {}
    for pk, name in rows:
        host = f"h{pk % 50}"
        for term in name.split(" "):
            if term:
                counts[(host, term)] = counts.get((host, term), 0) + 1
    by_host = {}
    for (host, term), n in counts.items():
        by_host.setdefault(host, []).append((term, n))
    out = {}
    for host, terms in by_host.items():
        terms.sort(key=lambda t: (-t[1], t[0]))
        for rk, (term, n) in enumerate(terms[:3], start=1):
            out[(host, rk)] = (term, n)
    return out


def test_anchor_text_matches_python_replay(spark):
    got = {(r["host_key"], r["rank"]): (r["term"], r["n"])
           for r in q_host_anchor_text(spark, SF).collect()}
    assert got == _anchor_python_replay(SF)
    # rank is dense 1..3 per host and counts are non-increasing in rank
    hosts = {h for h, _ in got}
    for h in hosts:
        ns = [got[(h, rk)][1] for rk in (1, 2, 3) if (h, rk) in got]
        assert ns == sorted(ns, reverse=True)


def _harmonic_python_replay(sf_dir):
    con = duckdb.connect()
    pairs = con.execute(
        f"SELECT o_orderkey, o_custkey FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    edges = set()
    for k, c in pairs:
        s, d = f"h{k % 50}", f"h{c % 50}"
        if s != d:
            edges.add((s, d))
    nodes = {n for e in edges for n in e}
    # BFS distances up to 3 from every source
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    score = dict.fromkeys(nodes, 0)
    for src in nodes:
        seen = {src}
        frontier = {src}
        for dist, w in ((1, 6), (2, 3), (3, 2)):
            frontier = {d for s in frontier for d in adj.get(s, ())} - seen
            seen |= frontier
            for d in frontier:
                score[d] += w
    return score


def test_harmonic_matches_python_replay(spark):
    got = {r["host_key"]: r["harmonic_x6"]
           for r in q_graph_harmonic(spark, SF).collect()}
    assert got == _harmonic_python_replay(SF)
    # On a connected-ish 50-host graph most nodes are reachable within 3
    # hops from many sources; the sixths encoding is exact, so every
    # score is an integer multiple of 1 with max <= 6 * (|V| - 1).
    assert max(got.values()) <= 6 * (len(got) - 1)
    assert any(v > 0 for v in got.values())
