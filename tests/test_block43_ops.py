"""Block-43 operators: hop histogram, MRL truncation eval, DGA hosts."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
import math

import duckdb

from genesis_spark.queries import (q_embeddings_mrl_eval,
                                   q_frontier_dga_hosts,
                                   q_graph_hop_histogram)

SF = "/root/testdata/sf0.001"


def _bfs_levels(sf_dir):
    con = duckdb.connect()
    pairs = con.execute(
        f"SELECT o_orderkey, o_custkey FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    edges = {(f"h{k % 50}", f"h{c % 50}") for k, c in pairs
             if k % 50 != c % 50}
    nodes = {n for e in edges for n in e}
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    levels = {1: 0, 2: 0, 3: 0}
    for src in nodes:
        seen, frontier = {src}, {src}
        for d in (1, 2, 3):
            frontier = {x for f in frontier
                        for x in adj.get(f, ())} - seen
            seen |= frontier
            levels[d] += len(frontier)
    return levels, len(nodes)


def test_hop_histogram_matches_python_replay(spark):
    levels, n_nodes = _bfs_levels(SF)
    rows = {r["d"]: r for r in q_graph_hop_histogram(spark, SF).collect()}
    for d, n in levels.items():
        if n:
            assert rows[d]["n"] == n
        else:
            assert d not in rows
    n_reach = sum(levels.values())
    reach_ppm = n_reach * 10**6 // (n_nodes * (n_nodes - 1))
    c1, c2 = levels[1], levels[1] + levels[2]
    d90 = 1 if c1 * 10 >= n_reach * 9 else (
        2 if c2 * 10 >= n_reach * 9 else 3)
    for r in rows.values():
        assert r["reach_ppm"] == reach_ppm and r["d90"] == d90


def test_mrl_eval_matches_python_replay(spark):
    con = duckdb.connect()
    vecs = {int(v): [float(x) for x in e] for v, e in con.execute(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()}

    def cos(a, b):
        return (sum(x * y for x, y in zip(a, b)) /
                (math.sqrt(sum(x * x for x in a)) *
                 math.sqrt(sum(y * y for y in b))))

    want = {}
    for q in [v for v in vecs if v < 10]:
        others = [n for n in vecs if n != q]
        full = sorted(others,
                      key=lambda n: (-cos(vecs[q], vecs[n]), n))[:5]
        trunc = sorted(others,
                       key=lambda n: (-cos(vecs[q][:16], vecs[n][:16]),
                                      n))[:5]
        hits = len(set(full) & set(trunc))
        want[q] = (hits, hits * 10**6 // 5)
    got = {r["query_id"]: (r["n_hits"], r["recall_ppm"])
           for r in q_embeddings_mrl_eval(spark, SF).collect()}
    assert got == want
    # truncation to 1/4 of the dims on non-MRL vectors must lose SOME
    # neighbors somewhere (recall < 1 for at least one query) while
    # still finding some (recall > 0 overall)
    assert any(h < 5 for h, _ in got.values())
    assert sum(h for h, _ in got.values()) > 0


def test_dga_hosts_matches_python_replay(spark):
    con = duckdb.connect()
    keys = [int(r[0]) for r in con.execute(
        f"SELECT o_orderkey FROM '{SF}/orders.parquet'").fetchall()]
    agg = {}
    for k in keys:
        if k % 13 == 0:
            label = hashlib.md5(str(k).encode()).hexdigest()[:16]
        else:
            label = f"shop-{k % 100}-store"
        n = max(len(label), 1)
        v = sum(1 for ch in label if ch in "aeiou") * 10**6
        dd = sum(1 for ch in label if ch.isdigit()) * 10**6
        cls = ("dga" if (dd // n >= 250000 and v // n < 300000
                         and len(label) >= 12) else "benign")
        st = agg.setdefault(cls, [0, 0, 0, 0])
        st[0] += 1
        st[1] += len(label)
        st[2] += v // n
        st[3] += dd // n
    want = {c: (v[0], v[1] // v[0], v[2] // v[0], v[3] // v[0])
            for c, v in agg.items()}
    got = {r["host_class"]: (r["n_hosts"], r["mean_len"],
                             r["mean_vowel_ppm"], r["mean_digit_ppm"])
           for r in q_frontier_dga_hosts(spark, SF).collect()}
    assert got == want
    # every 13th host is a planted random label; the conjunction rule
    # flags >= 90% of plants (a hex label needs both few digits AND many
    # vowels to slip) and NEVER a word-built store hostname (their digit
    # ratio is far below the floor)
    n_planted = sum(1 for k in keys if k % 13 == 0)
    assert got["dga"][0] >= n_planted * 9 // 10
    assert got["benign"][0] >= len(keys) - n_planted
    assert got["dga"][1] == 16  # all flagged rows are 16-char plants
