"""Block-77 operators: aspect-ratio batch buckets, CUPED variance
reduction, per-node local clustering coefficient."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import itertools
import math

from genesis_spark.queries import (q_events_cuped,
                                   q_graph_local_clustering,
                                   q_media_aspect_buckets)

SF = "/root/testdata/sf0.001"

_CANON = [(625, "1:2", 500), (875, "3:4", 750), (1165, "1:1", 1000),
          (1665, "4:3", 1333), (None, "2:1", 2000)]


def _bucket(a1000):
    for thr, name, canon in _CANON:
        if thr is None or a1000 < thr:
            return name, canon
    raise AssertionError


def test_aspect_buckets_census_golden(spark):
    parts = [r["p_partkey"] for r in
             spark.read.parquet(f"{SF}/part.parquet")
             .select("p_partkey").collect()]
    per = {}
    for k in parts:
        w = 160 + (k % 13) * 32
        h = 120 + ((k * 7) % 17) * 24
        a = w * 1000 // h
        name, canon = _bucket(a)
        per.setdefault(name, []).append((a, abs(a - canon) * 10**6 // canon))
    got = {r["bucket"]: r for r in q_media_aspect_buckets(spark, SF).collect()}
    assert set(got) == set(per)
    for name, rows in per.items():
        r = got[name]
        assert r["n_images"] == len(rows)
        assert abs(r["mean_a1000"]
                   - round(sum(a for a, _ in rows) / len(rows), 3)) < 1e-9
        assert r["max_dist_ppm"] == max(d for _, d in rows)
        assert r["avg_dist_ppm"] == sum(d for _, d in rows) // len(rows)
    # the synthetic W/H grid must populate more than one bucket for the
    # census to mean anything
    assert len(got) >= 3


def test_cuped_reduces_variance_and_matches_python(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "ts", "value").collect()
    xs, ys = {}, {}
    for r in ev:
        day = int(r["ts"].timestamp()) // 86400
        cents = int(round(r["value"] * 100))
        tgt = xs if day < 19737 else ys
        tgt[r["user_id"]] = tgt.get(r["user_id"], 0) + cents
    users = sorted(set(xs) | set(ys))
    x = [xs.get(u, 0) for u in users]
    y = [ys.get(u, 0) for u in users]
    n = len(users)
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    sxy = sum(a * b for a, b in zip(x, y))
    syy = sum(v * v for v in y)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    var_x = (n * sxx - sx * sx) / (n * n)
    var_y = (n * syy - sy * sy) / (n * n)
    vr = theta * theta * var_x / var_y
    got = {r["grp"]: r for r in q_events_cuped(spark, SF).collect()}
    assert set(got) == {0, 1}
    for g in (0, 1):
        gy = [b for u, b in zip(users, y) if u % 2 == g]
        gx = [a for u, a in zip(users, x) if u % 2 == g]
        adj = [b - theta * (a - sx / n) for a, b in zip(gx, gy)]
        r = got[g]
        assert r["n_users"] == len(gy)
        assert abs(r["mean_y"] - round(sum(gy) / len(gy), 3)) < 1e-6
        assert abs(r["mean_y_adj"] - round(sum(adj) / len(adj), 3)) < 1e-3
        assert abs(r["theta"] - round(theta, 6)) < 2e-6
        assert r["var_reduction_ppm"] == round(vr * 10**6)
    # CUPED must actually reduce variance on this fixture (pre-period
    # spend predicts post-period spend for heavy users)
    assert 0 < got[0]["var_reduction_ppm"] < 10**6


def test_local_clustering_matches_networkx_style_python(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet") \
        .select("o_orderkey", "o_custkey").collect()
    edges = set()
    for r in orders:
        u = f"t{r['o_orderkey'] % 30}"
        v = f"t{(r['o_custkey'] % 30) % 20}"
        if u != v:
            edges.add((min(u, v), max(u, v)))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = {r["host_key"]: r for r in
           q_graph_local_clustering(spark, SF).collect()}
    want_nodes = {v for v in adj if len(adj[v]) >= 2}
    assert set(got) == want_nodes
    for v in want_nodes:
        d = len(adj[v])
        t = sum(1 for a, b in itertools.combinations(sorted(adj[v]), 2)
                if b in adj[a])
        r = got[v]
        assert r["degree"] == d
        assert r["n_tri"] == t
        assert math.isclose(r["clustering"],
                            round(2 * t / (d * (d - 1)), 6), abs_tol=1e-9)
