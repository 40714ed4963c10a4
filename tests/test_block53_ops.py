"""Block-53 operators: A/B lift readout, PCA power step, PageRank delta."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math

import duckdb

from genesis_spark.queries import (q_embeddings_pca_power,
                                   q_events_ab_lift,
                                   q_graph_pagerank_delta,
                                   q_host_pagerank)

SF = "/root/testdata/sf0.001"


def test_ab_lift_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_type, value FROM '{SF}/events.parquet'"
    ).fetchall()
    per = {}
    for uid, et, val in rows:
        exp, pur, rev = per.get(uid, (0, 0, 0))
        if et in ("view", "click"):
            exp = 1
        if et == "purchase":
            pur = 1
            rev += int(math.floor(val * 100 + 0.5))
        per[uid] = (exp, pur, rev)
    a = [(p, r) for u, (e, p, r) in per.items() if e and u % 2 == 0]
    b = [(p, r) for u, (e, p, r) in per.items() if e and u % 2 == 1]
    a_users, b_users = len(a), len(b)
    a_conv = sum(p for p, _ in a)
    b_conv = sum(p for p, _ in b)
    row = q_events_ab_lift(spark, SF).collect()[0]
    assert (row["a_users"], row["b_users"]) == (a_users, b_users)
    assert (row["a_conv"], row["b_conv"]) == (a_conv, b_conv)
    assert row["a_rev_cents"] == sum(r for _, r in a)
    assert row["b_rev_cents"] == sum(r for _, r in b)
    assert row["a_conv_ppm"] == a_conv * 1_000_000 // max(a_users, 1)
    assert row["b_conv_ppm"] == b_conv * 1_000_000 // max(b_users, 1)
    assert row["lift_ppm"] == row["b_conv_ppm"] - row["a_conv_ppm"]
    assert row["srm_ppm"] == (abs(a_users - b_users) * 1_000_000
                              // max(a_users + b_users, 1))
    pc = (a_conv + b_conv) / (max(a_users, 1) + max(b_users, 1))
    se = math.sqrt(pc * (1 - pc)
                   * (1.0 / max(a_users, 1) + 1.0 / max(b_users, 1)))
    if se > 0:
        z = round((b_conv / max(b_users, 1) - a_conv / max(a_users, 1))
                  / se, 4)
    else:
        z = 0.0  # sf0.001 exercises exactly this degenerate branch
    assert row["z_stat"] == z


def test_pca_power_matches_python_replay(spark):
    con = duckdb.connect()
    vecs = con.execute(
        f"SELECT embedding FROM '{SF}/embeddings.parquet'").fetchall()
    dim = len(vecs[0][0])
    y = [0] * dim
    for (emb,) in vecs:
        xu = [int(round(float(x) * 1e4)) for x in emb]
        t = sum(xu)
        for d in range(dim):
            y[d] += xu[d] * t
    ta = sum(abs(v) for v in y)
    got = {r["dim"]: (r["y_u"], r["share_ppm"])
           for r in q_embeddings_pca_power(spark, SF).collect()}
    assert len(got) == dim
    for d in range(dim):
        assert got[d] == (y[d], abs(y[d]) * 1_000_000 // max(ta, 1))
    # y = X^T X 1 of a Gram matrix: the probe's own mass must be
    # positive (x.v0 squared sums), so total share mass is full ppm
    assert sum(s for _, s in got.values()) <= 1_000_000


def test_pagerank_delta_consistent_with_base_rank(spark):
    before = {r["host_key"]: r["pagerank"]
              for r in q_host_pagerank(spark, SF).collect()}
    rows = q_graph_pagerank_delta(spark, SF).collect()
    assert {r["host_key"] for r in rows} >= set(before)
    moved = 0
    for r in rows:
        assert r["pr_before"] == before.get(r["host_key"], 0)
        assert r["delta_units"] == r["pr_after"] - r["pr_before"]
        moved += abs(r["delta_units"])
    # the delta wave's new backlinks must actually move some host
    assert moved > 0
