"""Block-41 operators: OHLC bars, frontier age stats, norm audit."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import datetime as dt

import duckdb

from genesis_spark.queries import (q_embeddings_norm_audit, q_events_ohlc,
                                   q_frontier_age_stats)

SF = "/root/testdata/sf0.001"


def test_ohlc_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_id, ts, user_id FROM '{SF}/events.parquet'"
    ).fetchall()
    bars = {}
    for eid, ts, uid in rows:
        key = (f"s{uid % 10}", ts.replace(minute=0, second=0,
                                          microsecond=0))
        bars.setdefault(key, []).append((ts, eid, eid % 1000 + 100))
    want = {}
    for key, obs in bars.items():
        obs.sort()
        prices = [p for _, _, p in obs]
        want[key] = (obs[0][2], max(prices), min(prices), obs[-1][2],
                     len(obs), sum(prices))
    got = {(r["series"], r["bar_hour"]):
           (r["open"], r["high"], r["low"], r["close"], r["n_events"],
            r["volume"])
           for r in q_events_ohlc(spark, SF).collect()}
    assert got == want
    # bar sanity: low <= open, close <= high
    for o, h, l, c, n, v in got.values():
        assert l <= o <= h and l <= c <= h and v >= n * 100


def test_age_stats_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, o_custkey, o_orderdate "
        f"FROM '{SF}/orders.parquet'").fetchall()
    ref = dt.date(2002, 1, 1)
    per = {}
    for k, c, d in rows:
        per.setdefault(f"h{c % 40}", []).append(
            ((ref - d.date()).days, k))
    want = {}
    for host, ages in per.items():
        ages.sort()
        vals = [a for a, _ in ages]
        n = len(vals)
        b = (sum(1 for a in vals if a <= 7),
             sum(1 for a in vals if 7 < a <= 30),
             sum(1 for a in vals if 30 < a <= 90),
             sum(1 for a in vals if a > 90))
        want[host] = (n, *b, vals[(n + 1) // 2 - 1],
                      vals[(95 * n + 99) // 100 - 1])
    got = {r["host_key"]: (r["n_urls"], r["b_0_7"], r["b_8_30"],
                           r["b_31_90"], r["b_90_plus"],
                           r["p50_age_days"], r["p95_age_days"])
           for r in q_frontier_age_stats(spark, SF).collect()}
    assert got == want
    for n, b1, b2, b3, b4, p50, p95 in got.values():
        assert b1 + b2 + b3 + b4 == n and p50 <= p95


def test_norm_audit_classes_and_counts(spark):
    got = {r["audit_class"]: (r["n_vecs"], r["min_norm2"], r["max_norm2"])
           for r in q_embeddings_norm_audit(spark, SF).collect()}
    # all four classes materialize under the deterministic corruption
    assert set(got) == {"zero", "low", "high", "ok"}
    con = duckdb.connect()
    ids = [int(r[0]) for r in con.execute(
        f"SELECT vec_id FROM '{SF}/embeddings.parquet'").fetchall()]
    n_zero = sum(1 for v in ids if v % 29 == 0)
    n_high = sum(1 for v in ids if v % 29 != 0 and v % 31 == 0)
    n_low = sum(1 for v in ids
                if v % 29 != 0 and v % 31 != 0 and v % 37 == 0)
    assert got["zero"][0] == n_zero
    assert got["high"][0] == n_high
    assert got["low"][0] == n_low
    assert got["ok"][0] == len(ids) - n_zero - n_high - n_low
    # class invariants on the exact integer norms
    assert got["zero"][1] == got["zero"][2] == 0
    assert got["high"][1] > 4_000_000_000_000
    assert 0 < got["low"][2] < 250_000_000_000
    # unit-norm fixture: ok class sits around 1e12
    assert 250_000_000_000 <= got["ok"][1] <= got["ok"][2] \
        <= 4_000_000_000_000
