"""Block-154 operators: feed autodiscovery, WoW deltas, requirements
pinning."""

from __future__ import annotations

from collections import Counter

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_code_requirements_pin_audit,
                                   q_events_wow_delta,
                                   q_url_feed_autodiscovery)

SF = "/root/testdata/sf0.001"


def test_feed_autodiscovery_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    got = {r.rid: r for r in
           q_url_feed_autodiscovery(spark, SF).collect()}
    for k in ks:
        origin = f"https://site{k % 50}.example"
        r = got[k]
        if k % 3 == 0:
            assert (r.feed_kind, r.feed_url, r.has_feed) == (
                "rss", origin + "/feed.xml", 1)
        elif k % 3 == 1:
            assert (r.feed_kind, r.feed_url, r.has_feed) == (
                "atom", origin + "/atom", 1)
        else:
            assert (r.feed_kind, r.feed_url, r.has_feed) == (
                "none", "", 0)
    # the stylesheet decoy never matches
    assert all(not r.feed_url.endswith(".css") for r in got.values())


def test_wow_delta_replay(spark):
    days = Counter()
    import datetime as dt
    for r in spark.read.parquet(f"{SF}/events.parquet") \
            .select("ts").collect():
        days[(r.ts.date() - dt.date(2024, 1, 1)).days] += 1
    got = {r.day_index: r for r in q_events_wow_delta(spark, SF).collect()}
    assert set(got) == set(days)
    def tdiv(a, b):
        # Spark `div` / DuckDB `//` truncate toward zero on negatives
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    for d, n in days.items():
        r = got[d]
        assert r.n == n
        pd_, pw = days.get(d - 1, -1), days.get(d - 7, -1)
        assert (r.n_prev_day, r.n_prev_week) == (pd_, pw)
        assert r.dod_delta_ppm == (
            tdiv((n - pd_) * 1000000, pd_) if pd_ > 0 else None)
        assert r.wow_delta_ppm == (
            tdiv((n - pw) * 1000000, pw) if pw > 0 else None)
    # the first day has no baselines; later days do
    assert got[min(days)].n_prev_day == -1
    assert any(r.wow_delta_ppm is not None for r in got.values())


def test_requirements_pin_replay(spark):
    got = {r.module: r for r in
           q_code_requirements_pin_audit(spark, SF).collect()}
    assert set(got) == set(range(25))
    for m in range(25):
        ops = []
        for j in range(3 + m % 4):
            ops.append({0: "==", 1: ">=", 2: "~=", 3: ""}[(m + j) % 4])
        r = got[m]
        c = Counter(ops)
        assert r.n_deps == len(ops)
        assert (r.n_pinned, r.n_ranged, r.n_compat, r.n_unpinned) == (
            c["=="], c[">="], c["~="], c[""])
        assert r.reproducible == int(c["=="] == len(ops))
    # the 4-cycle guarantees unreproducible modules exist
    assert any(r.reproducible == 0 for r in got.values())
