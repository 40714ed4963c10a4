"""Block-112 operators: delete-1 jackknife ratio variance, per-axis
isotropy audit, growth-accounting decomposition."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math
from collections import defaultdict
from datetime import date

from genesis_spark.queries import (q_embeddings_isotropy,
                                   q_events_growth_accounting,
                                   q_events_jackknife)

SF = "/root/testdata/sf0.001"


def test_jackknife_golden(spark):
    daily = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in spark.read.parquet(f"{SF}/events.parquet") \
            .select("event_type", "ts", "value").collect():
        d = daily[r["event_type"]][r["ts"].date()]
        d[0] += 1
        d[1] += int(round(r["value"] * 1000))
    got = {r["event_type"]: r for r in
           q_events_jackknife(spark, SF).collect()}
    assert set(got) == set(daily)
    for t, days in daily.items():
        big_n = sum(n for n, _v in days.values())
        big_v = sum(v for _n, v in days.values())
        dd = len(days)
        thetas = [(big_v - v) * 1000 // (big_n - n)
                  for n, v in days.values()]
        s1, s2 = sum(thetas), sum(x * x for x in thetas)
        var = (dd - 1) * (dd * s2 - s1 * s1) // (dd ** 3)
        r = got[t]
        assert (r["n_days"], r["n_events"]) == (dd, big_n)
        assert r["theta_milli"] == big_v * 1000 // big_n
        assert r["var_jack_milli2"] == var
        assert r["se_jack_milli"] == math.isqrt(var)
        # the jackknife replicates bracket the point estimate
        # (same scaled units; +-1 for the independent integer floors)
        assert min(thetas) - 1 <= r["theta_milli"] <= max(thetas) + 1


def test_isotropy_golden(spark):
    vecs = [[int(round(float(x) * 1e6)) for x in r["embedding"]]
            for r in spark.read.parquet(f"{SF}/embeddings.parquet")
            .collect()]
    dims = len(vecs[0])
    n = len(vecs)
    var = []
    for d in range(dims):
        s1 = sum(v[d] for v in vecs)
        s2 = sum(v[d] * v[d] for v in vecs)
        var.append(n * s2 - s1 * s1)
    tot = sum(var)
    got = {r["dim"]: r for r in q_embeddings_isotropy(spark, SF).collect()}
    assert set(got) == set(range(dims))
    for d in range(dims):
        r = got[d]
        assert r["var_scaled"] == var[d]
        share = var[d] // max(tot // 10**6, 1)
        assert r["share_ppm"] == share
        assert r["is_rogue"] == int(share * dims > 4 * 10**6)
    # variance shares sum to ~1e6 (integer floor loss only)
    s = sum(r["share_ppm"] for r in got.values())
    assert 10**6 - dims <= s <= 10**6 + dims


def test_growth_accounting_golden(spark):
    weeks = defaultdict(set)
    for r in spark.read.parquet(f"{SF}/events.parquet") \
            .select("user_id", "ts").collect():
        w = (r["ts"].date() - date(2024, 1, 1)).days // 7
        weeks[w].add(r["user_id"])
    first = {}
    for w in sorted(weeks):
        for u in weeks[w]:
            first.setdefault(u, w)
    got = {r["week"]: r for r in
           q_events_growth_accounting(spark, SF).collect()}
    assert set(got) == set(weeks)
    for w, users in weeks.items():
        prev = weeks.get(w - 1, set())
        new = {u for u in users if first[u] == w}
        retained = users & prev
        resurrected = users - new - retained
        r = got[w]
        assert r["actives"] == len(users)
        assert r["new_users"] == len(new)
        assert r["retained"] == len(retained)
        assert r["resurrected"] == len(resurrected)
        assert r["churned"] == len(prev) - len(retained)
        assert r["identity_ok"] == 1
    # week 0 is all-new by definition
    w0 = min(weeks)
    assert got[w0]["new_users"] == got[w0]["actives"]
    assert got[w0]["resurrected"] == 0
