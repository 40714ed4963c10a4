"""Block-129 operators: subnet reputation blend, Vary cache-key audit,
Holt-Winters seasonal smoothing."""

from __future__ import annotations

import datetime
from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (_HW_N, _HW_P, q_events_holtwinters,
                                   q_host_subnet_reputation,
                                   q_http_vary_cache)

SF = "/root/testdata/sf0.001"


def test_subnet_reputation_replay_and_blend_bounds(spark):
    hids = {r.o_orderkey % 500 for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()}
    pools = defaultdict(lambda: [0, 0])
    base = {}
    for hid in hids:
        own = (hid * 37 + 13) % 101
        subnet = ((hid % 8) * ((hid // 8) % 8)) * 256
        base[f"h{hid}"] = (subnet, own)
        pools[subnet][0] += own
        pools[subnet][1] += 1
    got = {r.host_key: r for r in
           q_host_subnet_reputation(spark, SF).collect()}
    assert set(got) == set(base)
    for hk, (subnet, own) in base.items():
        psum, pn = pools[subnet]
        r = got[hk]
        assert (r.subnet, r.own, r.pool_sum, r.pool_n) == (
            subnet, own, psum, pn)
        assert r.adj_ppm == (own * pn + psum) * 500000 // pn // 100
        assert r.colocated == int(pn > 1)
        if pn == 1:
            # lone host: blend degenerates to its own score (in ppm)
            assert r.adj_ppm == own * 1000000 // 100
    assert any(r.colocated for r in got.values())


def test_vary_cache_replay(spark):
    keys = [r.o_orderkey for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for k in keys:
        if k % 11 == 0:
            unc, ua, enc = 1, 0, 0
        elif k % 5 == 0 and k % 3 == 0:
            unc, ua, enc = 0, 1, 1
        elif k % 5 == 0:
            unc, ua, enc = 0, 1, 0
        elif k % 3 == 0:
            unc, ua, enc = 0, 0, 1
        else:
            unc, ua, enc = 0, 0, 0
        mult = 0 if unc else (50 if ua else 1) * (3 if enc else 1)
        a = agg[f"h{k % 40}"]
        a[0] += 1
        a[1] += ua
        a[2] += unc
        a[3] += mult
    got = {r.host_key: (r.n_resources, r.n_ua_varied, r.n_uncacheable,
                        r.cache_keys)
           for r in q_http_vary_cache(spark, SF).collect()}
    assert got == {h: tuple(v) for h, v in agg.items()}
    # UA-varied hosts carry the 50x key blow-up
    blown = [h for h, v in got.items() if v[3] > v[0] * 3]
    assert blown


def test_holtwinters_python_replay_and_seasonality(spark):
    p, n = _HW_P, _HW_N
    evs = [(r.event_type,
            (r.ts.date() - datetime.date(2024, 1, 1)).days)
           for r in spark.read.parquet(f"{SF}/events.parquet")
           .select("event_type", "ts").collect()]
    max_day = max(d for _, d in evs)
    counts = defaultdict(int)
    for t, d in evs:
        counts[(t, d)] += 1
    got = {r.event_type: r for r in
           q_events_holtwinters(spark, SF).collect()}
    for et in {t for t, _ in evs}:
        ys = [float(counts.get((et, d), 0))
              for d in range(max_day - (n - 1), max_day + 1)]
        l = sum(ys[:p]) / p
        b = (sum(ys[p:2 * p]) - sum(ys[:p])) / (p * p)
        s = {i: ys[i - 1] - l for i in range(1, p + 1)}
        for t in range(p + 1, n + 1):
            y = ys[t - 1]
            ln = (y - s[t - p] + l + b) / 2.0
            b = ((ln - l) + b) / 2.0
            l = ln
            s[t] = ((y - l) + s[t - p]) / 2.0
        r = got[et]
        u = 1 << 20
        assert r.level_u == round(l * u)
        assert r.trend_u == round(b * u)
        for h in (1, 2):
            assert getattr(r, f"f{h}_u") == round(
                (l + h * b + s[n + h - p]) * u)
        for i in range(1, p + 1):
            assert getattr(r, f"season{i}_u") == round(s[n - p + i] * u)
        # forecasts differ from a pure trend line by the seasonal term
        trend_only = [round((l + h * b) * u) for h in (1, 2)]
        seas = [getattr(r, f"f{h}_u") - trend_only[h - 1] for h in (1, 2)]
        assert seas[0] == round(s[n + 1 - p] * u)
