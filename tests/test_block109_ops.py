"""Block-109 operators: sample-ratio-mismatch guardrail,
hour-profile seasonality strength."""

from __future__ import annotations

from collections import defaultdict

from genesis_spark.queries import (q_events_seasonality_strength,
                                   q_events_srm_check)

import pytest

pytestmark = pytest.mark.block

SF = "/root/testdata/sf0.001"


def test_srm_check_golden(spark):
    cens = defaultdict(lambda: [0, 0])
    for r in spark.read.parquet(f"{SF}/events.parquet") \
            .select("event_type", "user_id").collect():
        u = r["user_id"]
        if u % 2 == 1 and u % 20 == 1:
            continue  # the planted logging bug
        cens[r["event_type"]][u % 2] += 1
    got = {r["event_type"]: r for r in
           q_events_srm_check(spark, SF).collect()}
    assert set(got) == set(cens)
    for t, (a, b) in cens.items():
        r = got[t]
        assert (r["n_control"], r["n_treat"]) == (a, b)
        chi2 = (a - b) * (a - b) * 10**6 // (a + b)
        assert r["chi2_micro"] == chi2
        assert r["srm"] == int(chi2 > 10828000)
    # the bug biases every type the same way: control >= treat
    assert all(r["n_control"] >= r["n_treat"] for r in got.values())


def test_seasonality_strength_golden(spark):
    hourly = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF}/events.parquet") \
            .select("event_type", "ts").collect():
        hourly[r["event_type"]][r["ts"].hour] += 1
    got = {r["event_type"]: r for r in
           q_events_seasonality_strength(spark, SF).collect()}
    assert set(got) == set(hourly)
    for t, hrs in hourly.items():
        total = sum(hrs.values())
        dev = sum(abs(24 * n - total) for n in hrs.values())
        dev += (24 - len(hrs)) * total
        peak_n = max(hrs.values())
        peak_hour = max(h for h, n in hrs.items() if n == peak_n)
        r = got[t]
        assert r["total"] == total
        assert r["peak_hour"] == peak_hour
        assert r["peak_share_ppm"] == peak_n * 10**6 // total
        tv = dev * 10**6 // (46 * total)
        assert r["tv_ppm"] == tv
        assert r["is_seasonal"] == int(tv >= 200000)
        # TV is a normalized distance: always within [0, 1e6]
        assert 0 <= r["tv_ppm"] <= 10**6
