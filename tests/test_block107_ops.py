"""Block-107 operators: integer EWMA forecast backtest, userinfo
strip + deception screen."""

from __future__ import annotations

from collections import defaultdict

from genesis_spark.queries import (q_events_ewma_forecast,
                                   q_url_userinfo_strip)

import pytest

pytestmark = pytest.mark.block

SF = "/root/testdata/sf0.001"


def test_ewma_forecast_golden(spark):
    daily = defaultdict(dict)
    for r in spark.read.parquet(f"{SF}/events.parquet") \
            .select("event_type", "ts").collect():
        d = r["ts"].date()
        daily[r["event_type"]][d] = daily[r["event_type"]].get(d, 0) + 1
    got = {r["event_type"]: r for r in
           q_events_ewma_forecast(spark, SF).collect()}
    weights = [128, 64, 32, 16, 8, 4, 2, 2]
    for t, days in daily.items():
        ds = sorted(days)
        es, ss = [], []
        for i in range(8, len(ds)):
            n = days[ds[i]]
            lags = [days[ds[i - j]] for j in range(1, 9)]
            fc = sum(w * v for w, v in zip(weights, lags)) // 256
            es.append(abs(n - fc))
            ss.append(abs(n - days[ds[i - 7]]))
        if not es:
            assert t not in got
            continue
        r = got[t]
        assert r["n_forecasts"] == len(es)
        assert r["ewma_abs_sum"] == sum(es)
        assert r["snaive_abs_sum"] == sum(ss)
        assert r["ewma_mae_milli"] == sum(es) * 1000 // len(es)
        assert r["snaive_mae_milli"] == sum(ss) * 1000 // len(ss)
        assert r["ewma_wins"] == int(sum(es) < sum(ss))


def test_userinfo_strip_golden(spark):
    got = {r["url_id"]: r for r in
           q_url_userinfo_strip(spark, SF).collect()}
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    for k in keys:
        r = got[f"u{k}"]
        host_part = f"h{k % 50}.example/p{k % 9}"
        if k % 11 == 0:
            assert r["url"] == f"http://user:s3cret@{host_part}"
            assert (r["has_userinfo"], r["deceptive"]) == (1, 0)
            assert r["verdict"] == "credentials"
        elif k % 17 == 0:
            assert r["url"] == f"http://www.paypal.com@{host_part}"
            assert (r["has_userinfo"], r["deceptive"]) == (1, 1)
            assert r["verdict"] == "phishing_risk"
        else:
            assert (r["has_userinfo"], r["deceptive"]) == (0, 0)
            assert r["verdict"] == "clean"
        # the strip always yields the credential-free canonical
        assert r["stripped_url"] == f"http://{host_part}"
        # secrets never survive the strip
        assert "s3cret" not in r["stripped_url"]
