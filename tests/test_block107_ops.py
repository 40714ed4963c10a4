"""Block-107 operators: Matryoshka truncated-dim recall, integer
EWMA forecast backtest, userinfo strip + deception screen."""

from __future__ import annotations

from collections import defaultdict

from genesis_spark.queries import (q_embeddings_matryoshka,
                                   q_events_ewma_forecast,
                                   q_url_userinfo_strip)

SF = "/root/testdata/sf0.001"


def test_matryoshka_golden(spark):
    vecs = {r["vec_id"]: [int(round(float(x) * 1e6))
                          for x in r["embedding"]]
            for r in spark.read.parquet(f"{SF}/embeddings.parquet")
            .collect()}
    qids = [v for v in vecs if v % 20 == 0]
    levels = (8, 16, 32, 64)

    def top5(qid, lvl):
        q = vecs[qid]
        scored = sorted(
            ((-sum(a * b for a, b in zip(q[:lvl], vecs[c][:lvl])), c)
             for c in vecs if c != qid))
        return {c for _s, c in scored[:5]}

    gt = {q: top5(q, 64) for q in qids}
    exp = {}
    for lvl in levels:
        hits = sum(len(top5(q, lvl) & gt[q]) for q in qids)
        exp[lvl] = hits
    got = {r["dim_level"]: r for r in
           q_embeddings_matryoshka(spark, SF).collect()}
    assert set(got) == set(levels)
    for lvl in levels:
        r = got[lvl]
        assert r["n_queries"] == len(qids)
        assert r["total_hits"] == exp[lvl]
        assert r["recall_ppm"] == exp[lvl] * 10**6 // (5 * len(qids))
    # full dim is its own ground truth; recall is monotone-ish:
    # the widest prefix is at least as good as the narrowest
    assert got[64]["recall_ppm"] == 10**6
    assert got[32]["recall_ppm"] >= got[8]["recall_ppm"]


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
