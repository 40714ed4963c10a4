"""Block-95 operators: seasonal-naive backtest, pagination-gap audit,
1-NN label accuracy."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math

from genesis_spark.queries import (q_embeddings_knn_eval,
                                   q_events_snaive_backtest,
                                   q_url_pagination_audit)

SF = "/root/testdata/sf0.001"


def test_snaive_backtest_golden(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("event_type", "ts").collect()
    daily = {}
    for r in ev:
        d = int(r["ts"].timestamp()) // 86400
        daily.setdefault(r["event_type"], {})
        daily[r["event_type"]][d] = daily[r["event_type"]].get(d, 0) + 1
    got = {r["event_type"]: r for r in
           q_events_snaive_backtest(spark, SF).collect()}
    assert set(got) == set(daily)
    for et, days in daily.items():
        pairs = [(n, days[d - 7]) for d, n in days.items()
                 if d - 7 in days]
        m = len(pairs)
        abs_err = sum(abs(a - b) for a, b in pairs)
        sgn_err = sum(a - b for a, b in pairs)
        mape = sum(abs(a - b) * 10**6 // a for a, b in pairs)
        r = got[et]
        assert r["n_days"] == m
        assert r["mae_centi"] == abs_err * 100 // m
        assert r["mape_ppm"] == mape // m
        # Python // floors toward -inf like Spark/DuckDB integer DIV
        # only for positive operands; replicate engine DIV semantics
        want_bias = (sgn_err * 100) // m if sgn_err >= 0 else \
            -((-sgn_err * 100) // m)
        assert r["bias_centi"] == want_bias


def test_pagination_gap_audit_golden(spark):
    keys = {r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()}
    fams = {}
    for k in keys:
        fid = k % 40
        depth = fid % 9 + 2
        p = (k % 97) % depth + 1
        if p % 7 == 0 and fid % 3 == 0:
            continue
        fams.setdefault(fid, set()).add(p)
    got = {r["family"]: r for r in
           q_url_pagination_audit(spark, SF).collect()}
    assert set(got) == \
        {f"http://list{f}.onion/items?page=<N>" for f in fams}
    for fid, pages in fams.items():
        r = got[f"http://list{fid}.onion/items?page=<N>"]
        assert r["n_pages"] == len(pages)
        assert r["max_page"] == max(pages)
        assert r["n_missing"] == max(pages) - len(pages)
        assert r["coverage_ppm"] == len(pages) * 10**6 // max(pages)
    # gap families (fid%3==0, depth>=7) genuinely have missing pages
    assert any(r["n_missing"] > 0 for r in got.values())
    assert any(r["n_missing"] == 0 for r in got.values())


def test_knn_eval_golden(spark):
    rows = [(r["vec_id"], r["label"], [float(x) for x in r["embedding"]])
            for r in spark.read.parquet(f"{SF}/embeddings.parquet")
            .collect()]
    emb = {v: e for v, _, e in rows}
    lab = {v: l for v, l, _ in rows}
    norms = {v: math.sqrt(sum(x * x for x in e)) for v, e in emb.items()}
    per = {}
    for q in emb:
        best = None
        for b in emb:
            if b == q:
                continue
            cos = sum(x * y for x, y in zip(emb[q], emb[b])) \
                / (norms[q] * norms[b])
            if best is None or cos > best[0] + 1e-15 or \
                    (abs(cos - best[0]) <= 1e-15 and b < best[1]):
                best = (cos, b)
        t, c = per.get(lab[q], (0, 0))
        per[lab[q]] = (t + 1, c + (lab[best[1]] == lab[q]))
    total = sum(t for t, _ in per.values())
    majority = max(t for t, _ in per.values())
    got = {r["label"]: r for r in q_embeddings_knn_eval(spark, SF).collect()}
    assert set(got) == set(per)
    for l, (t, c) in per.items():
        r = got[l]
        assert (r["n"], r["n_correct"]) == (t, c)
        assert r["acc_ppm"] == c * 10**6 // t
        assert r["baseline_ppm"] == majority * 10**6 // total
    # support conservation
    assert sum(r["n"] for r in got.values()) == len(rows)
