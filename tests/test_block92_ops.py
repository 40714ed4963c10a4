"""Block-92 operators: storage tiering plan, seasonal-residual anomaly,
query-param sort canonicalization."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_corpus_storage_tiering,
                                   q_events_seasonal_residual,
                                   q_url_param_sort)

SF = "/root/testdata/sf0.001"

PRICE = {"hot": 23, "warm": 10, "cold": 2}


def test_storage_tiering_plan_golden(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "n_chars").collect()
    per = {}
    for r in docs:
        age = (r["doc_id"] * 3) % 180
        tier = "hot" if age <= 30 else "warm" if age <= 90 else "cold"
        n, b = per.get(tier, (0, 0))
        per[tier] = (n + 1, b + r["n_chars"])
    got = {r["tier"]: r for r in q_corpus_storage_tiering(spark, SF).collect()}
    assert set(got) == set(per) == {"hot", "warm", "cold"}
    for tier, (n, b) in per.items():
        r = got[tier]
        assert (r["n_docs"], r["bytes"]) == (n, b)
        assert r["cost_micro"] == b * PRICE[tier]
        assert r["all_hot_micro"] == b * 23
        assert r["saving_micro"] == b * (23 - PRICE[tier])
    # tiering must actually save (cold+warm mass exists)
    assert sum(r["saving_micro"] for r in got.values()) > 0
    assert got["hot"]["saving_micro"] == 0


def test_seasonal_residual_golden(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("event_type", "ts").collect()
    cells = {}
    days = []
    for r in ev:
        es = int(r["ts"].timestamp())
        d, h = es // 86400, es % 86400 // 3600
        days.append(d)
        cells.setdefault((r["event_type"], h), {})
        cells[(r["event_type"], h)][d] = \
            cells[(r["event_type"], h)].get(d, 0) + 1
    span = max(days) - min(days) + 1
    got = {(r["event_type"], r["hour"]): r for r in
           q_events_seasonal_residual(spark, SF).collect()}
    assert set(got) == set(cells)
    for key, per_day in cells.items():
        tot = sum(per_day.values())
        peak = max(per_day.values())
        r = got[key]
        assert r["total"] == tot
        assert r["peak"] == peak
        assert r["n_days_active"] == len(per_day)
        mean_centi = tot * 100 // span
        assert r["mean_centi"] == mean_centi
        assert r["is_anomalous"] == int(peak * 100 >= 2 * mean_centi)
    # at fixture scale hourly cells are sparse: anomalies exist but are
    # not universal only if some cell is dense — sanity both ways
    assert any(r["is_anomalous"] for r in got.values())


def test_param_sort_collapse_golden(spark):
    keys = {r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()}
    fams = {}
    for k in keys:
        a, b, c = f"a={k % 5}", f"b={k % 7}", f"c={k % 3}"
        sel = (k // 420) % 3
        order = ([a, b, c] if sel == 0
                 else [c, a, b] if sel == 1 else [b, c, a])
        url = f"http://site{k % 60}.onion/q?" + "&".join(order)
        canon = f"http://site{k % 60}.onion/q?" + "&".join(sorted(order))
        fams.setdefault(canon, set()).add((url, url != canon))
    got = {r["url_canon"]: r for r in q_url_param_sort(spark, SF).collect()}
    assert set(got) == set(fams)
    for fam, urls in fams.items():
        r = got[fam]
        assert r["n_variants"] == len(urls)
        assert r["n_reordered"] == sum(x for _, x in urls)
        assert r["fetches_saved"] == len(urls) - 1
        # canonical form is sorted
        q = fam.split("?")[1].split("&")
        assert q == sorted(q)
    # permuted variants of the same resource genuinely collapse
    assert any(r["n_variants"] > 1 for r in got.values())
