"""Block-87 operators: RFC 3986 case folding, lag-1 autocorrelation,
in-text document dating."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math
import re

from genesis_spark.queries import (q_events_autocorr, q_text_date_extract,
                                   q_url_case_fold)

SF = "/root/testdata/sf0.001"


def test_case_fold_families_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    fams = {}
    for k in keys:
        scheme = "HTTP" if k % 4 == 0 else "http"
        host = (f"SITE{k % 120}.ONION" if k % 3 == 0
                else f"site{k % 120}.onion")
        path = (f"/Docs/Page{k % 30}" if k % 5 == 0
                else f"/docs/page{k % 30}")
        url = f"{scheme}://{host}{path}"
        folded = f"{scheme.lower()}://{host.lower()}{path}"
        fams.setdefault(folded, set()).add(url)
    got = {r["url_folded"]: r for r in q_url_case_fold(spark, SF).collect()}
    assert set(got) == set(fams)
    for fam, urls in fams.items():
        r = got[fam]
        assert r["n_variants"] == len(urls)
        assert r["n_folded"] == sum(u != fam for u in urls)
        assert r["fetches_saved"] == len(urls) - 1
        # path case is PRESERVED: a /Docs family key keeps its case
        if "/Docs/" in fam:
            assert fam.split("://")[1].split("/", 1)[0].islower()
    # both mixed-case paths and folded authorities exist
    assert any("/Docs/" in f for f in fams)
    assert sum(r["n_folded"] for r in got.values()) > 0


def test_autocorr_pearson_golden(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("event_type", "ts").collect()
    daily = {}
    for r in ev:
        d = int(r["ts"].timestamp()) // 86400
        daily.setdefault(r["event_type"], {})
        daily[r["event_type"]][d] = daily[r["event_type"]].get(d, 0) + 1
    got = {r["event_type"]: r for r in q_events_autocorr(spark, SF).collect()}
    assert set(got) == set(daily)
    for et, days in daily.items():
        xs = [days[d] for d in sorted(days)]
        pairs = list(zip(xs, xs[1:]))
        m = len(pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        syy = sum(b * b for _, b in pairs)
        sxy = sum(a * b for a, b in pairs)
        r1 = (m * sxy - sx * sy) / math.sqrt(
            (m * sxx - sx * sx) * (m * syy - sy * sy))
        r = got[et]
        assert r["n_pairs"] == m
        assert abs(r["r1"] - round(r1, 4)) < 2e-4
        assert r["is_dependent"] == int(abs(r1) > 0.3)
        assert -1.0001 <= r["r1"] <= 1.0001


def test_date_extract_golden(spark):
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["text"] is not None}
    got = {r["doc_id"]: r for r in q_text_date_extract(spark, SF).collect()}
    assert set(got) == set(docs)
    for d, t in docs.items():
        page = t + f" copyright {d % 28 + 1998}"
        if d % 3 == 0:
            page += f" cited {d % 9 + 1991}"
        ys = [int(m[1]) for m in
              re.findall(r"(^| )((19|20)[0-9]{2})( |$)", page)]
        ys = [y for y in ys if 1990 <= y <= 2029]
        r = got[d]
        assert r["n_years"] == len(ys)
        assert r["min_year"] == (min(ys) if ys else None)
        assert r["max_year"] == (max(ys) if ys else None)
        conf = ("none" if not ys else
                "single" if len(ys) == 1 else "multi")
        assert r["confidence"] == conf
        if not ys:
            assert r["age_bucket"] == "undated"
        else:
            mx = max(ys)
            want = ("recent" if mx >= 2020 else "modern" if mx >= 2010
                    else "old" if mx >= 2000 else "ancient")
            assert r["age_bucket"] == want
    # injection guarantees every doc is dated; multi-year docs exist
    assert all(r["n_years"] >= 1 for r in got.values())
    assert any(r["confidence"] == "multi" for r in got.values())
