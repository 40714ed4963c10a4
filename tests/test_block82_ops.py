"""Block-82 operators: Mann-Kendall trend test, invisible-char watermark
census, crawl-schedule smear audit."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
import math
import re

from genesis_spark.queries import (q_events_trend_mk,
                                   q_frontier_schedule_smear,
                                   q_text_invisible_chars)

SF = "/root/testdata/sf0.001"

ZWSP, ZWNJ, ZWJ, SHY = "​", "‌", "‍", "­"


def test_trend_mk_golden(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("event_type", "ts").collect()
    daily = {}
    for r in ev:
        d = int(r["ts"].timestamp()) // 86400
        daily.setdefault(r["event_type"], {})
        daily[r["event_type"]][d] = daily[r["event_type"]].get(d, 0) + 1
    got = {r["event_type"]: r for r in q_events_trend_mk(spark, SF).collect()}
    assert set(got) == set(daily)
    for et, days in daily.items():
        xs = [days[d] for d in sorted(days)]
        n = len(xs)
        s = sum((xs[j] > xs[i]) - (xs[j] < xs[i])
                for i in range(n) for j in range(i + 1, n))
        var = n * (n - 1) * (2 * n + 5) / 18.0
        z = ((s - 1) / math.sqrt(var) if s > 0
             else (s + 1) / math.sqrt(var) if s < 0 else 0.0)
        r = got[et]
        assert r["n_days"] == n
        assert r["s_stat"] == s
        assert abs(r["z"] - round(z, 4)) < 2e-4
        want = ("increasing" if r["z"] >= 1.96
                else "decreasing" if r["z"] <= -1.96 else "no-trend")
        assert r["trend"] == want


def test_invisible_chars_census_golden(spark):
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["text"] is not None}
    got = {r["doc_id"]: r for r in
           q_text_invisible_chars(spark, SF).collect()}
    assert set(got) == set(docs)
    for d, t in docs.items():
        xt = t
        if d % 4 == 0:
            xt = re.sub(r"((?:\S+ ){10})", r"\g<1>" + ZWSP, xt)
        if d % 7 == 0:
            xt = xt.replace("scan ", "sc" + SHY + "an ")
        r = got[d]
        assert r["n_zwsp"] == xt.count(ZWSP)
        assert r["n_zwnj"] == xt.count(ZWNJ) == 0
        assert r["n_zwj"] == xt.count(ZWJ) == 0
        assert r["n_shy"] == xt.count(SHY)
        inv = sum(xt.count(c) for c in (ZWSP, ZWNJ, ZWJ, SHY))
        assert r["n_invisible"] == inv
        assert r["clean_len"] == len(xt) - inv
        assert r["is_watermarked"] == int(xt.count(ZWSP) >= 4)
    # injection cohorts must be visible in the census
    assert any(r["is_watermarked"] for r in got.values())
    assert any(r["n_shy"] > 0 for r in got.values())


def test_schedule_smear_uniformity_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    hosts = {}
    for k in keys:
        h = f"h{k % 997}"
        hosts[h] = hosts.get(h, 0) + (k % 40 + 1)
    slots = {}
    for h, m in hosts.items():
        s = int(hashlib.md5(h.encode()).hexdigest()[:8], 16) % 60
        n, mass = slots.get(s, (0, 0))
        slots[s] = (n + 1, mass + m)
    total = sum(m for _, m in slots.values())
    n_slots = len(slots)
    got = {r["slot"]: r for r in
           q_frontier_schedule_smear(spark, SF).collect()}
    assert set(got) == set(slots)
    for s, (n, mass) in slots.items():
        r = got[s]
        assert (r["n_hosts"], r["slot_mass"]) == (n, mass)
        assert r["share_ppm"] == mass * 10**6 // total
        assert r["dev_ppm"] == abs(mass * n_slots - total) * 10**6 // total
    # the md5 smear must actually spread: all 60 slots populated and the
    # hottest slot carries < 4x the uniform share
    assert n_slots == 60
    assert max(r["share_ppm"] for r in got.values()) < 4 * 10**6 // 60
