"""Block-64 operators: Set-Cookie posture audit, length-bucketed batch
padding accounting, exact sliding-window DAU/MAU."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from collections import defaultdict

from genesis_spark.queries import (q_corpus_length_buckets,
                                   q_events_dau_mau, q_http_cookies)

SF = "/root/testdata/sf0.001"


def test_http_cookies_census_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    exp: dict[str, list[int]] = {}
    for k in keys:
        c = k % 6
        # (has_cookie, secure, httponly, max_age, tracker)
        spec = {0: (1, 1, 1, None, 0), 1: (1, 1, 0, 63072000, 1),
                2: (1, 0, 0, 3600, 0), 3: (1, 0, 1, None, 0),
                4: (1, 0, 0, 7776000, 1), 5: (0, 0, 0, None, 0)}[c]
        row = exp.setdefault(f"h{k % 20}", [0, 0, 0, 0, 0, 0, 0])
        row[0] += 1
        row[1] += spec[0]
        row[2] += spec[1]
        row[3] += spec[2]
        row[4] += int(spec[3] is not None)
        row[5] += spec[4]
        row[6] = max(row[6], spec[3] or 0)
    got = {r["host"]: r for r in q_http_cookies(spark, SF).collect()}
    assert set(got) == set(exp)
    for host, (n, nc, ns, nh, np_, nt, mx) in exp.items():
        r = got[host]
        assert (r["n_responses"], r["n_cookies"], r["n_secure"],
                r["n_httponly"], r["n_persistent"], r["n_trackers"],
                r["max_lifetime_s"]) == (n, nc, ns, nh, np_, nt, mx)
        assert r["tracker_ppm"] == nt * 1_000_000 // nc


def test_length_buckets_cut_padding_waste(spark):
    rows = q_corpus_length_buckets(spark, SF).collect()
    by = defaultdict(lambda: [0, 0, 0])  # docs, padded, real
    for r in rows:
        assert r["padded_tokens"] == r["n_docs"] * r["batch_max"]
        assert r["padded_tokens"] >= r["real_tokens"]
        s = by[r["strategy"]]
        s[0] += r["n_docs"]
        s[1] += r["padded_tokens"]
        s[2] += r["real_tokens"]
    # same docs, same real tokens under both strategies
    assert by["naive"][0] == by["bucketed"][0] > 0
    assert by["naive"][2] == by["bucketed"][2]
    waste_naive = by["naive"][1] - by["naive"][2]
    waste_bucketed = by["bucketed"][1] - by["bucketed"][2]
    # the point of the operator: bucketing strictly cuts pad waste
    assert waste_bucketed < waste_naive


def test_dau_mau_matches_bruteforce(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .selectExpr("unix_timestamp(ts) DIV 86400 AS day", "user_id") \
        .collect()
    day_users = defaultdict(set)
    for r in ev:
        day_users[r["day"]].add(r["user_id"])
    days = sorted(day_users)
    got = {r["day"]: r for r in q_events_dau_mau(spark, SF).collect()}
    assert set(got) == set(days)
    for d in days:
        mau = set()
        for d2 in days:
            if d - 27 <= d2 <= d:
                mau |= day_users[d2]
        r = got[d]
        assert r["n_dau"] == len(day_users[d])
        assert r["n_mau28"] == len(mau)
        assert r["stickiness_ppm"] == len(day_users[d]) * 10**6 // len(mau)
