"""Block-114 operators: frequency-cap fatigue curve, parked-domain
detection, site-migration detection."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from collections import defaultdict

from genesis_spark.queries import (q_events_frequency_cap,
                                   q_host_migration_detect,
                                   q_host_parked_detect)

SF = "/root/testdata/sf0.001"


def test_frequency_cap_golden(spark):
    per_user = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/events.parquet") \
            .select("user_id", "event_id", "ts", "event_type").collect():
        per_user[r["user_id"]].append(
            (r["ts"], r["event_id"], r["event_type"]))
    buckets = defaultdict(lambda: [0, 0])
    for u, evs in per_user.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        for i, (_ts, _eid, et) in enumerate(evs, 1):
            b = str(i) if i <= 5 else "6-10" if i <= 10 else "11+"
            buckets[b][0] += 1
            buckets[b][1] += int(et == "purchase")
    got = {r["bucket"]: r for r in
           q_events_frequency_cap(spark, SF).collect()}
    assert set(got) == set(buckets)
    first_rate = buckets["1"][1] * 10**6 // buckets["1"][0]
    for b, (ex, resp) in buckets.items():
        r = got[b]
        assert (r["exposures"], r["responses"]) == (ex, resp)
        rate = resp * 10**6 // ex
        assert r["rate_ppm"] == rate
        assert r["fatigued"] == int(2 * rate < first_rate)
    # ordinal buckets partition all events exactly
    total = sum(len(v) for v in per_user.values())
    assert sum(r["exposures"] for r in got.values()) == total
    assert got["1"]["fatigued"] == 0


def test_parked_detect_golden(spark):
    per = defaultdict(lambda: [0, 0])
    for r in spark.read.parquet(f"{SF}/orders.parquet") \
            .select("o_orderkey").collect():
        k = r["o_orderkey"]
        h = k % 55
        parked_page = h % 9 == 0 and k % 10 != 0
        if parked_page:
            body = "This domain is for sale - make an offer"
            outl = k % 3
        else:
            body = "article content " + \
                "useful words here " * (k % 5 + 4)
            outl = k % 12 + 3
        votes = (int("domain is for sale" in body.lower())
                 + int(outl <= 2) + int(len(body) < 60))
        per[f"h{h}"][0] += 1
        per[f"h{h}"][1] += int(votes >= 2)
    got = {r["host_key"]: r for r in
           q_host_parked_detect(spark, SF).collect()}
    assert set(got) == set(per)
    for hk, (n, p) in per.items():
        r = got[hk]
        assert (r["n_pages"], r["n_parked_pages"]) == (n, p)
        share = p * 10**6 // n
        assert r["parked_share_ppm"] == share
        assert r["is_parked"] == int(share >= 500000)
    # registrar landers flagged; article hosts never are
    landers = [hk for hk in per if int(hk[1:]) % 9 == 0]
    honest = [hk for hk in per if int(hk[1:]) % 9 != 0]
    assert landers and all(got[hk]["is_parked"] == 1 for hk in landers)
    assert honest and all(got[hk]["is_parked"] == 0 for hk in honest)


def test_migration_detect_golden(spark):
    cc = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF}/orders.parquet") \
            .select("o_orderkey").collect():
        k = r["o_orderkey"]
        h = k % 48
        if h % 8 == 3 and k % 10 != 0:
            dst = f"new{h}"
        else:
            dst = f"h{(h + (k // 48) * 5) % 48}"
        cc[f"h{h}"][dst] += 1
    got = {r["src_host"]: r for r in
           q_host_migration_detect(spark, SF).collect()}
    assert set(got) == set(cc)
    for src, ds in cc.items():
        n = sum(ds.values())
        top_n = max(ds.values())
        top = min(d for d, c in ds.items() if c == top_n)
        r = got[src]
        assert r["n_redirects"] == n
        assert r["top_dst"] == top
        share = top_n * 10**6 // n
        assert r["top_share_ppm"] == share
        assert r["migrated"] == int(share >= 800000 and top != src)
    # moved hosts detected with their twin as destination
    moved = [s for s in cc if int(s[1:]) % 8 == 3]
    assert moved and all(
        got[s]["migrated"] == 1 and got[s]["top_dst"] == f"new{s[1:]}"
        for s in moved)
    stayed = [s for s in cc if int(s[1:]) % 8 != 3]
    assert stayed and all(got[s]["migrated"] == 0 for s in stayed)
