"""Block-105 operators: change-rate revisit policy, shared-infra
(CDN) detection, soft-404 content signature."""

from __future__ import annotations

from collections import defaultdict

from genesis_spark.queries import (q_frontier_revisit_policy,
                                   q_host_cdn_detect, q_url_soft404)

SF = "/root/testdata/sf0.001"


def _keys(spark):
    return [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]


def test_revisit_policy_golden(spark):
    per = defaultdict(lambda: [0, 0])
    for k in _keys(spark):
        p = k % 250
        if p % 5 == 0:
            ch = int(k % 2 == 0)
        elif p % 7 == 0:
            ch = 0
        else:
            ch = int(k % 10 < 2)
        per[p][0] += 1
        per[p][1] += ch
    got = {r["page_id"]: r for r in
           q_frontier_revisit_policy(spark, SF).collect()}
    assert set(got) == {f"p{p}" for p in per}
    frozen, hot = [], []
    for p, (n, c) in per.items():
        r = got[f"p{p}"]
        rv = min(720, max(6, 24 * n // (c + 1)))
        assert (r["n_obs"], r["n_changed"]) == (n, c)
        assert r["change_ppm"] == c * 10**6 // n
        assert r["revisit_h"] == rv
        assert r["tier"] == ("hot" if rv <= 24 else
                             "warm" if rv <= 168 else "cold")
        if p % 7 == 0 and p % 5 != 0:
            frozen.append(r)
        if p % 5 == 0 and p % 7 != 0:
            hot.append(r)
    # frozen pages never change and get the longest interval the
    # clamp allows for their observation count; volatile pages are
    # always scheduled strictly sooner
    assert frozen and hot
    assert all(r["change_ppm"] == 0 for r in frozen)
    assert all(r["revisit_h"] == min(720, max(6, 24 * r["n_obs"]))
               for r in frozen)
    # sparse orderkeys can starve one volatile page of even keys, so
    # compare the populations, not every member
    assert min(r["revisit_h"] for r in hot) < \
        min(r["revisit_h"] for r in frozen)
    assert sum(r["revisit_h"] for r in hot) * len(frozen) < \
        sum(r["revisit_h"] for r in frozen) * len(hot)


def test_cdn_detect_golden(spark):
    hosts = {k % 120 for k in _keys(spark)}
    ip_of = {}
    for h in hosts:
        if h % 3 == 0:
            ip_of[h] = f"203.0.113.{h % 2}"
        elif h % 3 == 1:
            ip_of[h] = f"198.51.100.{h % 8}"
        else:
            ip_of[h] = f"192.0.2.{h}"
    per_ip = defaultdict(set)
    for h, ip in ip_of.items():
        per_ip[ip].add(h)
    got = {r["ip"]: r for r in q_host_cdn_detect(spark, SF).collect()}
    assert set(got) == set(per_ip)
    for ip, hs in per_ip.items():
        r = got[ip]
        assert r["n_hosts"] == len(hs)
        exp = ("cdn" if len(hs) >= 20 else
               "shared" if len(hs) >= 5 else "dedicated")
        assert r["infra_class"] == exp
        assert r["politeness_scope"] == (
            "per_ip" if len(hs) >= 5 else "per_host")
    # both CDN edges detected as cdn-class; dedicated IPs stay per_host
    assert got["203.0.113.0"]["infra_class"] == "cdn"
    assert got["203.0.113.1"]["infra_class"] == "cdn"
    assert all(r["politeness_scope"] == "per_host"
               for ip, r in got.items() if ip.startswith("192.0.2."))


def test_soft404_golden(spark):
    got = {r["url_id"]: r for r in q_url_soft404(spark, SF).collect()}
    for k in _keys(spark):
        r = got[f"u{k}"]
        if k % 13 == 0:
            body = "Not Found"
            status = 404
        elif k % 9 == 0:
            body = ("Error 404 - the page you requested was"
                    " not found on this server")
            status = 200
        elif k % 17 == 0:
            body = "coming soon"
            status = 200
        else:
            body = "article body " + \
                "lorem ipsum dolor sit amet " * (k % 6 + 2)
            status = 200
        marker = int("not found" in body.lower()
                     or "error 404" in body.lower())
        tiny = int(len(body) < 40)
        assert r["status"] == status
        assert r["has_marker"] == marker
        assert r["is_tiny"] == tiny
        # hard 404s are never soft-404; healthy bodies never flag
        assert r["is_soft404"] == int(
            status == 200 and (marker or tiny))
        if status == 200 and k % 9 != 0 and k % 17 != 0:
            assert r["is_soft404"] == 0
