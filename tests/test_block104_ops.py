"""Block-104 operators: crawl-trap template detection, RFC 7234
cache-policy planning, extension/content-type mismatch census."""

from __future__ import annotations

import re
from collections import defaultdict

from genesis_spark.queries import (q_frontier_trap_detect,
                                   q_http_cache_policy,
                                   q_url_ext_mismatch)

SF = "/root/testdata/sf0.001"


def _keys(spark):
    return [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]


def test_trap_detect_golden(spark):
    urls = set()
    for k in _keys(spark):
        h = k % 40
        if h % 8 == 0:
            p = f"/cal/{(k // 40) % 500}/{k % 12}"
        elif k % 5 == 0:
            p = "/about"
        else:
            p = f"/sec/{(k // 40) % 6}"
        urls.add((f"h{h}", p))
    tpl = defaultdict(set)
    for h, p in urls:
        tpl[(h, re.sub(r"[0-9]+", "N", p))].add(p)
    host_tot = defaultdict(int)
    for (h, _t), ps in tpl.items():
        host_tot[h] += len(ps)
    got = {(r["host_key"], r["template"]): r for r in
           q_frontier_trap_detect(spark, SF).collect()}
    assert set(got) == set(tpl)
    traps = set()
    for (h, t), ps in tpl.items():
        r = got[(h, t)]
        share = len(ps) * 10**6 // host_tot[h]
        assert r["n_urls"] == len(ps)
        assert r["host_urls"] == host_tot[h]
        assert r["share_ppm"] == share
        exp_trap = int(len(ps) >= 20 and share >= 800000)
        assert r["is_trap"] == exp_trap
        if exp_trap:
            traps.add(h)
    # every calendar host is caught, and only calendar hosts
    assert traps == {f"h{h}" for h in range(40) if h % 8 == 0}
    # honest hosts' templates never flag
    assert all(got[(h, t)]["is_trap"] == 0
               for (h, t) in tpl if h not in traps)


def test_cache_policy_golden(spark):
    got = {r["url_id"]: r for r in
           q_http_cache_policy(spark, SF).collect()}
    for k in _keys(spark):
        r = got[f"u{k}"]
        if k % 4 == 0:
            assert (r["cache_class"], r["ttl_s"],
                    r["cacheable"]) == ("no_store", 0, 0)
        elif k % 4 == 1:
            assert r["cache_class"] == "explicit"
            assert r["ttl_s"] == (k % 24) * 300
            assert r["cacheable"] == int((k % 24) > 0)
        elif k % 4 == 2:
            assert r["cache_class"] == "explicit"
            assert r["ttl_s"] == (k % 10) * 3600
        else:
            # RFC 7234 §4.2.2: 10% of Last-Modified age
            assert r["cache_class"] == "heuristic"
            assert r["ttl_s"] == ((k % 20) + 1) * 86400 // 10
            assert r["cacheable"] == 1


def test_ext_mismatch_golden(spark):
    exp_map = {"html": "text/html", "jpg": "image/jpeg",
               "pdf": "application/pdf", "png": "image/png",
               "json": "application/json", "none": "text/html"}
    exts = ["html", "jpg", "pdf", "png", "json", "none"]
    cens = defaultdict(int)
    for k in _keys(spark):
        ext = exts[k % 6]
        expected = exp_map[ext]
        served = ("text/html" if k % 7 == 0 else
                  "application/octet-stream" if k % 11 == 0 else
                  expected)
        cens[(ext, expected, served)] += 1
    ext_tot = defaultdict(int)
    for (e, _x, _s), n in cens.items():
        ext_tot[e] += n
    got = {(r["ext"], r["expected_type"], r["served_type"]): r
           for r in q_url_ext_mismatch(spark, SF).collect()}
    assert set(got) == set(cens)
    for key, n in cens.items():
        r = got[key]
        assert r["n_urls"] == n
        assert r["share_ppm"] == n * 10**6 // ext_tot[key[0]]
        assert r["is_mismatch"] == int(key[2] != key[1])
    # error pages exist for every non-html extension
    assert all(("%s" % e, exp_map[e], "text/html") in cens
               for e in exts if exp_map[e] != "text/html")
