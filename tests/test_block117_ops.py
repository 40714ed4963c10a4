"""Block-117 operators: HTTP Range-resume planning, robots->sitemap
discovery xref, feed guid/link identity audit."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from collections import defaultdict

from genesis_spark.queries import (q_feed_guid_identity,
                                   q_http_range_resume,
                                   q_robots_sitemap_xref)

SF = "/root/testdata/sf0.001"


def _keys(spark):
    return [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]


def test_range_resume_golden(spark):
    got = {r["url_id"]: r for r in
           q_http_range_resume(spark, SF).collect()}
    saved_total = 0
    for k in _keys(spark):
        total = (k % 20 + 1) * 51200
        if k % 7 == 0:
            received = total * ((k % 5) + 3) // 10
            interrupted = 1
        else:
            received = total
            interrupted = 0
        accepts = int(k % 3 != 1)
        if not interrupted:
            action, fetch, saved = "complete", 0, 0
        elif accepts and received >= 25600:
            action, fetch, saved = "range_resume", total - received, \
                received
        else:
            action, fetch, saved = "refetch_full", total, 0
        r = got[f"u{k}"]
        assert (r["total_bytes"], r["received_bytes"]) == (total,
                                                           received)
        assert (r["interrupted"], r["accepts_ranges"]) == (interrupted,
                                                           accepts)
        assert r["action"] == action
        assert r["bytes_to_fetch"] == fetch
        assert r["bytes_saved"] == saved
        saved_total += saved
    # the resume path actually pays in the fixture
    assert saved_total > 0
    # a resume never refetches what arrived
    assert all(r["bytes_to_fetch"] + r["bytes_saved"]
               <= r["total_bytes"] for r in got.values())


def test_sitemap_xref_golden(spark):
    hids = sorted({k % 50 for k in _keys(spark)})
    got = {r["host_key"]: r for r in
           q_robots_sitemap_xref(spark, SF).collect()}
    assert set(got) == {f"h{h}" for h in hids}
    for h in hids:
        n_rs = 2 if h % 8 == 0 else 1 if h % 4 == 0 else 0
        probe = int(h % 5 == 0)
        r = got[f"h{h}"]
        assert r["n_robots_sitemaps"] == n_rs
        assert r["probe_hit"] == probe
        exp = ("both" if n_rs and probe else
               "robots_only" if n_rs else
               "probe_only" if probe else "none")
        assert r["discovery_class"] == exp
        assert r["seed_source"] == (
            "robots_directive" if n_rs else
            "convention_probe" if probe else "link_discovery_only")
    # all four discovery classes appear in the fixture
    assert {r["discovery_class"] for r in got.values()} == \
        {"both", "robots_only", "probe_only", "none"}


def test_feed_guid_identity_golden(spark):
    groups = defaultdict(lambda: [0, set(), 0])
    for k in _keys(spark):
        item = k % 300
        missing = item % 13 == 0
        guid = "" if missing else f"tag:site,2024:/{item}"
        if item % 11 == 0 and not missing:
            link = f"http://site/p{item}?v={(k // 300) % 4}"
        else:
            link = f"http://site/p{item}"
        ident = guid if guid else link
        g = groups[ident]
        g[0] += 1
        g[1].add(link)
        g[2] |= int(missing)
    got = {r["identity"]: r for r in
           q_feed_guid_identity(spark, SF).collect()}
    assert set(got) == set(groups)
    unstable = 0
    for ident, (n, links, miss) in groups.items():
        r = got[ident]
        assert r["n_rows"] == n
        assert r["n_links"] == len(links)
        assert r["guid_missing"] == miss
        assert r["link_unstable"] == int(len(links) >= 2)
        assert r["dedup_key"] == ("link" if miss else "guid")
        unstable += int(len(links) >= 2)
    # the CMS-regenerated links exist and only guid-keyed groups
    # can absorb them
    assert unstable > 0
    assert all(r["link_unstable"] == 0 for r in got.values()
               if r["dedup_key"] == "link")
