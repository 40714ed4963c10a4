"""Block-143 operators: zone-map pruning audit, ETag weak/strong
comparison, AMP-cache URL decoding."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_http_etag_compare,
                                   q_layout_zonemap_audit,
                                   q_url_amp_cache_decode)

SF = "/root/testdata/sf0.001"


def test_zonemap_replay(spark):
    doc_ids = [r.doc_id for r in
               spark.read.parquet(f"{SF}/documents.parquet")
               .select("doc_id").collect()]
    rows = [(d, (d * 37) % 500) for d in doc_ids]
    got = {(r.layout, r.q): r for r in
           q_layout_zonemap_audit(spark, SF).collect()}
    for layout, grp_of in (("clustered", lambda d, k: k // 20),
                           ("arrival", lambda d, k: d // 20)):
        stats = {}
        for d, k in rows:
            g = grp_of(d, k)
            lo, hi = stats.get(g, (k, k))
            stats[g] = (min(lo, k), max(hi, k))
        for q in range(10):
            qlo, qhi = q * 50, q * 50 + 24
            scanned = sum(1 for lo, hi in stats.values()
                          if not (hi < qlo or lo > qhi))
            r = got[(layout, q)]
            assert r.groups_total == len(stats)
            assert r.groups_scanned == scanned, (layout, q)
            assert r.scan_ppm == scanned * 1000000 // len(stats)
    # the point of the audit: clustering prunes, arrival order doesn't
    clus = sum(got[("clustered", q)].groups_scanned for q in range(10))
    arr = sum(got[("arrival", q)].groups_scanned for q in range(10))
    assert clus * 5 < arr  # >5x fewer groups scanned when clustered


def test_etag_compare_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    got = {r.rid: r for r in q_http_etag_compare(spark, SF).collect()}
    divergent = 0
    for k in ks:
        sv, cv = k % 7, (k + k % 11) % 7
        s_weak, c_weak = k % 2 != 0, k % 3 != 0
        wm = sv == cv
        sm = wm and not s_weak and not c_weak
        r = got[k]
        assert r.weak_match == int(wm)
        assert r.strong_match == int(sm)
        is_range = k % 13 == 0
        want = 304 if ((is_range and sm) or (not is_range and wm)) \
            else 200
        assert r.status == want
        if wm and not sm and is_range:
            divergent += 1  # weak-match range request forced to 200
    assert divergent > 0  # the RFC distinction actually bites


def test_amp_decode_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    got = {r.rid: r for r in q_url_amp_cache_decode(spark, SF).collect()}
    for k in ks:
        if k % 3 == 0:
            host = f"www.site{k % 50}.example"
        elif k % 3 == 1:
            host = f"my-blog{k % 50}.example"
        else:
            host = f"site{k % 50}.co.uk"
        r = got[k]
        assert r.decoded_host == host, (k, r.decoded_host)
        assert r.path_host == host
        assert r.consistent == 1
        assert r.https_origin == int(k % 9 != 0)
    # the sentinel dance really matters for hyphenated hosts
    hyph = [k for k in ks if k % 3 == 1]
    assert hyph
    assert all("-" in got[k].decoded_host for k in hyph)


def test_amp_encode_decode_roundtrip():
    def enc(h):
        return h.replace("-", "--").replace(".", "-")

    def dec(s):
        return s.replace("--", "\x01").replace("-", ".") \
                .replace("\x01", "-")

    for h in ("example.com", "my-blog.example", "a--b.c-d.co.uk"):
        assert dec(enc(h)) == h
    # naive decode (no sentinel) corrupts hyphenated hosts
    assert enc("my-blog.example").replace("-", ".") != "my-blog.example"
