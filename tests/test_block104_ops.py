"""Block-104 operator: extension/content-type mismatch census."""

from __future__ import annotations

from collections import defaultdict

from genesis_spark.queries import q_url_ext_mismatch

import pytest

pytestmark = pytest.mark.block

SF = "/root/testdata/sf0.001"


def _keys(spark):
    return [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]


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
