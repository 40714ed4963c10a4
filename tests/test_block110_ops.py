"""Block-110 operators: host geo-mix, curation-funnel census."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
from collections import defaultdict

from genesis_spark.queries import (q_corpus_curation_funnel,
                                   q_host_geo_mix)

SF = "/root/testdata/sf0.001"


def _keys(spark):
    return [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]


def test_geo_mix_golden(spark):
    rot = ["us", "de", "jp", "br", "in"]
    cc = defaultdict(lambda: defaultdict(int))
    for k in _keys(spark):
        h = k % 45
        c = "us" if h % 6 == 0 else rot[k % 5]
        cc[f"h{h}"][c] += 1
    got = {r["host_key"]: r for r in q_host_geo_mix(spark, SF).collect()}
    assert set(got) == set(cc)
    for hk, cs in cc.items():
        n_req = sum(cs.values())
        top_n = max(cs.values())
        top_c = min(c for c, n in cs.items() if n == top_n)
        r = got[hk]
        assert r["n_req"] == n_req
        assert r["n_countries"] == len(cs)
        assert r["top_country"] == top_c
        share = top_n * 10**6 // n_req
        assert r["top_share_ppm"] == share
        assert r["is_global"] == int(len(cs) >= 4 and share <= 500000)
    # the pinned hosts are single-country by construction
    pinned = [hk for hk in cc if int(hk[1:]) % 6 == 0]
    assert pinned and all(
        got[hk]["n_countries"] == 1 and got[hk]["top_country"] == "us"
        for hk in pinned)


def test_curation_funnel_golden(spark):
    rows = [(r["doc_id"], r["lang"], r["text"]) for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["text"] is not None]
    s1 = [(d, la, t, len(t.split(" "))) for d, la, t in rows]
    s2 = [x for x in s1 if x[1] == "en"]
    s3 = [x for x in s2 if x[3] >= 30]
    keep = {}
    for d, _la, t, _n in s3:
        h = hashlib.md5(t.encode()).hexdigest()
        keep.setdefault(h, d)
        keep[h] = min(keep[h], d)
    kept_ids = set(keep.values())
    s4 = [x for x in s3 if x[0] in kept_ids]
    exp = {"raw": s1, "lang_en": s2, "quality_len": s3,
           "exact_dedup": s4}
    got = {r["stage"]: r for r in
           q_corpus_curation_funnel(spark, SF).collect()}
    assert set(got) == set(exp)
    raw_tokens = sum(x[3] for x in s1)
    prev = raw_tokens
    for i, (name, data) in enumerate(
            [("raw", s1), ("lang_en", s2), ("quality_len", s3),
             ("exact_dedup", s4)], 1):
        tok = sum(x[3] for x in data)
        r = got[name]
        assert r["stage_order"] == i
        assert r["n_docs"] == len(data)
        assert r["n_tokens"] == tok
        assert r["survival_ppm"] == tok * 10**6 // raw_tokens
        assert r["drop_from_prev_ppm"] == (prev - tok) * 10**6 // prev
        prev = tok
    # the funnel is monotone non-increasing
    ns = [got[s]["n_tokens"] for s in
          ("raw", "lang_en", "quality_len", "exact_dedup")]
    assert ns == sorted(ns, reverse=True)
