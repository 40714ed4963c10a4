"""Block-76 operators: session-id query-param mining, Unicode-script
census, per-user inter-arrival burstiness."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
import math
import re

from genesis_spark.queries import (q_events_burstiness,
                                   q_text_script_detect,
                                   q_url_session_params)

SF = "/root/testdata/sf0.001"


def test_session_params_cardinality_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    per_key = {}
    for k in keys:
        pairs = [("a", str(k % 5))]
        if k % 3 == 0:
            pairs.append(("page", str(k % 7)))
        if k % 2 == 0:
            pairs.append(("sid", hashlib.md5(str(k).encode()).hexdigest()))
        if k % 5 == 0:
            pairs.append(("v", str(k % 97)))
        for pk, pv in pairs:
            per_key.setdefault(pk, []).append(pv)
    got = {r["param_key"]: r for r in q_url_session_params(spark, SF).collect()}
    assert set(got) == set(per_key)
    for pk, vals in per_key.items():
        r = got[pk]
        assert r["n_urls"] == len(vals)
        assert r["n_distinct"] == len(set(vals))
        assert r["distinct_ppm"] == len(set(vals)) * 10**6 // len(vals)
    # the md5 param is the one session-like key; the stable routing
    # params must NOT be flagged
    assert got["sid"]["is_session_like"] == 1
    assert got["a"]["is_session_like"] == 0
    assert got["page"]["is_session_like"] == 0


def test_script_detect_census_golden(spark):
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["text"] is not None}
    got = {r["doc_id"]: r for r in q_text_script_detect(spark, SF).collect()}
    assert set(got) == set(docs)
    trans = {1: str.maketrans("aeo", "аео"), 2: str.maketrans("aeo", "αεο")}
    for d, t in docs.items():
        xt = t.translate(trans[d % 7]) if d % 7 in (1, 2) else t
        lat = len(re.findall(r"[A-Za-z]", xt))
        cyr = sum(0x0400 <= ord(c) <= 0x04FF for c in xt)
        grk = sum(0x0370 <= ord(c) <= 0x03FF for c in xt)
        dig = sum(c.isdigit() and c.isascii() for c in xt)
        r = got[d]
        assert (r["n_latin"], r["n_cyrillic"], r["n_greek"], r["n_digit"]) \
            == (lat, cyr, grk, dig)
        letters = lat + cyr + grk
        if lat >= cyr and lat >= grk:
            dom = "latin"
        elif cyr >= grk:
            dom = "cyrillic"
        else:
            dom = "greek"
        assert r["dominant"] == dom
        big = (lat * 10 > letters) + (cyr * 10 > letters) + \
            (grk * 10 > letters)
        assert r["is_mixed"] == int(big >= 2)
    # the transliterated cohorts must actually be non-Latin-dominant
    # somewhere (a/e/o are common enough in the synthetic vocabulary)
    assert any(r["n_cyrillic"] > 0 for r in got.values())
    assert any(r["is_mixed"] == 1 for r in got.values())


def test_burstiness_matches_python(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "ts").collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            r["ts"].timestamp())
    got = {r["user_id"]: r for r in q_events_burstiness(spark, SF).collect()}
    for u, tss in per_user.items():
        tss.sort()
        us = [int(round(t * 10**6)) for t in tss]
        gaps = [(b - a) // 10**6 for a, b in zip(us, us[1:])]
        if len(gaps) < 2:
            assert u not in got
            continue
        n, s1, s2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
        disc = math.sqrt(n * s2 - s1 * s1)
        b = round((disc - s1) / (disc + s1), 6)
        r = got[u]
        assert r["n_gaps"] == n
        assert abs(r["mean_gap_s"] - round(s1 / n, 3)) < 1e-9
        assert abs(r["burstiness"] - b) < 2e-6
        want = ("periodic" if r["burstiness"] < -0.1
                else "bursty" if r["burstiness"] > 0.1 else "poisson")
        assert r["traffic_class"] == want
