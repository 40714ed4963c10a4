"""Block-86 operators: distance-concentration histogram, wave host
entropy, residual HTML-entity audit."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math
import re

from genesis_spark.queries import (q_embeddings_distance_histogram,
                                   q_frontier_wave_entropy,
                                   q_text_html_entities)

SF = "/root/testdata/sf0.001"


def test_distance_histogram_golden(spark):
    rows = sorted(
        [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in
         spark.read.parquet(f"{SF}/embeddings.parquet").collect()])
    n = len(rows)
    bins = {}
    for i, (_, va) in enumerate(rows):
        j = (i * 7 + 1) % n
        if i == j:
            continue
        vb = rows[j][1]
        na = math.sqrt(sum(x * x for x in va))
        nb = math.sqrt(sum(x * x for x in vb))
        cos = round(sum(a * b for a, b in zip(va, vb)) / (na * nb), 6)
        b = min(max(math.floor((cos + 1) * 10), 0), 19)
        cnt, mn, mx = bins.get(b, (0, 10.0, -10.0))
        bins[b] = (cnt + 1, min(mn, cos), max(mx, cos))
    got = {r["bin"]: r for r in
           q_embeddings_distance_histogram(spark, SF).collect()}
    assert set(got) == set(bins)
    for b, (cnt, mn, mx) in bins.items():
        r = got[b]
        assert r["n_pairs"] == cnt
        assert abs(r["min_cos"] - round(mn, 6)) < 2e-6
        assert abs(r["max_cos"] - round(mx, 6)) < 2e-6
    # concentration: near-random 64-dim cosines crowd around 0 — the
    # central bins (9, 10) must dominate
    total = sum(c for c, _, _ in bins.values())
    central = sum(bins.get(b, (0, 0, 0))[0] for b in (8, 9, 10, 11))
    assert central > total * 0.8


def test_wave_entropy_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    waves = {}
    for k in keys:
        rnd = k % 5
        h = k % 7 if rnd < 2 else k % 61
        waves.setdefault(rnd, {})
        waves[rnd][h] = waves[rnd].get(h, 0) + 1
    got = {r["round"]: r for r in
           q_frontier_wave_entropy(spark, SF).collect()}
    assert set(got) == set(waves)
    for rnd, hosts in waves.items():
        tot = sum(hosts.values())
        h = sum((n / tot) * (math.log(tot) - math.log(n)) / math.log(2)
                for n in hosts.values())
        r = got[rnd]
        assert r["n_urls"] == tot
        assert r["n_hosts"] == len(hosts)
        assert abs(r["h_bits"] - round(h, 4)) < 2e-4
        perp = round(2 ** r["h_bits"], 2)
        assert abs(r["perplexity"] - perp) < 1e-9
        assert r["utilization_ppm"] == math.floor(perp * 10**6
                                                  / len(hosts))
    # rounds 0-1 concentrate on 7 hosts, rounds 2-4 spread over 61:
    # the gauge must separate them
    assert got[0]["n_hosts"] < got[2]["n_hosts"]
    assert got[0]["perplexity"] < got[2]["perplexity"]


def test_html_entities_audit_golden(spark):
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["text"] is not None}
    got = {r["doc_id"]: r for r in q_text_html_entities(spark, SF).collect()}
    assert set(got) == set(docs)
    dirty = 0
    for d, t in docs.items():
        xt = t
        if d % 3 == 0:
            xt = xt.replace(" and ", " &amp; ")
        if d % 5 == 0:
            xt = xt.replace(" the ", " the&#39; ")
        if d % 7 == 0:
            xt = xt.replace(" a ", " a&nbsp;")
        named = len(re.findall(r"&(amp|lt|gt|quot|nbsp);", xt))
        dec = len(re.findall(r"&#[0-9]+;", xt))
        hx = len(re.findall(r"&#x[0-9a-fA-F]+;", xt))
        decoded = xt.replace("&amp;", "&").replace("&nbsp;", " ") \
            .replace("&#39;", "'")
        r = got[d]
        assert (r["n_named"], r["n_decimal"], r["n_hex"]) == \
            (named, dec, hx)
        assert r["decoded_len"] == len(decoded)
        assert r["n_entities"] == named + dec + hx
        assert r["is_dirty"] == int(named + dec + hx > 0)
        dirty += r["is_dirty"]
    # injection cohorts must make both populations non-trivial
    assert 0 < dirty < len(docs)
