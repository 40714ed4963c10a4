"""Block-116 operators: quality-proxy Pearson agreement, sentence
burstiness, streaming leaky-bucket limiter."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_corpus_proxy_agreement,
                                   q_stream_leaky_bucket,
                                   q_text_sentence_burstiness)

SF = "/root/testdata/sf0.001"


def test_proxy_agreement_golden(spark):
    per = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/documents.parquet") \
            .select("source", "text").collect():
        if r["text"] is None:
            continue
        t = r["text"]
        x = len(t) * 1000 // len(t.split(" "))
        y = (len(t) - len(re.sub("[^a-zA-Z0-9 ]", "", t))) * 1000 \
            // len(t)
        per[r["source"]].append((x, y))
    got = {r["source"]: r for r in
           q_corpus_proxy_agreement(spark, SF).collect()}
    assert set(got) == set(per)
    for s, xy in per.items():
        n = len(xy)
        sx = sum(x for x, _y in xy)
        sy = sum(y for _x, y in xy)
        sxx = sum(x * x for x, _y in xy)
        syy = sum(y * y for _x, y in xy)
        sxy = sum(x * y for x, y in xy)
        cov = n * sxy - sx * sy
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx > 0 and vy > 0:
            r_ppm = cov * 10**6 // (math.isqrt(vx) * math.isqrt(vy))
        else:
            r_ppm = 0
        g = got[s]
        assert g["n"] == n
        assert g["r_ppm"] == r_ppm, s
        exp = ("strong" if abs(r_ppm) >= 500000 else
               "weak" if abs(r_ppm) >= 200000 else "independent")
        assert g["agreement"] == exp
        # Pearson in ppm is bounded (integer floor can graze 1e6)
        assert -10**6 - 1 <= r_ppm <= 10**6 + 1


def test_sentence_burstiness_golden(spark):
    uni = ("this sentence has exactly seven words ok. " * 8).strip()
    got = {r["doc_id"]: r for r in
           q_text_sentence_burstiness(spark, SF).collect()}
    planted = []
    for r in spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text").collect():
        if r["text"] is None:
            continue
        did = r["doc_id"]
        xt = uni if did % 9 == 0 else r["text"]
        lens = [len(s.strip()) for s in xt.split(".")
                if len(s.strip()) > 0]
        if not lens:
            assert did not in got
            continue
        n, s1 = len(lens), sum(lens)
        s2 = sum(v * v for v in lens)
        disp = (n * s2 - s1 * s1) * 1000 // (n * s1)
        g = got[did]
        assert g["n_sentences"] == n
        assert g["mean_len_milli"] == s1 * 1000 // n
        assert g["dispersion_milli"] == disp
        assert g["is_uniform"] == int(disp < 500 and n >= 4)
        if did % 9 == 0:
            planted.append(g)
    # metronomic docs: zero dispersion, flagged uniform
    assert planted and all(
        g["dispersion_milli"] == 0 and g["is_uniform"] == 1
        for g in planted)


@pytest.mark.slow
def test_stream_leaky_bucket_matches_recursion(spark):
    got = {r["event_id"]: r for r in
           q_stream_leaky_bucket(spark, SF).collect()}
    by_type = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/events.parquet") \
            .select("event_id", "event_type", "ts").collect():
        by_type[r["event_type"]].append(
            (int(r["ts"].timestamp()), r["event_id"]))
    n = 0
    for t, rows in by_type.items():
        rows.sort()
        debt, last = 0, None
        for ts_s, eid in rows:
            if last is not None:
                debt = max(0, debt - (ts_s - last))
            debt += 1000
            last = ts_s
            r = got[eid]
            # cross-micro-batch state must reproduce the sequential
            # recursion exactly, per request
            assert r["event_type"] == t
            assert r["debt_milli"] == debt, (t, eid)
            assert r["violated"] == int(debt > 2000)
            n += 1
    assert n == len(got)
