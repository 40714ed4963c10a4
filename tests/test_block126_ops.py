"""Block-126 operators: Cohen's kappa, directed triad census,
lognormal length fit."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_corpus_lognormal_fit,
                                   q_corpus_quality_kappa,
                                   q_graph_triad_census)

SF = "/root/testdata/sf0.001"


def test_kappa_identities_and_bounds(spark):
    r = q_corpus_quality_kappa(spark, SF).collect()[0]
    assert r.n == r.n11 + r.n00 + r.n10 + r.n01
    assert r.po_ppm == (r.n11 + r.n00) * 1000000 // r.n
    pe = ((r.n11 + r.n10) * (r.n11 + r.n01)
          + (r.n00 + r.n01) * (r.n00 + r.n10))
    assert r.pe_ppm == pe * 1000000 // (r.n * r.n)
    num = r.n * (r.n11 + r.n00) - pe
    den = r.n * r.n - pe
    sign = -1 if num < 0 else 1
    assert r.kappa_ppm == sign * (abs(num) * 1000000 // den)
    # kappa <= po by construction; both raters actually disagree some
    assert -1000000 <= r.kappa_ppm <= 1000000
    assert r.n10 + r.n01 > 0
    # chance-corrected: kappa strictly below raw agreement
    assert r.kappa_ppm < r.po_ppm


def test_triad_census_python_replay(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey").collect()
    e = {(r.o_orderkey % 499, r.o_custkey % 499)
         for r in df if r.o_orderkey % 499 != r.o_custkey % 499}
    out_ = defaultdict(set)
    for s, t in e:
        out_[s].add(t)
    per = defaultdict(lambda: [0, 0, 0])
    for a, b in e:
        for c in out_[b]:
            if c == a:
                continue
            st = per[b]
            st[0] += 1
            st[1] += (a, c) in e
            st[2] += (c, a) in e
    got = {r.host: (r.n_wedges, r.n_ffl, r.n_cycle, r.ffl_ppm)
           for r in q_graph_triad_census(spark, SF).collect()}
    assert set(got) == set(per)
    for b, (w, ffl, cyc) in per.items():
        assert got[b] == (w, ffl, cyc, ffl * 1000000 // w), b
    # the graph contains both motifs somewhere
    assert any(v[1] > 0 for v in got.values())
    assert any(v[2] > 0 for v in got.values())


def test_lognormal_fit_python_replay(spark):
    docs = [(r.source, r.n_chars) for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("source", "n_chars", "text").collect()
            if r.n_chars and r.n_chars > 0]
    by_src = defaultdict(list)
    for src, n in docs:
        by_src[src].append(round(math.log(n) * 1e6))
    got = {r.source: (r.n, r.mu_u, r.var_u) for r in
           q_corpus_lognormal_fit(spark, SF).collect()}
    assert set(got) == set(by_src)
    for src, lus in by_src.items():
        n, s, q = len(lus), sum(lus), sum(u * u for u in lus)
        assert got[src] == (n, s // n, (n * q - s * s)
                            // (n * (n - 1)) // 1000000), src
    # lognormal sanity: mu around ln(typical length), variance positive
    for n, mu, var in got.values():
        assert 2_000_000 < mu < 12_000_000      # e^2 .. e^12 chars
        assert var >= 0
