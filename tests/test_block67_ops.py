"""Block-67 operators: rel=canonical consolidation, policy-lexicon
triage, URL-vs-content dedup agreement audit."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_text_lexicon_triage,
                                   q_url_content_agreement,
                                   q_url_rel_canonical)

SF = "/root/testdata/sf0.001"


def test_rel_canonical_classification(spark):
    rows = q_url_rel_canonical(spark, SF).collect()
    tot = {"n_pages": 0, "n_self": 0, "n_cross": 0, "n_cross_host": 0}
    for r in rows:
        assert r["n_pages"] == r["n_self"] + r["n_cross"] \
            + r["n_cross_host"]
        for k in tot:
            tot[k] += r[k]
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    # every page lands in exactly one class; absent declaration (m=2)
    # counts as self-canonical per the spec default
    assert tot["n_pages"] == n_orders
    assert tot["n_self"] > 0 and tot["n_cross"] > 0
    assert tot["n_cross_host"] > 0
    # cross-host canonicals all point at the h0 sink by construction
    sinks = [r for r in rows if r["n_cross_host"] > 0]
    assert sinks and all(r["canonical_url"].startswith("http://h0.onion/")
                         for r in sinks)


def test_lexicon_triage_token_exact(spark):
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["text"] is not None}
    got = {r["doc_id"]: r for r in
           q_text_lexicon_triage(spark, SF).collect()}
    assert set(got) == set(docs)
    lex = {"dup", "slow", "spill"}
    flagged = 0
    for doc_id, text in docs.items():
        toks = text.lower().split(" ")
        hits = sum(t in lex for t in toks)
        r = got[doc_id]
        assert (r["n_hits"], r["n_tokens"]) == (hits, len(toks))
        assert r["density_ppm"] == hits * 10**6 // len(toks)
        want_flag = int(hits >= 3 or r["density_ppm"] >= 40000)
        assert r["flagged"] == want_flag
        flagged += want_flag
    # the triage must actually split the corpus, not rubber-stamp it
    assert 0 < flagged < len(docs)


def test_url_content_agreement_audit(spark):
    r = q_url_content_agreement(spark, SF).collect()[0]
    # twin-injected corpus guarantees both disagreement classes
    assert r["n_url_multi_doc"] > 0
    assert r["n_url_drift"] > 0          # same URL, different content
    assert r["n_content_multi_url"] > 0  # same content, different URL
    assert r["n_url_drift"] <= r["n_url_multi_doc"] <= r["n_url_groups"]
    assert r["n_content_multi_url"] <= r["n_content_groups"]
