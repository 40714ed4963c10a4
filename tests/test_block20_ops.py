"""Unit tests for the round-3 block-20 rows: BM25 retrieval, DSIR-style
importance resampling weights, and the fastText-style hashed-bigram
linear scorer. Each test replays the exact arithmetic in plain Python on
a hand-built corpus, so the Spark plans are checked against closed-form
values (the DuckDB oracle covers the large fixture separately)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
import math

from genesis_spark import queries as Q


def _mkdocs(spark, tmp_path, rows):
    """rows: list of (doc_id, text, source). Writes documents.parquet."""
    df = spark.createDataFrame(
        [(i, t, s, "en", len(t)) for i, t, s in rows],
        "doc_id long, text string, source string, lang string, "
        "n_chars long")
    out = str(tmp_path / "docs")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{out}/documents.parquet")
    return out


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_bm25_hand_computed(spark, tmp_path):
    """3-doc corpus: d1 hits two query terms, d2 one, d3 none. Scores
    must equal the closed-form BM25 sum in 1e-6 integer units and d3
    must not appear at all."""
    sf = _mkdocs(spark, tmp_path, [
        (1, "hash hash merge filler", "s"),
        (2, "hash filler filler filler filler", "s"),
        (3, "filler filler", "s"),
    ])
    rows = {r["doc_id"]: r for r in
            Q.q_text_bm25_topk(spark, sf).collect()}
    assert set(rows) == {1, 2}
    nd, tot = 3, 4 + 5 + 2

    def contrib(tf, df, dl):
        idf = math.log((nd - df + 0.5) / (df + 0.5) + 1.0)
        c = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl * nd / tot))
        return int(round(c * 1e6))

    d1 = contrib(2, 2, 4) + contrib(1, 1, 4)   # hash + merge
    d2 = contrib(1, 2, 5)                       # hash only
    assert rows[1]["score_u"] == d1 and rows[1]["n_terms"] == 2
    assert rows[2]["score_u"] == d2 and rows[2]["n_terms"] == 1
    assert rows[1]["rank"] == 1 and rows[2]["rank"] == 2
    assert d1 > d2


def test_dsir_weights_favor_target_like_docs(spark, tmp_path):
    """Target slice (src18) is all 'aa bb'; a raw doc repeating the
    target's vocabulary must outweigh one with vocabulary the target
    never uses, and the weights must equal the closed-form bucket
    log-ratio sums."""
    sf = _mkdocs(spark, tmp_path, [
        (1, "aa bb aa", "src18"),
        (2, "aa bb", "other"),
        (3, "cc dd", "other"),
    ])
    rows = {r["doc_id"]: r for r in
            Q.q_corpus_dsir_resample(spark, sf).collect()}
    assert set(rows) == {1, 2, 3}

    toks = {1: ["aa", "bb", "aa"], 2: ["aa", "bb"], 3: ["cc", "dd"]}
    buckets = {t: _h32(t) % 64 for ts in toks.values() for t in ts}
    rc, tc = {}, {}
    for d, ts in toks.items():
        for t in ts:
            b = buckets[t]
            rc[b] = rc.get(b, 0) + 1
            if d == 1:
                tc[b] = tc.get(b, 0) + 1
    tr, tt = sum(rc.values()), sum(tc.values())
    lr_u = {b: int(round((math.log((tc.get(b, 0) + 1.0) / (tt + 64.0)) -
                          math.log((rc[b] + 1.0) / (tr + 64.0))) * 1e6))
            for b in rc}
    for d, ts in toks.items():
        assert rows[d]["weight_u"] == sum(lr_u[buckets[t]] for t in ts)
        assert rows[d]["n_toks"] == len(ts)
    assert rows[2]["weight_u"] > rows[3]["weight_u"]


def test_hashed_lr_bigram_scoring(spark, tmp_path):
    """'a b c' yields bigrams a_b and b_c whose frozen md5-derived
    weights sum exactly; a one-token doc scores 0 with label 'drop' and
    still appears in the output (explode_outer keeps it)."""
    sf = _mkdocs(spark, tmp_path, [
        (1, "a b c", "s"),
        (2, "solo", "s"),
    ])
    rows = {r["doc_id"]: r for r in
            Q.q_text_hashed_lr(spark, sf).collect()}
    assert set(rows) == {1, 2}

    def w(bigram):
        b = _h32(bigram) % 256
        return (_h32(f"w1|{b}") % 2001) - 1000

    expect = w("a_b") + w("b_c")
    assert rows[1]["n_bigrams"] == 2
    assert rows[1]["score_u"] == expect
    assert rows[1]["label"] == ("keep" if expect > 0 else "drop")
    assert rows[2]["n_bigrams"] == 0
    assert rows[2]["score_u"] == 0
    assert rows[2]["label"] == "drop"
