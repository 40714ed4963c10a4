"""Block-98 operators: LLM-watermark z-test, AI-slop lexicon screen,
fill-in-the-middle transform plan."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
import math

from genesis_spark.queries import (_SLOP_ADD, _SLOP_TERMS,
                                   q_corpus_fim_transform,
                                   q_text_ai_slop, q_text_llm_watermark)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return [r for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "source", "text").collect()
            if r["text"] is not None]


def test_llm_watermark_golden(spark):
    per = {}
    for r in _docs(spark):
        toks = r["text"].split(" ")
        if len(toks) < 2:
            continue
        greens = 0
        for prev, tok in zip(toks, toks[1:]):
            h = hashlib.md5(
                (prev + "\x1f" + tok).encode("utf-8")).hexdigest()
            greens += h[0] in "89abcdef"
        n = len(toks) - 1
        z = math.floor(1000.0 * (2 * greens - n) / math.sqrt(n))
        nd, pp, gg, fl, mx = per.get(r["source"], (0, 0, 0, 0, -10**9))
        per[r["source"]] = (nd + 1, pp + n, gg + greens,
                            fl + (z >= 2000), max(mx, z))
    got = {r["source"]: r for r in
           q_text_llm_watermark(spark, SF).collect()}
    assert set(got) == set(per)
    for s, (nd, pp, gg, fl, mx) in per.items():
        r = got[s]
        assert (r["n_docs"], r["pairs"], r["green_pairs"],
                r["flagged_docs"], r["max_z_milli"]) == (nd, pp, gg, fl, mx)
        assert r["green_ppm"] == gg * 10**6 // pp
    # natural text sits near the p=1/2 null: every source within 10%
    for r in got.values():
        assert 400000 < r["green_ppm"] < 600000


def test_ai_slop_golden(spark):
    per = {}
    for r in _docs(spark):
        s = (r["text"] + _SLOP_ADD if r["doc_id"] % 11 == 0
             else r["text"]).lower()
        hits = sum((len(s) - len(s.replace(t, ""))) // len(t)
                   for t in _SLOP_TERMS)
        n_terms = sum(t in s for t in _SLOP_TERMS)
        n_tok = len(s.split(" "))
        rate = hits * 1000 // n_tok
        slop = rate >= 5 and n_terms >= 3
        nd, sd, hh, tt, mx = per.get(r["source"], (0, 0, 0, 0, 0))
        per[r["source"]] = (nd + 1, sd + slop, hh + hits, tt + n_tok,
                            max(mx, rate))
    got = {r["source"]: r for r in q_text_ai_slop(spark, SF).collect()}
    assert set(got) == set(per)
    for s, (nd, sd, hh, tt, mx) in per.items():
        r = got[s]
        assert (r["n_docs"], r["slop_docs"], r["hits"],
                r["tokens"], r["max_rate_pm"]) == (nd, sd, hh, tt, mx)
        assert r["hits_ppm"] == hh * 10**6 // tt
    # the injected 11th-doc cohort flags; it is a strict minority
    total = sum(r["n_docs"] for r in got.values())
    flagged = sum(r["slop_docs"] for r in got.values())
    assert 0 < flagged < total // 4


def test_fim_transform_golden(spark):
    per = {}
    for r in _docs(spark):
        n = len(r["text"].split(" "))
        fim = r["doc_id"] % 2 == 0 and n >= 9
        ms, me = n // 3, (2 * n) // 3
        (nd, nf, ar, pf, mi, su, raw, bil) = per.get(
            r["source"], (0, 0, 0, 0, 0, 0, 0, 0))
        per[r["source"]] = (
            nd + 1, nf + fim, ar + (0 if fim else n),
            pf + (ms if fim else 0), mi + (me - ms if fim else 0),
            su + (n - me if fim else 0), raw + n, bil + n + 3 * fim)
    got = {r["source"]: r for r in
           q_corpus_fim_transform(spark, SF).collect()}
    assert set(got) == set(per)
    for s, (nd, nf, ar, pf, mi, su, raw, bil) in per.items():
        r = got[s]
        assert (r["n_docs"], r["n_fim"], r["ar_tokens"],
                r["prefix_tokens"], r["middle_tokens"],
                r["suffix_tokens"], r["raw_tokens"],
                r["billed_tokens"]) == (nd, nf, ar, pf, mi, su, raw, bil)
        assert r["sentinel_overhead_ppm"] == (bil - raw) * 10**6 // raw
        # token conservation: FIM segments partition the FIM'd mass
        assert ar + pf + mi + su == raw
    assert any(r["n_fim"] > 0 for r in got.values())
