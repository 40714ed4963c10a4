"""Block-101 operators: citation extraction, OCR-artifact census,
markdown-structure census."""

from __future__ import annotations

import re

from genesis_spark.queries import (_CITE_ADD_A, _CITE_ADD_B, _MD_HEADER,
                                   q_text_citation_extract,
                                   q_text_markdown_structure,
                                   q_text_ocr_artifacts)

import pytest

pytestmark = pytest.mark.block

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return [r for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "source", "text").collect()
            if r["text"] is not None]


def test_citation_extract_golden(spark):
    pats = {
        "doi": re.compile(r"doi:10\.[0-9]{4}/[a-z0-9.]+"),
        "arxiv": re.compile(r"arXiv:[0-9]{4}\.[0-9]{4,5}"),
        "rfc": re.compile(r"rfc [0-9]{3,4}"),
    }
    per = {}
    for r in _docs(spark):
        s = r["text"]
        if r["doc_id"] % 7 == 0:
            s += _CITE_ADD_A
        elif r["doc_id"] % 7 == 3:
            s += _CITE_ADD_B
        nd = len(pats["doi"].findall(s))
        na = len(pats["arxiv"].findall(s))
        nr = len(pats["rfc"].findall(s))
        docs, citing, d, a, f = per.get(r["source"], (0, 0, 0, 0, 0))
        per[r["source"]] = (docs + 1, citing + (nd + na + nr > 0),
                            d + nd, a + na, f + nr)
    got = {r["source"]: r for r in
           q_text_citation_extract(spark, SF).collect()}
    assert set(got) == set(per)
    for s, (docs, citing, d, a, f) in per.items():
        r = got[s]
        assert (r["n_docs"], r["citing_docs"], r["doi_mentions"],
                r["arxiv_mentions"], r["rfc_mentions"]) == \
            (docs, citing, d, a, f)
        assert r["citing_ppm"] == citing * 10**6 // docs
    # both injected cohorts hit: dois ~ 2x the 7%%0 cohort
    assert sum(r["doi_mentions"] for r in got.values()) > 0
    assert sum(r["arxiv_mentions"] for r in got.values()) > \
        sum(r["doi_mentions"] for r in got.values()) // 2


def test_ocr_artifacts_golden(spark):
    mixed_re = re.compile(r"[a-z][0-9]|[0-9][a-z]")
    per = {}
    for r in _docs(spark):
        s = r["text"]
        if r["doc_id"] % 13 == 0:
            s = s.replace(" the ", " t he ").replace("o", "0")
        s = s.lower()
        toks = s.split(" ")
        n_single = sum(len(t) == 1 and t not in ("a", "i")
                       for t in toks)
        n_mixed = sum(bool(mixed_re.search(t)) for t in toks)
        score = (n_single + n_mixed) * 1000 // len(toks)
        docs, fl, tk, ar, mx = per.get(r["source"], (0, 0, 0, 0, 0))
        per[r["source"]] = (docs + 1, fl + (score >= 30),
                            tk + len(toks), ar + n_single + n_mixed,
                            max(mx, score))
    got = {r["source"]: r for r in
           q_text_ocr_artifacts(spark, SF).collect()}
    assert set(got) == set(per)
    for s, (docs, fl, tk, ar, mx) in per.items():
        r = got[s]
        assert (r["n_docs"], r["flagged_docs"], r["tokens"],
                r["artifacts"], r["max_score_pm"]) == (docs, fl, tk, ar, mx)
        assert r["artifact_ppm"] == ar * 10**6 // tk
    # damaged 13th-doc cohort flags, and it is a minority
    total_f = sum(r["flagged_docs"] for r in got.values())
    total_d = sum(r["n_docs"] for r in got.values())
    assert 0 < total_f <= total_d // 5


def test_markdown_structure_golden(spark):
    per = {}
    for r in _docs(spark):
        s = (_MD_HEADER + r["text"] if r["doc_id"] % 5 == 0
             else r["text"])
        lines = s.split("\n")
        h = sum(l.startswith("#") for l in lines)
        it = sum(l.startswith("- ") for l in lines)
        fc = sum(l.startswith("```") for l in lines)
        docs, st, nl, hh, ii, ff = per.get(r["source"],
                                           (0, 0, 0, 0, 0, 0))
        per[r["source"]] = (docs + 1, st + (h > 0 or it > 0 or fc > 0),
                            nl + len(lines), hh + h, ii + it, ff + fc)
    got = {r["source"]: r for r in
           q_text_markdown_structure(spark, SF).collect()}
    assert set(got) == set(per)
    for s, (docs, st, nl, hh, ii, ff) in per.items():
        r = got[s]
        assert (r["n_docs"], r["structured_docs"], r["lines"],
                r["headings"], r["list_items"], r["code_fences"]) == \
            (docs, st, nl, hh, ii, ff)
        assert r["structured_ppm"] == st * 10**6 // docs
        # injected preamble shape: 2 headings + 2 items + 2 fence lines
        assert r["headings"] >= 2 * (r["structured_docs"] - docs // 5)
    assert any(r["structured_docs"] > 0 for r in got.values())
