"""Block-108 operators: two-phase anneal data plan, NFC
normalization audit."""

from __future__ import annotations

import re
from collections import defaultdict

from genesis_spark.queries import (q_corpus_anneal_plan,
                                   q_text_unicode_nfc)

import pytest

pytestmark = pytest.mark.block

SF = "/root/testdata/sf0.001"


def test_anneal_plan_golden(spark):
    per = defaultdict(lambda: [0, 0])
    for r in spark.read.parquet(f"{SF}/documents.parquet") \
            .select("source", "text").collect():
        if r["text"] is None:
            continue
        per[r["source"]][0] += len(r["text"].split(" "))
        per[r["source"]][1] += len(r["text"])
    budget = sum(t for t, _c in per.values()) // 10
    ranked = sorted(per, key=lambda s: (-(per[s][1] * 1000 // per[s][0]),
                                        s))
    got = {r["source"]: r for r in
           q_corpus_anneal_plan(spark, SF).collect()}
    assert set(got) == set(per)
    cum = 0
    phases = []
    for i, s in enumerate(ranked, 1):
        tokens = per[s][0]
        take = max(0, min(tokens, budget - cum))
        cum += tokens
        r = got[s]
        assert r["rank"] == i
        assert r["tokens"] == tokens
        assert r["quality_milli"] == per[s][1] * 1000 // tokens
        assert r["tokens_anneal"] == take
        assert r["tokens_pretrain"] == tokens - take
        exp_phase = ("anneal" if take == tokens else
                     "mixed" if take > 0 else "pretrain")
        assert r["phase"] == exp_phase
        phases.append(exp_phase)
    # the plan is a prefix: anneal sources, <=1 mixed, then pretrain
    assert phases.count("mixed") <= 1
    joined = ",".join(phases)
    assert re.fullmatch(r"(anneal,)*(mixed,)?(pretrain,?)*", joined)
    # anneal mass exactly fills the 10% budget
    assert sum(r["tokens_anneal"] for r in got.values()) == budget


def test_unicode_nfc_golden(spark):
    comb_acute, comb_grave = "\u0301", "\u0300"
    e_acute, a_grave = "\u00e9", "\u00e0"
    got = {r["doc_id"]: r for r in
           q_text_unicode_nfc(spark, SF).collect()}
    for r in spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text").collect():
        if r["text"] is None:
            continue
        did = r["doc_id"]
        if did % 5 == 0:
            xt = r["text"] + " cafe" + comb_acute + " a" + comb_grave \
                + " la carte"
        elif did % 7 == 0:
            xt = r["text"] + " caf" + e_acute + " " + a_grave \
                + " la carte"
        else:
            xt = r["text"]
        nfc = xt.replace("e" + comb_acute, e_acute) \
                .replace("a" + comb_grave, a_grave)
        g = got[did]
        assert g["n_combining"] == xt.count(comb_acute) \
            + xt.count(comb_grave)
        assert g["len_raw"] == len(xt)
        assert g["len_nfc"] == len(nfc)
        assert g["changed"] == int(len(nfc) != len(xt))
        # decomposed docs change; precomposed twins are already NFC
        if did % 5 == 0:
            assert g["changed"] == 1 and g["n_combining"] >= 2
        elif did % 7 == 0:
            assert g["changed"] == 0 and g["n_combining"] == 0
