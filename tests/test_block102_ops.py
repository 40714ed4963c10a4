"""Block-102 operators: leave-one-source-out ablation, Chinchilla
data plan, loss-mask bill."""

from __future__ import annotations

from genesis_spark.queries import (_CHINCHILLA_SIZES,
                                   q_corpus_chinchilla_plan,
                                   q_corpus_loss_mask_audit,
                                   q_corpus_source_ablation)

import pytest

pytestmark = pytest.mark.block

SF = "/root/testdata/sf0.001"


def _per_source(spark):
    per = {}
    for r in spark.read.parquet(f"{SF}/documents.parquet") \
            .select("source", "text").collect():
        if r["text"] is None:
            continue
        t = len(r["text"].split(" "))
        c = len(r["text"])
        tk, ch, nd = per.get(r["source"], (0, 0, 0))
        per[r["source"]] = (tk + t, ch + c, nd + 1)
    return per


def test_source_ablation_golden(spark):
    per = _per_source(spark)
    tot_t = sum(t for t, _c, _n in per.values())
    tot_c = sum(c for _t, c, _n in per.values())
    corpus_cpt = tot_c * 1000 // tot_t
    got = {r["source"]: r for r in
           q_corpus_source_ablation(spark, SF).collect()}
    assert set(got) == set(per)
    for s, (tk, ch, _nd) in per.items():
        r = got[s]
        loo = (tot_c - ch) * 1000 // (tot_t - tk)
        assert (r["tokens"], r["chars"]) == (tk, ch)
        assert r["share_ppm"] == tk * 10**6 // tot_t
        assert r["cpt_milli"] == ch * 1000 // tk
        assert r["corpus_cpt_milli"] == corpus_cpt
        assert r["loo_cpt_milli"] == loo
        assert r["loo_delta_milli"] == loo - corpus_cpt
    # shares sum to ~1 and LOO deltas roughly balance around zero
    assert abs(sum(r["share_ppm"] for r in got.values()) - 10**6) < 100
    assert any(r["loo_delta_milli"] > 0 for r in got.values()) or \
        all(r["loo_delta_milli"] == 0 for r in got.values())


def test_chinchilla_plan_golden(spark):
    per = _per_source(spark)
    avail = sum(t for t, _c, _n in per.values())
    got = {r["params_m"]: r for r in
           q_corpus_chinchilla_plan(spark, SF).collect()}
    assert set(got) == set(_CHINCHILLA_SIZES)
    for m in _CHINCHILLA_SIZES:
        need = m * 10**6 * 20
        ep = (need * 100 + avail - 1) // avail
        r = got[m]
        assert r["tokens_needed"] == need
        assert r["avail_tokens"] == avail
        assert r["coverage_ppm"] == avail * 10**6 // need
        assert r["epochs_centi"] == ep
        assert r["feasible"] == int(ep <= 1600)
    # monotone: larger models need strictly more epochs
    eps = [got[m]["epochs_centi"] for m in sorted(_CHINCHILLA_SIZES)]
    assert eps == sorted(eps)
    # the tiny fixture cannot feed a 70B model compute-optimally
    assert got[70000]["feasible"] == 0


def test_loss_mask_audit_golden(spark):
    per = {}
    for r in spark.read.parquet(f"{SF}/documents.parquet") \
            .select("source", "text").collect():
        if r["text"] is None:
            continue
        n = len(r["text"].split(" "))
        m = n // 3 + 4
        t = n - n // 3
        ex, mk, tr, wf = per.get(r["source"], (0, 0, 0, 0))
        per[r["source"]] = (ex + 1, mk + m, tr + t, wf + (m >= t))
    got = {r["source"]: r for r in
           q_corpus_loss_mask_audit(spark, SF).collect()}
    assert set(got) == set(per)
    for s, (ex, mk, tr, wf) in per.items():
        r = got[s]
        assert (r["n_examples"], r["masked_tokens"],
                r["trained_tokens"], r["wasteful"]) == (ex, mk, tr, wf)
        assert r["billed_tokens"] == mk + tr
        assert r["efficiency_ppm"] == tr * 10**6 // (mk + tr)
        # 2/3 split: efficiency lives in (50%, 67%]
        assert 500000 < r["efficiency_ppm"] <= 670000
