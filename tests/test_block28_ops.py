"""Closed-form replay for the PMI collocation row: a corpus engineered
so one bigram is a perfect collocation (always adjacent) and another is
frequent but independent — PMI must rank the collocation first and both
quantized values must equal the Python replay."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math

from genesis_spark import queries as Q


def test_pmi_ranks_collocation_over_frequency(spark, tmp_path):
    # "aa bb" always adjacent (perfect collocation);
    # "cc" and "dd" co-occur adjacently sometimes but are spread out.
    texts = (["aa bb cc xx dd yy"] * 3 +
             ["aa bb dd zz cc qq"] * 3 +
             ["cc dd aa bb ww vv"] * 3)
    df = spark.createDataFrame(
        [(i * 2 + 1, t, "s", "en", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, source string, lang string, "
        "n_chars long")
    out = str(tmp_path / "pmi")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    rows = Q.q_text_bigram_pmi(spark, out).collect()
    got = {(r["wa"], r["wb"]): r for r in rows}

    # python replay
    toks = [t.split(" ") for t in texts]
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for ws in toks:
        for w_ in ws:
            uni[w_] = uni.get(w_, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    n = sum(uni.values())
    kept = {k: c for k, c in bi.items() if c >= 3}
    m = sum(bi.values())   # ALL adjacent pairs, not just kept ones
    pmi = {k: int(round(math.log((c / m) /
                                 ((uni[k[0]] / n) * (uni[k[1]] / n)))
                        * 1e6))
           for k, c in kept.items()}
    assert set(got) == set(pmi)
    for k, v in pmi.items():
        assert got[k]["pmi_u"] == v
        assert got[k]["c_ab"] == kept[k]
    # same marginals (9 each), 3x the joint count: the always-adjacent
    # pair must outscore the sometimes-adjacent one. (Rare singleton
    # pairs like ww_vv legitimately rank higher still — the classic
    # rare-pair PMI bias, which the c_ab >= 3 floor only bounds.)
    assert pmi[("aa", "bb")] > pmi[("cc", "dd")]
    assert got[("aa", "bb")]["rank"] < got[("cc", "dd")]["rank"]
    # ranks replay exactly
    order = sorted(pmi, key=lambda k: (-pmi[k], k))
    for r, k in enumerate(order, 1):
        assert got[k]["rank"] == r
