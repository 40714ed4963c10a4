"""RAKE phrase segmentation closed form and UCB1 scheduling properties."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math

from genesis_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_rake_phrase_segmentation_closed_form(spark, tmp_path):
    # "deep learning" always appears as one stopword-free phrase;
    # RAKE's deg/freq must score its words above a lone frequent word.
    texts = ["deep learning is the best deep learning tool"] * 3 + \
            ["tool of the tool and tool"] * 2
    df = spark.createDataFrame(
        [(i + 1, t, "s", "en", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, source string, lang string, "
        "n_chars long")
    out = str(tmp_path / "rake")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    got = {r["word"]: r for r in Q.q_text_rake(spark, out).collect()}
    # replay: each "deep learning ..." doc has phrases
    # [deep learning] [best deep learning tool]  (is/the are stops)
    # -> deep: freq 6, deg = 3*(2+4) = 18; learning same
    assert got["deep"]["freq"] == 6 and got["deep"]["deg"] == 18
    assert got["learning"]["freq"] == 6 and got["learning"]["deg"] == 18
    assert got["deep"]["rake_score"] == 3.0
    # tool: appears in 4-word phrase (x3 docs) and alone 3x in 2 docs
    # -> freq = 3 + 6 = 9, deg = 3*4 + 6*1 = 18, score = 2.0
    assert got["tool"]["freq"] == 9 and got["tool"]["deg"] == 18
    assert got["tool"]["rake_score"] == 2.0
    # phrase words outrank the lone-occurrence word
    assert got["deep"]["rake_score"] > got["tool"]["rake_score"]
    # stopwords never emitted; short words never emitted
    assert "the" not in got and "is" not in got and "of" not in got


def test_ucb_exploration_bonus_properties(spark):
    rows = Q.q_frontier_ucb(spark, SF).collect()
    assert len(rows) == 50
    n_all = sum(r["n_pulls"] for r in rows)
    for r in rows:
        mean = r["r_total"] / r["n_pulls"]
        bonus = math.sqrt(2 * math.log(n_all) / r["n_pulls"])
        assert abs(r["ucb"] - round(mean + bonus, 4)) < 1e-9
        # reward is o_orderkey % 3: mean in [0, 2], bonus positive
        assert 0.0 <= mean <= 2.0 and bonus > 0
    # ranks are a permutation ordered by (ucb desc, host asc)
    rows.sort(key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, 51))
    for a, b in zip(rows, rows[1:]):
        assert (a["ucb"], b["host"]) >= (b["ucb"], a["host"]) or \
            a["ucb"] > b["ucb"]
    # a rarely-pulled host must carry a larger bonus than a heavy one
    light = min(rows, key=lambda r: r["n_pulls"])
    heavy = max(rows, key=lambda r: r["n_pulls"])
    if light["n_pulls"] < heavy["n_pulls"]:
        bl = math.sqrt(2 * math.log(n_all) / light["n_pulls"])
        bh = math.sqrt(2 * math.log(n_all) / heavy["n_pulls"])
        assert bl > bh
