"""Unit tests for the round-3 block-7 operators: the Gopher quality
gate, SemDeDup semantic near-dup removal, OPIC crawl priority, HITS
hub/authority scores, plus plan audits for the batch rows."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from pyspark.sql import functions as F

from genesis_spark.operators import similarity as SIM
from genesis_spark.operators import textstats as TS


# ---------------------------------------------------------------------------
# Gopher quality gate
# ---------------------------------------------------------------------------

def _gopher(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["doc_id"]: r for r in TS.gopher_quality(df, **kw).collect()}


def test_gopher_passing_doc(spark):
    # 50 words, mean len in [3,10], all alpha, 'the' and 'of' present
    words = ["the", "of"] + ["word"] * 48
    out = _gopher(spark, [(1, " ".join(words))])
    r = out[1]
    assert r["n_words"] == 50
    assert 3.0 <= r["mean_word_len"] <= 10.0
    assert r["alpha_frac"] == 1.0
    assert r["stop_hits"] == 2
    assert r["symbol_ratio"] == 0.0
    assert r["gopher_pass"] is True


def test_gopher_word_count_and_stopword_rules(spark):
    short = " ".join(["the", "of"] + ["word"] * 10)       # 12 words < 50
    nostop = " ".join(["word"] * 50)                       # 0 stop hits
    onestop = " ".join(["the"] * 50)                       # 1 DISTINCT stop
    out = _gopher(spark, [(1, short), (2, nostop), (3, onestop)])
    assert out[1]["gopher_pass"] is False        # word count
    assert out[2]["gopher_pass"] is False        # stop_hits = 0
    assert out[2]["stop_hits"] == 0
    # repeated 'the' counts ONCE — Gopher requires two distinct words
    assert out[3]["stop_hits"] == 1
    assert out[3]["gopher_pass"] is False


def test_gopher_symbol_and_alpha_rules(spark):
    # 50 words with 10 '#' symbols -> ratio 0.2 > 0.1
    symboly = " ".join(["the", "of"] + ["word"] * 38 + ["#"] * 10)
    # 50 words, 15 pure-numeric -> alpha_frac 0.7 < 0.8
    numeric = " ".join(["the", "of"] + ["word"] * 33 + ["123"] * 15)
    out = _gopher(spark, [(1, symboly), (2, numeric)])
    assert out[1]["symbol_ratio"] == 0.2
    assert out[1]["gopher_pass"] is False
    assert out[2]["alpha_frac"] == 0.7
    assert out[2]["gopher_pass"] is False
    # '...' counts as a symbol too
    dots = " ".join(["the", "of"] + ["word..."] * 48)
    out2 = _gopher(spark, [(1, dots)])
    assert out2[1]["symbol_ratio"] == 0.96
    assert out2[1]["gopher_pass"] is False


def test_gopher_mean_word_len_bounds(spark):
    tiny = " ".join(["the", "of"] + ["ab"] * 48)          # mean ~2.08 < 3
    out = _gopher(spark, [(1, tiny)])
    assert out[1]["mean_word_len"] < 3.0
    assert out[1]["gopher_pass"] is False


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------

def test_semantic_dedup_drops_larger_id_twin_keeps_distinct(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),    # identical to 1 -> same cell, dropped
        (3, [0.0, 1.0, 0.0, 0.0]),    # orthogonal to both -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           SIM.semantic_dedup(df, threshold=0.85, n_centroids=4,
                              dim=4).collect()}
    assert out[1]["kept"] is True
    assert out[2]["kept"] is False
    assert out[3]["kept"] is True
    # identical vectors must share a cell
    assert out[1]["cell"] == out[2]["cell"]


def test_semantic_dedup_threshold_boundary_on_rounded_cosine(spark):
    import math
    # cos(v1, v2) exactly 0.85 after rounding -> dropped (>= threshold)
    a = 0.85
    b = math.sqrt(1 - a * a)
    rows = [(1, [1.0, 0.0]), (2, [a, b])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["kept"] for r in
           SIM.semantic_dedup(df, threshold=0.85, n_centroids=2,
                              dim=2).collect()}
    if out[2] is False:          # only binding when they share a cell
        assert out[1] is True


def test_semantic_dedup_requires_dim(spark):
    import pytest
    df = spark.createDataFrame([(1, [1.0])],
                               "vec_id long, embedding array<double>")
    with pytest.raises(TypeError):
        SIM.semantic_dedup(df, threshold=0.9)


# ---------------------------------------------------------------------------
# OPIC
# ---------------------------------------------------------------------------

def _graph_state(spark, edges, rounds=1, c0=1_000_000):
    """Pure-Spark replay of the OPIC recurrence used by frontier_opic,
    over an explicit edge list (the query derives edges from orders)."""
    e = spark.createDataFrame(edges, "src string, dst string")
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node"))).distinct())
    state = nodes.select("node", F.lit(c0).cast("long").alias("cash"),
                         F.lit(0).cast("long").alias("hist"))
    for _ in range(rounds):
        recv = (e.join(state.select(F.col("node").alias("src"), "cash"),
                       "src")
                .join(deg, "src")
                .select(F.col("dst").alias("node"),
                        F.expr("cash DIV outdeg").alias("share"))
                .groupBy("node").agg(F.sum("share").alias("recv")))
        state = (state.join(recv, "node", "left")
                 .select("node",
                         F.coalesce("recv", F.lit(0)).cast("long")
                         .alias("cash"),
                         (F.col("hist") + F.col("cash")).cast("long")
                         .alias("hist")))
    return {r["node"]: (r["cash"], r["hist"]) for r in state.collect()}


def test_opic_one_round_hand_computed(spark):
    # a -> b, a -> c, b -> a;  c dangling (cash dropped)
    out = _graph_state(spark, [("a", "b"), ("a", "c"), ("b", "a")],
                       rounds=1)
    assert out["a"] == (1_000_000, 1_000_000)   # receives all of b's cash
    assert out["b"] == (500_000, 1_000_000)     # half of a's cash
    assert out["c"] == (500_000, 1_000_000)


def test_opic_cash_never_increases_and_history_accumulates(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    prev_total = 4 * 1_000_000
    for rounds in (1, 2, 3):
        out = _graph_state(spark, edges, rounds=rounds)
        total_cash = sum(c for c, _ in out.values())
        # integer DIV drops remainders; dangling nodes drop everything
        assert total_cash <= prev_total
        prev_total = total_cash
    # history after 3 rounds = sum of the 3 cash snapshots
    out3 = _graph_state(spark, edges, rounds=3)
    assert all(h >= 1_000_000 for _, h in out3.values())


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------

def test_hits_hand_computed(spark):
    # hub page h links to two authorities x, y; x also links to y
    e = spark.createDataFrame(
        [("h", "x"), ("h", "y"), ("x", "y")], "src string, dst string")
    a1 = e.groupBy("dst").agg(F.count("*").alias("a1"))
    h1 = e.join(a1, "dst").groupBy("src").agg(F.sum("a1").alias("h1"))
    a2 = e.join(h1, "src").groupBy("dst").agg(F.sum("h1").alias("a2"))
    h1m = {r["src"]: r["h1"] for r in h1.collect()}
    a2m = {r["dst"]: r["a2"] for r in a2.collect()}
    # a1: x=1, y=2;  h1: h=1+2=3, x=2;  a2: x=h1(h)=3, y=h1(h)+h1(x)=5
    assert h1m == {"h": 3, "x": 2}
    assert a2m == {"x": 3, "y": 5}


# ---------------------------------------------------------------------------
# plan audits — batch block-7 rows must stay JVM-side
# ---------------------------------------------------------------------------

def test_block7_batch_rows_have_no_python_eval(spark):
    from genesis_spark import queries as Q
    sf = "/root/testdata/sf0.001"
    for fn in (Q.q_text_gopher, Q.q_dedup_semantic,
               Q.q_frontier_opic, Q.q_host_hits):
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, fn.__name__
        assert "ArrowEvalPython" not in plan, fn.__name__
