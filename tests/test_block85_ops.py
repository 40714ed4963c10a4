"""Block-85 operators: AIMD fetch window, URL fragment policy,
vocabulary coverage curve."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_corpus_vocab_coverage,
                                   q_frontier_aimd_window,
                                   q_url_fragment_policy)

SF = "/root/testdata/sf0.001"


def test_aimd_window_control_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    per = {}
    for k in keys:
        h = f"h{k % 499}"
        w, e, s = per.get(h, (0, 0, 0))
        per[h] = (max(w, k % 8 + 1), e + k % 11,
                  max(s, int(k % 17 == 0)))
    got = {r["host_key"]: r for r in
           q_frontier_aimd_window(spark, SF).collect()}
    assert set(got) == set(per)
    for h, (w, e, s) in per.items():
        r = got[h]
        assert (r["cwnd"], r["n_err"], r["storm"]) == (w, e, s)
        if s:
            want, act = 1, "reset"
        elif e > 0:
            want, act = max(w // 2, 1), "halve"
        elif w >= 8:
            want, act = 8, "hold"
        else:
            want, act = w + 1, "grow"
        assert r["next_window"] == want
        assert r["delta"] == want - w
        assert r["action"] == act
        # window invariants: always in [1, 8]
        assert 1 <= r["next_window"] <= 8


def test_fragment_policy_golden(spark):
    got = {r["o_orderkey"]: r for r in
           q_url_fragment_policy(spark, SF).collect()}
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    assert set(got) == set(keys)
    classes = set()
    for k in keys:
        base = f"http://site{k % 150}.onion/doc{k % 40}"
        if k % 3 == 1:
            frag, cls = f"#sec{k % 12}", "anchor"
        elif k % 7 == 3:
            frag, cls = f"#!/page/{k % 9}", "hashbang"
        else:
            frag, cls = "", "none"
        r = got[k]
        assert r["url"] == base + frag
        assert r["dedup_key"] == base
        assert r["frag_class"] == cls
        if cls == "hashbang":
            assert r["fetch_url"] == \
                base + "?_escaped_fragment_=" + frag[3:]
        else:
            assert r["fetch_url"] == base
        classes.add(cls)
    assert classes == {"none", "anchor", "hashbang"}


def test_vocab_coverage_curve_golden(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("text").collect()
    tf = {}
    for r in docs:
        if r["text"] is None:
            continue
        for t in r["text"].split(" "):
            tf[t] = tf.get(t, 0) + 1
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(tf.values())
    got = {r["vocab_size"]: r for r in
           q_corpus_vocab_coverage(spark, SF).collect()}
    assert set(got) == {256, 1024, 4096, 16384}
    prev = -1
    for n in (256, 1024, 4096, 16384):
        covered = sum(c for _, c in ranked[:n])
        r = got[n]
        assert r["covered"] == covered
        assert r["total"] == total
        assert r["vocab_full"] == len(tf)
        assert r["coverage_ppm"] == covered * 10**6 // total
        # the curve is monotone non-decreasing in vocab size
        assert r["coverage_ppm"] >= prev
        prev = r["coverage_ppm"]
    # once the ladder exceeds the full vocabulary, coverage is total
    if len(tf) <= 16384:
        assert got[16384]["coverage_ppm"] == 10**6
