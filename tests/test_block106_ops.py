"""Block-106 operators: int8 scalar-quantization audit, UCB1 host
bandit, capped-proportional domain-mix waterfill."""

from __future__ import annotations

import math
from collections import defaultdict

from genesis_spark.queries import (q_corpus_mix_waterfill,
                                   q_embeddings_sq_int8,
                                   q_frontier_bandit_ucb)

SF = "/root/testdata/sf0.001"


def test_sq_int8_golden(spark):
    vecs = {r["vec_id"]: list(r["embedding"]) for r in
            spark.read.parquet(f"{SF}/embeddings.parquet").collect()}
    got = {r["vec_id"]: r for r in
           q_embeddings_sq_int8(spark, SF).collect()}
    assert set(got) == set(vecs)
    for vid, v in vecs.items():
        q = [int(round(float(x) * 1e6)) for x in v]
        mn, mx = min(q), max(q)
        rng = mx - mn
        es = []
        for x in q:
            if rng > 0:
                c = ((x - mn) * 254 + rng // 2) // rng
                deq = mn + (c * rng + 127) // 254
                es.append(deq - x)
            else:
                es.append(0)
        r = got[vid]
        assert (r["mn"], r["mx"], r["dims"]) == (mn, mx, len(q))
        assert r["err2"] == sum(e * e for e in es)
        assert r["max_abs_err"] == max(abs(e) for e in es)
        assert r["err2_per_dim"] == sum(e * e for e in es) // len(q)
        # 255-level quantization error is bounded by half a step
        if rng > 0:
            assert r["max_abs_err"] <= rng // 254 + 1


def test_bandit_ucb_golden(spark):
    per = defaultdict(lambda: [0, 0])
    for r in spark.read.parquet(f"{SF}/orders.parquet") \
            .select("o_orderkey").collect():
        k = r["o_orderkey"]
        h = k % 60
        rew = int(k % 2 == 0) if h % 4 == 0 else int(k % 5 == 0)
        per[h][0] += 1
        per[h][1] += rew
    big_n = sum(n for n, _r in per.values())
    ilog2 = big_n.bit_length() - 1
    exp = {}
    for h, (n, rw) in per.items():
        x = (1386294 * ilog2) * 10**6 // n
        s = math.isqrt(x)
        exp[f"h{h}"] = (n, rw, rw * 10**6 // n, s)
    best = max(m + b for (_n, _r, m, b) in exp.values())
    got = {r["host_key"]: r for r in
           q_frontier_bandit_ucb(spark, SF).collect()}
    assert set(got) == set(exp)
    for hk, (n, rw, mean, bonus) in exp.items():
        r = got[hk]
        assert (r["n_pulls"], r["n_rewards"]) == (n, rw)
        assert r["mean_ppm"] == mean
        # the +-1-corrected sqrt must equal the true integer sqrt
        assert r["bonus_ppm"] == bonus
        assert r["ucb_ppm"] == mean + bonus
        assert r["is_selected"] == int(mean + bonus == best)
    assert sum(r["is_selected"] for r in got.values()) >= 1
    # rich arms dominate the mean; poor arms keep a bigger bonus
    rich = [r for r in got.values() if int(r["host_key"][1:]) % 4 == 0]
    poor = [r for r in got.values() if int(r["host_key"][1:]) % 4 != 0]
    assert (sum(r["mean_ppm"] for r in rich) / len(rich)
            > sum(r["mean_ppm"] for r in poor) / len(poor))


def test_mix_waterfill_golden(spark):
    per = defaultdict(int)
    for r in spark.read.parquet(f"{SF}/documents.parquet") \
            .select("source", "text").collect():
        if r["text"] is not None:
            per[r["source"]] += len(r["text"].split(" "))
    budget = sum(per.values())
    share = {s: (int(s[3:]) % 4 + 1) * 20000 for s in per}
    alloc1, capped = {}, {}
    for s in per:
        want = share[s] * budget // 10**6
        alloc1[s] = min(per[s], want)
        capped[s] = int(want >= per[s])
    surplus = budget - sum(alloc1.values())
    u_share = sum(share[s] for s in per if not capped[s])
    exp = {}
    for s in per:
        if capped[s] or u_share == 0:
            a = alloc1[s]
        else:
            a = min(per[s], alloc1[s] + share[s] * surplus // u_share)
        exp[s] = a
    got = {r["source"]: r for r in
           q_corpus_mix_waterfill(spark, SF).collect()}
    assert set(got) == set(per)
    for s in per:
        r = got[s]
        assert r["avail_tokens"] == per[s]
        assert r["target_ppm"] == share[s]
        assert r["capped"] == capped[s]
        assert r["alloc_tokens"] == exp[s]
        assert r["fill_ppm"] == exp[s] * 10**6 // per[s]
        assert r["realized_ppm"] == exp[s] * 10**6 // budget
    # the 8%-target sources cap on a ~5% inventory, 2% never do
    assert all(got[s]["capped"] == 1 for s in per
               if share[s] == 80000)
    assert all(got[s]["capped"] == 0 for s in per
               if share[s] == 20000)
    # allocation never exceeds budget or availability
    assert sum(exp.values()) <= budget
    assert all(exp[s] <= per[s] for s in per)
