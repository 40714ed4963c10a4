"""Block-81 operators: Markov per-state entropy, SLO error-budget burn,
kNN hubness audit."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math

from genesis_spark.queries import (q_embeddings_hubness_audit,
                                   q_events_markov_entropy,
                                   q_host_error_burn)

SF = "/root/testdata/sf0.001"


def test_markov_entropy_golden(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "ts", "event_id", "event_type").collect()
    per_user = {}
    for r in ev:
        per_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"]))
    trans = {}
    for seq in per_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    per_state = {}
    for (a, b), n in trans.items():
        per_state.setdefault(a, {})[b] = n
    grand = sum(trans.values())
    got = {r["prev_type"]: r for r in
           q_events_markov_entropy(spark, SF).collect()}
    assert set(got) == set(per_state)
    for a, succ in per_state.items():
        tot = sum(succ.values())
        h = sum((n / tot) * (math.log(tot) - math.log(n)) / math.log(2)
                for n in succ.values())
        r = got[a]
        assert r["n_trans"] == tot
        assert r["n_succ"] == len(succ)
        assert abs(r["h_bits"] - round(h, 4)) < 2e-4
        if len(succ) > 1:
            assert abs(r["h_norm"]
                       - round(round(h, 4) / math.log2(len(succ)), 4)) \
                < 2e-4
        assert r["weight_ppm"] == tot * 10**6 // grand
        # entropy bounds: 0 <= H <= log2(n_succ)
        assert -1e-9 <= r["h_bits"] <= math.log2(max(len(succ), 2)) + 1e-9


def test_error_burn_windows_golden(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "ts", "event_type").collect()
    rows = [(r["user_id"] % 20, int(r["ts"].timestamp()) // 86400,
             r["event_type"] == "error") for r in ev]
    mx = max(d for _, d, _ in rows)
    per = {}
    for h, d, e in rows:
        n7, e7, n1, e1 = per.get(h, (0, 0, 0, 0))
        if d > mx - 7:
            n7, e7 = n7 + 1, e7 + e
        if d > mx - 1:
            n1, e1 = n1 + 1, e1 + e
        per[h] = (n7, e7, n1, e1)
    per = {h: v for h, v in per.items() if v[0] > 0}
    got = {r["host_id"]: r for r in q_host_error_burn(spark, SF).collect()}
    assert set(got) == set(per)
    for h, (n7, e7, n1, e1) in per.items():
        r = got[h]
        assert (r["n7"], r["e7"], r["n1"], r["e1"]) == (n7, e7, n1, e1)
        r1 = e1 * 10**6 // n1 if n1 else 0
        r7 = e7 * 10**6 // n7
        assert (r["rate1_ppm"], r["rate7_ppm"]) == (r1, r7)
        b1, b7 = r1 * 100 // 10000, r7 * 100 // 10000
        assert (r["burn1_centi"], r["burn7_centi"]) == (b1, b7)
        want = ("page" if b1 >= 1440 else
                "ticket" if b7 >= 300 else "ok")
        assert r["verdict"] == want
    # the synthetic error share (~1/6 of events) burns hot against a 1%
    # budget: the alert thresholds must actually fire somewhere
    assert any(r["verdict"] != "ok" for r in got.values())


def test_hubness_matches_bruteforce(spark):
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in
            spark.read.parquet(f"{SF}/embeddings.parquet").collect()}
    norms = {v: math.sqrt(sum(x * x for x in vec))
             for v, vec in vecs.items()}
    occ = {v: 0 for v in vecs}
    for q, qv in vecs.items():
        scored = []
        for b, bv in vecs.items():
            if b == q:
                continue
            cos = sum(a * c for a, c in zip(qv, bv)) / (norms[q] * norms[b])
            scored.append((-cos, b))
        scored.sort()
        for _, b in scored[:5]:
            occ[b] += 1
    got = {r["vec_id"]: r for r in
           q_embeddings_hubness_audit(spark, SF).collect()}
    assert set(got) == set(vecs)
    for v in vecs:
        r = got[v]
        assert r["n5"] == occ[v]
        assert r["is_hub"] == int(occ[v] >= 10)
        assert r["is_antihub"] == int(occ[v] == 0)
    # conservation: total k-occurrences == 5 per query
    assert sum(r["n5"] for r in got.values()) == 5 * len(vecs)
    # near-random 64-dim vectors skew: hubs and anti-hubs both exist
    assert any(r["is_hub"] for r in got.values())
    assert any(r["is_antihub"] for r in got.values())
