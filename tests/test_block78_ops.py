"""Block-78 operators: largest-remainder TLD quota, MOSS winnowing
overlap pairs, frontier rank churn."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib

from genesis_spark.queries import (q_frontier_rank_churn,
                                   q_frontier_tld_quota, q_text_moss_pairs)

SF = "/root/testdata/sf0.001"


def _tld(k):
    m = k % 7
    if m == 0:
        return "onion"
    if m == 1:
        return "i2p"
    if m < 4:
        return "com"
    if m < 6:
        return "org"
    return "net"


def test_tld_quota_hamilton_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    counts = {}
    for k in keys:
        counts[_tld(k)] = counts.get(_tld(k), 0) + 1
    total = sum(counts.values())
    base = {t: c * 10000 // total for t, c in counts.items()}
    rem = {t: (c * 10000) % total for t, c in counts.items()}
    leftover = 10000 - sum(base.values())
    order = sorted(counts, key=lambda t: (-rem[t], t))
    quota = {t: base[t] + (1 if i < leftover else 0)
             for i, t in enumerate(order)}
    got = {r["tld"]: r for r in q_frontier_tld_quota(spark, SF).collect()}
    assert set(got) == set(counts)
    for t in counts:
        r = got[t]
        assert (r["n_hosts"], r["base_quota"], r["rem"], r["quota"]) == \
            (counts[t], base[t], rem[t], quota[t])
    # Hamilton invariant: quotas sum exactly to the budget
    assert sum(r["quota"] for r in got.values()) == 10000


def _corpus_docs(spark):
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["text"] is not None}
    out = dict(docs)
    for d, t in docs.items():
        if d % 2 == 0:
            out[d + 100000] = t if d % 5 == 0 else t.rsplit(" ", 1)[0]
    return out


def test_moss_pairs_winnowing_golden(spark):
    docs = _corpus_docs(spark)
    fps = {}
    for d, t in docs.items():
        w = t.split(" ")
        if len(w) < 9:
            continue
        grams = [hashlib.md5(" ".join(w[i:i + 4]).encode())
                 .hexdigest()[:12] for i in range(len(w) - 4)]
        sel = {min(grams[i:i + 5]) for i in range(len(grams) - 4)}
        fps[d] = sel
    df = {}
    for sel in fps.values():
        for f in sel:
            df[f] = df.get(f, 0) + 1
    kept = {d: {f for f in sel if df[f] <= 40} for d, sel in fps.items()}
    want = {}
    ds = sorted(kept)
    inv = {}
    for d in ds:
        for f in kept[d]:
            inv.setdefault(f, []).append(d)
    from itertools import combinations
    for f, members in inv.items():
        for a, b in combinations(members, 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    want = {k: v for k, v in want.items() if v >= 3}
    got = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in
           q_text_moss_pairs(spark, SF).collect()}
    assert got == want
    # exact twins (doc_id%10==0 gets a byte-identical copy) share ALL
    # selected fingerprints; most survive the df-guard and pair up (the
    # guard can starve a twin whose fingerprints are all corpus-hot, so
    # the invariant is a recall floor, not 100%)
    twins = [d for d in docs
             if d < 100000 and d % 10 == 0
             and len(docs[d].split(" ")) >= 9]
    hit = sum((d, d + 100000) in got for d in twins)
    assert hit >= len(twins) * 0.6


def test_rank_churn_footrule_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    hosts = {}
    for k in keys:
        hosts.setdefault(k % 50, []).append(k)
    got = {r["host_key"]: r for r in
           q_frontier_rank_churn(spark, SF).collect()}
    assert set(got) == {f"h{h}" for h in hosts}
    for h, ks in hosts.items():
        ra = {k: i + 1 for i, k in
              enumerate(sorted(ks, key=lambda k: (k % 97, k)))}
        rb = {k: i + 1 for i, k in
              enumerate(sorted(ks, key=lambda k: ((k * 31) % 97, k)))}
        r = got[f"h{h}"]
        assert r["n_urls"] == len(ks)
        assert r["footrule"] == sum(abs(ra[k] - rb[k]) for k in ks)
        assert r["max_disp"] == max(abs(ra[k] - rb[k]) for k in ks)
        assert r["top5_overlap"] == \
            sum(1 for k in ks if ra[k] <= 5 and rb[k] <= 5)
