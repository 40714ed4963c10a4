"""Block-94 operators: difference-in-differences, alignment/uniformity,
hreflang reciprocity audit."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
import math

from genesis_spark.queries import (q_embeddings_align_uniformity,
                                   q_events_did, q_url_hreflang_audit)

SF = "/root/testdata/sf0.001"


def test_did_two_by_two_golden(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "ts", "value").collect()
    pre, post = {}, {}
    for r in ev:
        day = int(r["ts"].timestamp()) // 86400
        cents = int(round(r["value"] * 100))
        tgt = pre if day < 19737 else post
        tgt[r["user_id"]] = tgt.get(r["user_id"], 0) + cents
    users = set(pre) | set(post)
    arms = {a: [u for u in users if u % 2 == a] for a in (0, 1)}
    means = {}
    for a, us in arms.items():
        n = len(us)
        means[a] = (sum(pre.get(u, 0) for u in us) * 1000 // n,
                    sum(post.get(u, 0) for u in us) * 1000 // n, n)
    d1 = means[1][1] - means[1][0]
    d0 = means[0][1] - means[0][0]
    got = {r["arm"]: r for r in q_events_did(spark, SF).collect()}
    assert set(got) == {0, 1}
    for a in (0, 1):
        r = got[a]
        assert r["n_users"] == means[a][2]
        assert r["pre_mean_milli"] == means[a][0]
        assert r["post_mean_milli"] == means[a][1]
        assert r["delta_milli"] == means[a][1] - means[a][0]
        assert r["did_milli"] == d1 - d0


def test_align_uniformity_golden(spark):
    rows = sorted(
        [(r["vec_id"], r["label"], [float(x) for x in r["embedding"]])
         for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()])
    emb = {v: e for v, _, e in rows}

    def d2(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        cos = sum(x * y for x, y in zip(a, b)) / (na * nb)
        return 2.0 - 2.0 * cos

    by_label = {}
    for v, l, _ in rows:
        by_label.setdefault(l, []).append(v)
    pos = []
    for l, vs in by_label.items():
        pos += [(a, b) for a, b in zip(vs, vs[1:])]
    ids = [v for v, _, _ in rows]
    n = len(ids)
    perm = [(ids[i], ids[(i * 7 + 1) % n]) for i in range(n)
            if i != (i * 7 + 1) % n]
    align_d = [d2(emb[a], emb[b]) for a, b in pos]
    unif_d = [d2(emb[a], emb[b]) for a, b in perm]
    align = round(sum(align_d) / len(align_d), 4)
    unif = round(math.log(sum(math.exp(-2 * d) for d in unif_d)
                          / len(unif_d)), 4)
    got = {r["metric"]: r for r in
           q_embeddings_align_uniformity(spark, SF).collect()}
    assert set(got) == {"alignment", "uniformity"}
    assert got["alignment"]["n_pairs"] == len(pos)
    assert got["uniformity"]["n_pairs"] == len(perm)
    assert abs(got["alignment"]["value"] - align) < 2e-4
    assert abs(got["uniformity"]["value"] - unif) < 2e-4
    # sanity: d2 in [0,4] so alignment in range; uniformity <= 0
    assert 0 <= got["alignment"]["value"] <= 4
    assert got["uniformity"]["value"] <= 0


def test_hreflang_audit_golden(spark):
    keys = {r["o_orderkey"] % 120 for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()}
    edges = set()
    for h in keys:
        edges.add((f"http://s{h}.onion/0", f"http://s{h}.onion/1"))
        if int(hashlib.md5(str(h).encode()).hexdigest()[:6], 16) % 5:
            edges.add((f"http://s{h}.onion/1", f"http://s{h}.onion/0"))
        edges.add((f"http://s{h}.onion/1", f"http://s{h}.onion/2"))
    declarers = {s for s, _ in edges}
    per = {}
    for s, d in edges:
        if (d, s) in edges:
            v = "reciprocal"
        elif d not in declarers:
            v = "dangling"
        else:
            v = "asymmetric"
        n, pages = per.get(v, (0, set()))
        pages.add(s)
        per[v] = (n + 1, pages)
    got = {r["verdict"]: r for r in q_url_hreflang_audit(spark, SF).collect()}
    assert set(got) == set(per) == {"reciprocal", "dangling",
                                    "asymmetric"}
    for v, (n, pages) in per.items():
        assert got[v]["n_edges"] == n
        assert got[v]["n_pages"] == len(pages)
