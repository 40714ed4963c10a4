"""Block-130 operators: cross-source overlap matrix, third-party
dependency census, shard autoscaling plan."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_corpus_source_overlap,
                                   q_frontier_shard_autoscale,
                                   q_host_third_party_deps)

SF = "/root/testdata/sf0.001"


def test_source_overlap_python_replay(spark):
    docs = [(r.source, r.text) for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("source", "text").collect() if r.text is not None]
    sizes = defaultdict(int)
    by_fp = defaultdict(lambda: [set(), 0])
    for src, text in docs:
        sizes[src] += 1
        fp = hashlib.md5(text[:60].encode()).hexdigest()
        by_fp[fp][0].add(src)
        by_fp[fp][1] += 1
    want = defaultdict(lambda: [0, 0])
    for fp, (srcs, n) in by_fp.items():
        ss = sorted(srcs)
        for i, a in enumerate(ss):
            for b in ss[i + 1:]:
                want[(a, b)][0] += 1
                want[(a, b)][1] += n
    got = {(r.src_a, r.src_b): (r.n_shared_fps, r.n_docs_involved,
                                r.overlap_ppm)
           for r in q_corpus_source_overlap(spark, SF).collect()}
    assert set(got) == set(want)
    assert got, "fixture has cross-source prefix collisions"
    for (a, b), (nf, nd) in want.items():
        ppm = nf * 1000000 // min(sizes[a], sizes[b])
        assert got[(a, b)] == (nf, nd, ppm), (a, b)


def test_third_party_deps_python_replay(spark):
    keys = [r.o_orderkey for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    tot = defaultdict(lambda: [0, 0])
    per_dep = defaultdict(lambda: defaultdict(int))
    for k in keys:
        h = f"h{k % 60}"
        assets = [f"{h}/img{k}.png"]
        if k % 2 == 0:
            assets.append(f"cdn.h{k % 5}/lib.js")
        if k % 3 == 0:
            assets.append("fonts.h9/face.woff2")
        if k % 7 == 0:
            assets.append("analytics.h3/beacon.gif")
        for a in assets:
            dep = a.split("/")[0]
            tot[h][0] += 1
            if dep != h:
                tot[h][1] += 1
                per_dep[h][dep] += 1
    got = {r.host_key: r for r in
           q_host_third_party_deps(spark, SF).collect()}
    assert set(got) == set(tot)
    for h, (na, nf) in tot.items():
        r = got[h]
        assert (r.n_assets, r.n_foreign) == (na, nf)
        assert r.foreign_ppm == nf * 1000000 // na
        if per_dep[h]:
            top = max(per_dep[h].items(), key=lambda t: (t[1], t[0]))
            assert (r.top_dep, r.top_dep_n) == top, h
        else:
            assert (r.top_dep, r.top_dep_n) == ("none", 0)


def test_shard_autoscale_replay_and_actions(spark):
    keys = [r.o_orderkey for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    census = defaultdict(lambda: [0, 0])
    for k in keys:
        shard = int(hashlib.md5(str(k).encode()).hexdigest()[:15],
                    16) % 16
        if k % 3 == 0:
            census[shard][0] += 1
        if k % 40 < 10:
            census[shard][1] += 1
    got = {r.shard: r for r in
           q_frontier_shard_autoscale(spark, SF).collect()}
    assert set(got) == set(census)
    for shard, (backlog, arr) in census.items():
        lam = arr // 10
        steady = (lam * 12 // 10 + 119) // 120
        drain = (backlog + 3599) // 3600
        required = max(steady + drain, 1)
        current = 2 + shard % 3
        r = got[shard]
        assert (r.backlog, r.lam, r.required, r.current) == (
            backlog, lam, required, current)
        want = ("scale_up" if required > current else
                "scale_down" if required < current else "hold")
        assert r.action == want
    # fixture produces at least two distinct actions
    assert len({r.action for r in got.values()}) >= 2
