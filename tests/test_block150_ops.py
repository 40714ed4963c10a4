"""Block-150 operators: variance pruning, DNS prefetch planning, slug
classification."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_embeddings_variance_prune,
                                   q_frontier_dns_prefetch_plan,
                                   q_url_slug_classify)

SF = "/root/testdata/sf0.001"


def test_variance_prune_replay(spark):
    vecs = [r.embedding for r in
            spark.read.parquet(f"{SF}/embeddings.parquet")
            .select("embedding").collect()]
    dims = len(vecs[0])
    stats = []
    for d in range(dims):
        qs = [int(round(v[d] * 1000)) for v in vecs]
        n, s1, s2 = len(qs), sum(qs), sum(q * q for q in qs)
        stats.append((d, n, n * s2 - s1 * s1))
    ranking = sorted(stats, key=lambda t: (-t[2], t[0]))
    got = {r.dim: r for r in
           q_embeddings_variance_prune(spark, SF).collect()}
    assert set(got) == set(range(dims))
    for rank, (d, n, var) in enumerate(ranking, 1):
        r = got[d]
        assert (r.n, r.var_num, r.rank) == (n, var, rank), d
        assert r.keep == int(rank <= 32)
    assert sum(r.keep for r in got.values()) == 32
    # variance numerator is the exact identity, never negative
    assert all(r.var_num >= 0 for r in got.values())


def test_dns_prefetch_replay(spark):
    wave = Counter()
    for r in spark.read.parquet(f"{SF}/orders.parquet") \
            .select("o_orderkey").collect():
        wave[r.o_orderkey % 300] += 1
    got = {r.host: r for r in
           q_frontier_dns_prefetch_plan(spark, SF).collect()}
    assert set(got) == {f"h{h}" for h in wave}
    for h, n in wave.items():
        r = got[f"h{h}"]
        assert r.n_urls == n
        cached = h % 4 != 0
        ttl = (h * 7) % 120 - 60
        assert r.cached == int(cached)
        assert r.ttl_remaining == (ttl if cached else -1)
        assert r.needs_resolve == int(not cached or ttl <= 0)
        assert r.resolver_shard == h % 16
    # the plan saves real work: some hosts are warm with valid TTL
    assert any(r.needs_resolve == 0 for r in got.values())
    assert any(r.needs_resolve == 1 for r in got.values())


def test_slug_classify_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    segs = {}
    for k in ks:
        if k % 4 == 0:
            seg = f"my-article-title-{k % 9}"
        elif k % 4 == 1:
            seg = hashlib.md5(str(k).encode()).hexdigest()[:16]
        elif k % 4 == 2:
            seg = str(k)
        else:
            seg = f"page{k % 7}"
        segs[k] = seg

    def classify(s):
        if re.fullmatch(r"[0-9]+", s):
            return "numeric"
        if re.fullmatch(r"[0-9a-f]{8,}", s):
            return "hex_id"
        if re.fullmatch(r"[a-z]+(-[a-z0-9]+)+", s):
            return "slug"
        if re.fullmatch(r"[a-z]+[0-9]*", s):
            return "word"
        return "other"

    per_host = defaultdict(lambda: [0, 0])
    for k, seg in segs.items():
        c = classify(seg)
        per_host[k % 50][0] += 1
        per_host[k % 50][1] += int(c in ("slug", "word"))
    got = {r.rid: r for r in q_url_slug_classify(spark, SF).collect()}
    for k, seg in segs.items():
        r = got[k]
        c = classify(seg)
        assert (r.last_seg, r.seg_class) == (seg, c), k
        assert r.readable == int(c in ("slug", "word"))
        tot, rd = per_host[k % 50]
        assert r.host_readable_ppm == rd * 1000000 // tot
    classes = {r.seg_class for r in got.values()}
    assert {"slug", "hex_id", "numeric", "word"} <= classes
