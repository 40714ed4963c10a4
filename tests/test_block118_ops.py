"""Block-118 operators: snapshot vacuum planning, ANN shard striping,
cross-site leak-victim overlap."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math
from collections import defaultdict

from genesis_spark.operators import similarity as SIM
from genesis_spark.queries import (_IVF_CENTROIDS, _IVF_DIM,
                                   q_embeddings_shard_plan,
                                   q_leak_victim_overlap,
                                   q_snapshot_vacuum_plan)

SF = "/root/testdata/sf0.001"


def _keys(spark):
    return [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]


def test_vacuum_plan_golden(spark):
    manifest = set()
    for k in _keys(spark):
        snap = k % 6
        fid = (k % 6) * 40 + (k * 7) % 80
        manifest.add((snap, fid))
    per = defaultdict(lambda: [99, -1])
    for snap, fid in manifest:
        per[fid][0] = min(per[fid][0], snap)
        per[fid][1] = max(per[fid][1], snap)
    cls = defaultdict(lambda: [0, 0, 99])
    for fid, (first, last) in per.items():
        v = "live" if last >= 3 else "orphan_reclaim"
        b = (fid % 17 + 1) * 4096
        cls[v][0] += 1
        cls[v][1] += b
        cls[v][2] = min(cls[v][2], first)
    got = {r["verdict"]: r for r in
           q_snapshot_vacuum_plan(spark, SF).collect()}
    assert set(got) == set(cls)
    for v, (n, b, oldest) in cls.items():
        r = got[v]
        assert (r["n_files"], r["total_bytes"]) == (n, b)
        assert r["oldest_first_snap"] == oldest
    # retention actually reclaims something and keeps something
    assert got["orphan_reclaim"]["n_files"] > 0
    assert got["live"]["n_files"] > 0


def test_shard_plan_golden(spark):
    cents = SIM.seeded_centroids(_IVF_CENTROIDS, _IVF_DIM)
    norms = [math.sqrt(sum(x * x for x in c)) or 1.0 for c in cents]
    cell_count = defaultdict(int)
    for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect():
        v = [float(x) for x in r["embedding"]]
        scores = [sum(a * b for a, b in zip(v, c)) / n
                  for c, n in zip(cents, norms)]
        cell_count[scores.index(max(scores))] += 1
    ranked = sorted(cell_count, key=lambda c: (-cell_count[c], c))
    shard_of = {c: i % 3 for i, c in enumerate(ranked)}
    per = defaultdict(lambda: [0, 0])
    for c, n in cell_count.items():
        s = shard_of[c]
        per[s][0] += 1
        per[s][1] += n
    total = sum(n for _c, n in per.values())
    got = {r["shard"]: r for r in
           q_embeddings_shard_plan(spark, SF).collect()}
    assert set(got) == set(per)
    for s, (nc, nv) in per.items():
        r = got[s]
        assert (r["n_cells"], r["n_vecs"]) == (nc, nv)
        share = nv * 10**6 // total
        assert r["share_ppm"] == share
        assert r["dev_ppm"] == abs(share - 10**6 // 3)
    # striping bounds imbalance: no shard owns more than half
    assert max(r["share_ppm"] for r in got.values()) <= 500000


def test_victim_overlap_golden(spark):
    posts = set()
    for k in _keys(spark):
        v = k % 90
        r = (k // 90) % 3
        if v % 15 == 0 and r == 2:
            site = "site_c"
        elif v % 6 == 0 and r == 1:
            site = "site_b"
        else:
            site = "site_a"
        day = (v % 20) + 3 + (k % 7) if (v % 6 == 0 and r != 0) \
            else v % 20
        posts.add((f"victim{v}", site, day))
    per = defaultdict(lambda: [0, set(), 99, -1])
    for vk, site, day in posts:
        p = per[vk]
        p[0] += 1
        p[1].add(site)
        p[2] = min(p[2], day)
        p[3] = max(p[3], day)
    got = {r["victim_key"]: r for r in
           q_leak_victim_overlap(spark, SF).collect()}
    assert set(got) == set(per)
    for vk, (n, sites, first, last) in per.items():
        r = got[vk]
        assert r["n_posts"] == n
        assert r["n_sites"] == len(sites)
        assert (r["first_day"], r["last_day"]) == (first, last)
        assert r["repost_lag_days"] == last - first
        assert r["multi_site"] == int(len(sites) >= 2)
    # cross-posted victims exist, and reposts lag the original
    multi = [vk for vk in per if int(vk[6:]) % 6 == 0]
    assert multi and all(got[vk]["multi_site"] == 1 for vk in multi)
    assert all(got[vk]["repost_lag_days"] >= 3 for vk in multi)
    solo = [vk for vk in per
            if int(vk[6:]) % 6 != 0 and int(vk[6:]) % 15 != 0]
    assert solo and all(got[vk]["n_sites"] == 1 for vk in solo)
