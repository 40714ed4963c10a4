"""Block-125 operators: robots churn diff, ViT patch extraction,
Mercator queue assignment."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_frontier_mercator, q_media_patches,
                                   q_robots_churn)

SF = "/root/testdata/sf0.001"


def test_robots_churn_python_replay_and_classes(spark):
    hids = {r.o_orderkey % 40 for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()}

    def rules(hid, shifted):
        js = range(1, 4) if (shifted and hid % 4 == 0) else range(0, 3)
        return {f"/p{(hid * 3 + j) % 7}": (hid + j) % 3 != 0 for j in js}

    got = {r.host_key: r for r in q_robots_churn(spark, SF).collect()}
    assert set(got) == {f"h{h}" for h in hids}
    any_add = any_rm = any_flip = any_tight = False
    for hid in hids:
        old = rules(hid, False)
        new0 = rules(hid, True)
        new = {p: (not a) if (hid + int(p[2:])) % 5 == 0 else a
               for p, a in new0.items()}
        paths = set(old) | set(new)
        n_add = sum(1 for p in paths if p not in old)
        n_rm = sum(1 for p in paths if p not in new)
        n_flip = sum(1 for p in paths
                     if p in old and p in new and old[p] != new[p])
        tight = int(any(p in new and new[p] is False
                        and (p not in old or old[p] is True)
                        for p in paths))
        r = got[f"h{hid}"]
        assert (r.n_added, r.n_removed, r.n_flipped,
                r.tightened) == (n_add, n_rm, n_flip, tight), hid
        any_add |= n_add > 0
        any_rm |= n_rm > 0
        any_flip |= n_flip > 0
        any_tight |= tight == 1
    assert any_add and any_rm and any_flip and any_tight


def test_media_patches_python_replay(spark):
    doc_ids = [r.doc_id for r in
               spark.read.parquet(f"{SF}/documents.parquet")
               .select("doc_id").collect() if r.doc_id % 4 == 2]
    want = {}
    for d in doc_ids:
        w, h = 8 + d % 16, 8 + (d // 3) % 16
        gh, gw = -(-h // 8), -(-w // 8)
        for gy in range(gh):
            for gx in range(gw):
                vals = []
                for i in range(64):
                    r, c = gy * 8 + i // 8, gx * 8 + i % 8
                    vals.append((d * 31 + (r * w + c) * 7) % 256
                                if r < h and c < w else 0)
                want[(d, gy, gx)] = (sum(vals), min(vals), max(vals))
    got = {(r.doc_id, r.py, r.px): (r.p_sum, r.p_min, r.p_max)
           for r in q_media_patches(spark, SF).collect()}
    assert got == want
    # padding actually occurs: some patch has a zero min from pad,
    # some image needs a 2x2+ grid
    assert any(k[1] > 0 or k[2] > 0 for k in got)
    assert any(v[1] == 0 for v in got.values())


def test_mercator_assignment_replay(spark):
    keys = [r.o_orderkey for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    per = defaultdict(lambda: [0, set(), None])
    for k in keys:
        host = f"h{k % 97}"
        bq = int(hashlib.md5(host.encode()).hexdigest()[:15], 16) % 32
        fq = (k % 100) // 13
        url = f"http://{host}.onion/u{k}"
        slot = per[bq]
        slot[0] += 1
        slot[1].add(host)
        cand = (-fq, -k, url)
        if slot[2] is None or cand > slot[2]:
            slot[2] = cand
    total = len(keys)
    got = {r.back_queue: r for r in
           q_frontier_mercator(spark, SF).collect()}
    assert set(got) == set(per)
    for bq, (n, hosts, head) in per.items():
        r = got[bq]
        assert (r.n_urls, r.n_hosts) == (n, len(hosts))
        assert (r.head_front, r.head_seq, r.head_url) == (
            -head[0], -head[1], head[2])
        assert r.share_ppm == n * 1000000 // total
    # politeness property: every host lands in exactly one back queue
    host_q = defaultdict(set)
    for k in keys:
        host = f"h{k % 97}"
        bq = int(hashlib.md5(host.encode()).hexdigest()[:15], 16) % 32
        host_q[host].add(bq)
    assert all(len(qs) == 1 for qs in host_q.values())
