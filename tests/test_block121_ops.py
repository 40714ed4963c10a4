"""Block-121 operators: snapshot time travel, HNSW layer plan,
isotonic (PAV) quality calibration."""

from __future__ import annotations

import hashlib
from collections import defaultdict
from functools import reduce

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_ann_hnsw_plan, q_snapshot_time_travel,
                                   q_text_quality_isotonic)

SF = "/root/testdata/sf0.001"


def test_time_travel_python_replay_and_resurrection(spark):
    rows = [(r.o_orderkey, int(r.o_totalprice * 100 + 0.5)) for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey", "o_totalprice").collect()]
    log = [(0, k, "upsert", c) for k, c in rows]
    for k, c in rows:
        if k % 7 == 0 and k % 11 != 0:
            log.append((1, k, "upsert", c + 1))
        if k % 11 == 0:
            log.append((1, k, "delete", None))
        if k % 13 == 0:
            log.append((1, k + 10_000_000, "upsert", k % 1000))
        if k % 5 == 0 and k % 17 != 0:
            log.append((2, k, "upsert", c + 2))
        if k % 17 == 0:
            log.append((2, k, "delete", None))
        if k % 19 == 0:
            log.append((2, k + 20_000_000, "upsert", k % 997))

    states = {}
    for s in range(3):
        latest = {}
        for snap, key, op, val in sorted(log):
            if snap <= s:
                latest[key] = (op, val)
        states[s] = {k: v for k, (op, v) in latest.items()
                     if op == "upsert"}

    got = {r.s: r for r in q_snapshot_time_travel(spark, SF).collect()}
    assert set(got) == {0, 1, 2}
    for s, state in states.items():
        r = got[s]
        assert r.n_rows == len(state)
        assert r.key_xor == reduce(lambda a, b: a ^ b, state, 0)
        assert r.val_xor == reduce(lambda a, b: a ^ b, state.values(), 0)
        assert (r.min_key, r.max_key) == (min(state), max(state))
    # snapshots genuinely differ, and snap-2 upserts resurrect at least
    # one snap-1 deletion (merge-on-read semantics)
    assert len({got[s].key_xor for s in range(3)}) == 3
    resurrected = [k for k in states[2]
                   if k not in states[1] and k in states[0]]
    assert resurrected


def test_hnsw_plan_geometric_layers_and_entry(spark):
    ids = [r.vec_id for r in
           spark.read.parquet(f"{SF}/embeddings.parquet")
           .select("vec_id").collect()]
    lvl = {}
    for i in ids:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        L = 0
        while L < 6 and h % (16 ** (L + 1)) == 0:
            L += 1
        lvl[i] = L
    occ = defaultdict(list)
    for i, L in lvl.items():
        for layer in range(L + 1):
            occ[layer].append(i)
    got = {r.layer: r for r in q_ann_hnsw_plan(spark, SF).collect()}
    assert set(got) == set(occ)
    top = max(occ)
    entry = min(i for i, L in lvl.items() if L == top)
    for layer, members in occ.items():
        r = got[layer]
        assert r.n_nodes == len(members)
        assert r.id_xor == reduce(lambda a, b: a ^ b, members, 0)
        assert r.degree_budget == len(members) * (32 if layer == 0 else 16)
        assert (r.top_layer, r.entry_id) == (top, entry)
    # occupancy strictly shrinks up the ladder (geometric levels)
    for layer in range(1, top + 1):
        assert got[layer].n_nodes < got[layer - 1].n_nodes


def test_isotonic_fit_monotone_and_minimax_replay(spark):
    rows = sorted(q_text_quality_isotonic(spark, SF).collect(),
                  key=lambda r: r.bucket)
    buckets = [(r.bucket, r.n, r.pos) for r in rows]
    # minimax replay on exact-ppm interval means
    bs = [b for b, _, _ in buckets]
    idx = {b: i for i, b in enumerate(bs)}

    def m_ppm(j, k):
        n = sum(n for _, n, _ in buckets[j:k + 1])
        p = sum(p for _, _, p in buckets[j:k + 1])
        return p * 1000000 // n

    for r in rows:
        i = idx[r.bucket]
        want = max(min(m_ppm(j, k) for k in range(i, len(bs)))
                   for j in range(i + 1))
        assert r.iso_ppm == want, r.bucket
        assert r.raw_ppm == r.pos * 1000000 // r.n
    # fitted curve is monotone non-decreasing; raw is not forced to be
    iso = [r.iso_ppm for r in rows]
    assert iso == sorted(iso)
    # calibration actually changed something OR raw was already monotone
    raw = [r.raw_ppm for r in rows]
    if raw == sorted(raw):
        assert iso == raw
    else:
        assert iso != raw
