"""Unit tests for the round-3 block-24 rows: perceptual-hash hamming
pairs and the checkpoint changelog diff — closed-form replays on
hand-built tables."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from genesis_spark import queries as Q


def _ahash_segs(doc_id: int) -> list[int]:
    """Python replay of the gray8 aHash kernel (same formulas as the
    media_phash oracle)."""
    w, h = 8 + doc_id % 16, 8 + (doc_id // 3) % 16
    o = [(doc_id * 31 + (((t // 8) * h // 8) * w +
                         ((t % 8) * w // 8)) * 7) % 256
         for t in range(64)]
    s = sum(o)
    segs = []
    for k in range(4):
        v = 0
        for t in range(16):
            if o[16 * k + t] * 64 > s:
                v |= 1 << t
        segs.append(v)
    return segs


def test_phash_pairs_identical_period_and_hand_hamming(spark, tmp_path):
    """doc_ids 1 and 769 produce byte-identical bitmaps (the kernel's
    parameters all have period dividing 768), so they must pair at
    hamming 0; the (1, 2) pair appears iff it passes the band filter
    AND its replayed hamming is <= 8 — with exactly the replayed
    distance."""
    ids = [1, 2, 769]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = str(tmp_path / "p")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           Q.q_media_phash_pairs(spark, out).collect()}
    assert got[(1, 769)] == 0

    segs = {i: _ahash_segs(i) for i in ids}
    assert segs[1] == segs[769]
    for a, b in [(1, 2), (2, 769)]:
        ham = sum(bin(x ^ y).count("1")
                  for x, y in zip(segs[a], segs[b]))
        banded = any(x == y for x, y in zip(segs[a], segs[b]))
        if banded and ham <= 8:
            assert got[(a, b)] == ham
        else:
            assert (a, b) not in got


def test_checkpoint_diff_classification(spark, tmp_path):
    """Keys 2/3/4/11 hit status_changed/added/unchanged(excluded)/
    removed respectively."""
    df = spark.createDataFrame([(k,) for k in (2, 3, 4, 11)],
                               "o_orderkey long")
    out = str(tmp_path / "f")
    df.coalesce(1).write.parquet(f"{out}/orders.parquet")
    got = {r["change_type"]: (r["n_urls"], r["key_checksum"]) for r in
           Q.q_frontier_checkpoint_diff(spark, out).collect()}
    assert got == {
        "added": (1, 3),          # k=3: absent from v1, present in v2
        "removed": (1, 11),       # k=11: present in v1, absent from v2
        "status_changed": (1, 2),  # k=2: pending -> complete
    }
