"""Kernel coverage for the audio fingerprint (identity + discrimination
+ poison guard) and a brute-force replay of the snapshot-expiry orphan
computation."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from genesis_spark import queries as Q
from genesis_spark.operators import multimodal as MM

SF = "/root/testdata/sf0.001"


def test_audio_fingerprint_identity_and_discrimination(spark):
    rows = [(1, MM.audio_by_doc_id(7)), (2, MM.audio_by_doc_id(7)),
            (3, MM.audio_by_doc_id(8)), (4, None), (5, b"\x00\x01")]
    df = spark.createDataFrame(rows, "doc_id long, media_blob binary")
    got = {r["doc_id"]: r["fp"] for r in MM.audio_fingerprint(df).collect()}
    # identical audio -> identical fp (the dedup guarantee)
    assert got[1] == got[2]
    # different synth group -> different fp
    assert got[1] != got[3]
    # poison blobs are skipped, not fatal
    assert 4 not in got and 5 not in got


def test_audio_fingerprint_matches_python_replay():
    import struct

    import numpy as np
    g = 13
    blob = MM.audio_by_doc_id(g)
    n, _sr = struct.unpack(">II", blob[:8])
    x = np.frombuffer(blob, dtype="<i2", offset=8).astype(np.int64)
    w = n // 8
    want = sum((int((x[i * w:(i + 1) * w] ** 2).sum()) % 65521) * 31 ** i
               for i in range(8))
    # replay through the Spark kernel path happens in the driver row;
    # here assert the documented closed form directly
    e = (x[:w * 8].reshape(8, w) ** 2).sum(axis=1)
    fp = int(sum((int(ew) % 65521) * p
                 for ew, p in zip(e, [31 ** k for k in range(8)])))
    assert fp == want


def test_audio_dedup_groups_follow_synth_groups(spark):
    rows = Q.q_media_audio_fingerprint(spark, SF).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    # docs in the same synth group (doc_id % 200) must share fp and rep
    from collections import defaultdict
    groups = defaultdict(list)
    for doc_id in by_doc:
        groups[doc_id % 200].append(doc_id)
    for g, members in groups.items():
        fps = {by_doc[m]["fp"] for m in members}
        assert len(fps) == 1, g
        assert all(by_doc[m]["rep_doc_id"] == min(members) for m in members)
        assert all(by_doc[m]["group_size"] == len(members) for m in members)


def test_snapshot_expire_bruteforce_replay(spark):
    rows = Q.q_snapshot_expire(spark, SF).collect()
    # brute-force: snapshots 0..29 (all residues present at sf0.001),
    # live = last 5 by ts OR within the 36000 s watermark
    snaps = list(range(30))
    ts = {s: 1700000000 + s * 3600 for s in snaps}
    mx = max(ts.values())
    by_rk = sorted(snaps, key=lambda s: -ts[s])
    live = {s for s in by_rk[:5]} | {s for s in snaps if ts[s] > mx - 36000}
    refs, live_refs = {}, {}
    for s in snaps:
        for j in range(5):
            f = (s * 7 + j) % 100
            refs[f] = refs.get(f, 0) + 1
            if s in live:
                live_refs[f] = live_refs.get(f, 0) + 1
    got = {r["file_id"]: r for r in rows}
    assert set(got) == set(refs)
    for f, r in got.items():
        assert r["n_refs"] == refs[f]
        assert r["n_live_refs"] == live_refs.get(f, 0)
        assert r["deletable"] == (live_refs.get(f, 0) == 0)
    # the sweep must actually find orphans on this fixture
    assert any(r["deletable"] for r in rows)
    assert any(not r["deletable"] for r in rows)
