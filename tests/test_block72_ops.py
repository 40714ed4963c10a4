"""Block-72 operators: binary-hamming ANN, sweep-line concurrency,
packing fragmentation audit."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from collections import defaultdict

from genesis_spark.queries import (q_ann_binary_hamming,
                                   q_corpus_pack_fragmentation,
                                   q_events_concurrency)

SF = "/root/testdata/sf0.001"


def test_binary_hamming_matches_python_replay(spark):
    vecs = {r["vec_id"]: list(r["embedding"]) for r in
            spark.read.parquet(f"{SF}/embeddings.parquet").collect()}
    codes = {v: sum(1 << i for i, x in enumerate(vec) if x > 0)
             for v, vec in vecs.items()}
    got = defaultdict(list)
    for r in q_ann_binary_hamming(spark, SF).collect():
        got[r["query_id"]].append((r["rank"], r["neighbor_id"],
                                   r["hamming"]))
    assert set(got) == {v for v in vecs if v < 10}
    for q in got:
        scored = sorted((bin(codes[q] ^ codes[n]).count("1"), n)
                        for n in vecs if n != q)
        want = [(i + 1, n, h) for i, (h, n) in enumerate(scored[:5])]
        assert sorted(got[q]) == want


def test_concurrency_matches_bruteforce(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .selectExpr("event_id", "unix_timestamp(ts) AS s").collect()
    pts = []
    for r in ev:
        s = r["s"]
        e = s + 60 + r["event_id"] % 3600
        pts.append((s, 1, r["event_id"]))
        pts.append((e, -1, r["event_id"]))
    pts.sort()
    live, peak, starts = 0, defaultdict(int), defaultdict(int)
    for t, d, _ in pts:
        live += d
        h = t // 3600
        peak[h] = max(peak[h], live)
        if d == 1:
            starts[h] += 1
    assert live == 0  # every interval closes
    got = {r["hour"]: r for r in q_events_concurrency(spark, SF).collect()}
    # rows exist exactly for hours that saw any sweep point
    assert set(got) == set(peak)
    for h, r in got.items():
        assert (r["peak_live"], r["n_starts"]) == (peak[h], starts[h])


def test_pack_fragmentation_census(spark):
    rows = {r["block_id"]: r for r in
            q_corpus_pack_fragmentation(spark, SF).collect()}
    n_docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .filter("text IS NOT NULL").count()
    # every doc starts in exactly one block
    assert sum(r["n_starting"] for r in rows.values()) == n_docs
    blocks = sorted(rows)
    assert blocks == list(range(len(blocks)))  # contiguous block ids
    for b in blocks:
        r = rows[b]
        assert r["n_docs_touching"] == r["n_starting"] + r["n_crossing"]
        # a crossing doc crossed from the previous block
        if r["n_crossing"]:
            assert b > 0
    # fixture docs are ~8-60 tokens vs 2048-blocks: fragmentation is
    # rare but must exist (one doc straddles most boundaries)
    assert sum(r["n_crossing"] for r in rows.values()) >= len(blocks) - 1
