"""Block-145 operators: span offset integrity, reprocess planning,
effective diameter."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_corpus_reprocess_plan,
                                   q_graph_effective_diameter,
                                   q_spans_offset_repair)

SF = "/root/testdata/sf0.001"


def _span_count(text):
    words = text.split(" ")
    n_chunks = max((len(words) + 7) // 8, 1)
    # one image AFTER every 3rd section (S S S I ...)
    return n_chunks + n_chunks // 3


def test_offset_repair_replay(spark):
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect() if r.text is not None}
    got = {r.doc_id: r for r in q_spans_offset_repair(spark, SF).collect()}
    assert set(got) == set(docs)
    n_clean = n_bad = 0
    for d, text in docs.items():
        n = _span_count(text)
        offs = [i + 3 if (d + i) % 7 == 0 else i for i in range(n)]
        srt = sorted(offs)
        dups = len(offs) - len(set(offs))
        gaps = sum(1 for i in range(len(srt) - 1)
                   if srt[i + 1] - srt[i] > 1)
        in_order = int(offs == srt)
        misplaced = sum(1 for i, o in enumerate(srt) if o != i)
        r = got[d]
        assert r.n_spans == n, d
        assert (r.n_dups, r.n_gaps, r.in_order, r.n_misplaced) == (
            dups, gaps, in_order, misplaced), d
        needs = int(dups > 0 or gaps > 0 or not in_order
                    or misplaced > 0)
        assert r.needs_repair == needs
        n_bad += needs
        n_clean += 1 - needs
    assert n_bad > 0 and n_clean > 0  # the plant hits some docs only


def test_offset_corruption_shape():
    # one +3 bump makes a duplicate, a gap, and an inversion at once
    offs = [0, 4, 2, 3, 4, 5]          # pos1 bumped 1 -> 4
    srt = sorted(offs)
    assert len(offs) - len(set(offs)) == 1          # dup (4)
    assert any(srt[i + 1] - srt[i] > 1 for i in range(len(srt) - 1))
    assert offs != srt                               # inversion


def test_reprocess_plan_replay(spark):
    got = {r.doc_id: r for r in
           q_corpus_reprocess_plan(spark, SF).collect()}
    froms = set()
    for d, r in got.items():
        vf = 1 + (d // 100) % 3
        vp = 1 + (d // 50) % 3
        vc = 1 + (d // 20) % 5
        assert r.provenance == f"fetch:v{vf}|parse:v{vp}|clean:v{vc}"
        assert (r.fetch_stale, r.parse_stale, r.clean_stale) == (
            int(vf < 3), int(vp < 3), int(vc < 5))
        want = ("fetch" if vf < 3 else "parse" if vp < 3
                else "clean" if vc < 5 else "none")
        assert r.reprocess_from == want
        assert r.cost_units == {"fetch": 14, "parse": 4,
                                "clean": 1, "none": 0}[want]
        froms.add(want)
    assert froms == {"fetch", "parse", "clean", "none"}


def test_effective_diameter_replay(spark):
    edges = set()
    for r in spark.read.parquet(f"{SF}/orders.parquet") \
            .select("o_orderkey", "o_custkey").collect():
        s, d = r.o_orderkey % 50, r.o_custkey % 50
        if s != d:
            edges.add((s, d))
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    level_counts = [0, 0, 0, 0]
    dist_sum = 0
    for s in adj:
        seen = {s}
        frontier = {s}
        for hop in (1, 2, 3):
            nxt = set()
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in seen and v != s:
                        seen.add(v)
                        nxt.add(v)
            level_counts[hop] += len(nxt)
            dist_sum += hop * len(nxt)
            frontier = nxt
    n = sum(level_counts)
    r = q_graph_effective_diameter(spark, SF).collect()[0]
    assert r.n_pairs == n
    assert (r.n_d1, r.n_d2, r.n_d3) == tuple(level_counts[1:])
    if level_counts[1] * 10 >= 9 * n:
        want = 1
    elif (level_counts[1] + level_counts[2]) * 10 >= 9 * n:
        want = 2
    else:
        want = 3
    assert r.eff_diameter_p90 == want
    assert r.mean_dist_milli == dist_sum * 1000 // n
