"""Block-141 operators: Stack-style code filters, bounded graph
eccentricity, winsorized means."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_code_stack_rules,
                                   q_events_winsorize,
                                   q_graph_eccentricity)
from tests.test_block138_ops import _py_content

SF = "/root/testdata/sf0.001"


def test_stack_rules_replay(spark):
    ks = [r.doc_id for r in
          spark.read.parquet(f"{SF}/documents.parquet")
          .select("doc_id").collect()]
    got = {r.file_id: r for r in q_code_stack_rules(spark, SF).collect()}
    verdicts = set()
    for k in ks:
        c = _py_content(k)
        if k % 23 == 0:
            c = c + "\n" + "a();" * 150
        lines = c.split("\n")
        n_chars = len(c)
        max_line = max(len(x) for x in lines)
        sum_chars = sum(len(x) for x in lines)
        n_alnum = sum(1 for ch in c if ch.isascii() and ch.isalnum())
        avg_cc = sum_chars * 100 // len(lines)
        ppm = n_alnum * 1000000 // n_chars
        r = got[k]
        assert (r.n_lines, r.max_line_len) == (len(lines), max_line), k
        assert r.avg_line_centichars == avg_cc
        assert r.alnum_ppm == ppm
        want = ("long_lines" if max_line > 500 else
                "dense_lines" if avg_cc > 10000 else
                "low_alnum" if ppm < 250000 else "kept")
        assert r.verdict == want
        verdicts.add(want)
    assert "long_lines" in verdicts     # the k%23 minified tails
    assert "kept" in verdicts


def test_eccentricity_replay(spark):
    edges = set()
    for r in spark.read.parquet(f"{SF}/orders.parquet") \
            .select("o_orderkey", "o_custkey").collect():
        s, d = r.o_orderkey % 50, r.o_custkey % 50
        if s != d:
            edges.add((s, d))
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    dist = {}
    for s in adj:
        seen = {s: 0}
        frontier = {s}
        for hop in (1, 2, 3):
            nxt = set()
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in seen:
                        seen[v] = hop
                        nxt.add(v)
            frontier = nxt
        seen.pop(s)
        if seen:
            dist[s] = seen
    eccs = {s: max(d.values()) for s, d in dist.items()}
    radius, diameter = min(eccs.values()), max(eccs.values())
    got = {r.host: r for r in q_graph_eccentricity(spark, SF).collect()}
    assert set(got) == {f"h{s}" for s in dist}
    for s, d in dist.items():
        r = got[f"h{s}"]
        assert r.ecc3 == eccs[s]
        assert r.n_reach3 == len(d)
        assert r.is_center == int(eccs[s] == radius)
        assert r.is_periphery == int(eccs[s] == diameter)
    assert any(r.is_center for r in got.values())
    assert any(r.is_periphery for r in got.values())


def test_winsorize_replay(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("event_id", "event_type", "value").collect()
    by_type = defaultdict(list)
    for r in ev:
        by_type[r.event_type].append((int(round(r.value * 100)),
                                      r.event_id))
    got = {r.event_type: r for r in q_events_winsorize(spark, SF).collect()}
    assert set(got) == set(by_type)
    for t, vs in by_type.items():
        n = len(vs)
        ordered = [v for v, _ in sorted(vs)]
        lo = ordered[(n + 9) // 10 - 1]
        hi = ordered[(9 * n + 9) // 10 - 1]
        raw = sum(v for v, _ in vs)
        wins = sum(max(lo, min(hi, v)) for v, _ in vs)
        r = got[t]
        assert (r.n, r.lo_cents, r.hi_cents) == (n, lo, hi)
        assert r.mean_microcents == raw * 1000000 // n
        assert r.winsor_mean_microcents == wins * 1000000 // n
        # winsorizing really clamps something in a heavy-ish tail
        assert lo <= hi


def test_winsorize_caps_not_drops():
    # the defining property vs trimming: n is unchanged, tails clamp
    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]
    n = len(vals)
    lo = sorted(vals)[(n + 9) // 10 - 1]
    hi = sorted(vals)[(9 * n + 9) // 10 - 1]
    w = [max(lo, min(hi, v)) for v in vals]
    assert len(w) == n and max(w) == 9 and min(w) == 1
