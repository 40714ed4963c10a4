"""Block-35 operators: seeded TrustRank, EWMA crawl delay, span census."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import duckdb

from genesis_spark.queries import (q_frontier_crawl_delay, q_host_trustrank,
                                   q_spans_stats)

SF = "/root/testdata/sf0.001"


def _orders_pairs(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT o_orderkey, o_custkey FROM '{sf_dir}/orders.parquet'"
    ).fetchall()


def _trustrank_python_replay(sf_dir):
    """Pure-Python replay of q_host_trustrank: same graph, same integer
    power iterations, seed set = hosts with index % 5 == 0."""
    edges = set()
    for k, c in _orders_pairs(sf_dir):
        s, d = f"h{k % 50}", f"h{c % 50}"
        if s != d:
            edges.add((s, d))
    nodes = {n for e in edges for n in e}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    seed = {n: 1 if int(n[1:]) % 5 == 0 else 0 for n in nodes}
    rank = {n: seed[n] * 1_000_000_000 for n in nodes}
    for _ in range(3):
        contrib = dict.fromkeys(nodes, 0)
        for s, d in edges:
            contrib[d] += rank[s] // outdeg[s]
        rank = {n: seed[n] * 150_000_000 + (85 * contrib[n]) // 100
                for n in nodes}
    return rank


def test_trustrank_matches_python_replay(spark):
    got = {r["host_key"]: r["trustrank"]
           for r in q_host_trustrank(spark, SF).collect()}
    want = _trustrank_python_replay(SF)
    assert got == want
    # The TrustRank property the row exists for: teleport mass lands only
    # on seeds, so every seed outranks the base-less floor and the global
    # total is strictly below PageRank's (mass leaks at non-seeds).
    seeds = {h for h in got if int(h[1:]) % 5 == 0}
    assert seeds and all(got[h] >= 150_000_000 for h in seeds)
    assert any(got[h] < 150_000_000 for h in set(got) - seeds)


def _crawl_delay_python_replay(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_id, ts FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    by_host = {}
    for u, e, ts in rows:
        by_host.setdefault(f"h{u % 40}", []).append((ts, e))
    out = {}
    for h, obs in by_host.items():
        last8 = sorted(obs, reverse=True)[:8]          # ts DESC, id DESC
        chron = [e % 900 + 100 for _, e in reversed(last8)]  # x_1 .. x_n
        n = len(chron)
        numer = chron[0] + sum(x * (1 << (i - 2))
                               for i, x in enumerate(chron[1:], start=2))
        ewma = numer // (1 << (n - 1))
        out[h] = (n, ewma, max(500, min(10000, 3 * ewma)))
    return out


def test_crawl_delay_matches_python_replay(spark):
    got = {r["host_key"]: (r["n_obs"], r["ewma_ms"], r["crawl_delay_ms"])
           for r in q_frontier_crawl_delay(spark, SF).collect()}
    assert got == _crawl_delay_python_replay(SF)
    # clamp actually engages somewhere on the fixture (ewma in
    # [100, 999] -> 3x in [300, 2997] crosses the 500 floor only if a
    # host's recent latencies are small) — at minimum the bounds hold.
    assert all(500 <= d <= 10000 for _, _, d in got.values())


def _spans_stats_python_replay(sf_dir):
    """Replay the interleave synthesis (8-word sections, image after every
    3rd section) and the census arithmetic in pure Python."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "WHERE text IS NOT NULL").fetchall()
    out = {}
    for doc_id, text in rows:
        words = text.split(" ")
        n_chunks = max((len(words) + 7) // 8, 1)
        chunks = [" ".join(words[i * 8:i * 8 + 8]) for i in range(n_chunks)]
        kinds, text_chars = [], 0
        for j, c in enumerate(chunks):
            kinds.append("section")
            text_chars += len(c)
            if (j + 1) % 3 == 0:
                kinds.append("image")
        n_spans = len(kinds)
        n_media = kinds.count("image")
        n_trans = sum(1 for a, b in zip(kinds, kinds[1:]) if a != b)
        out[str(doc_id)] = (n_spans, n_spans - n_media, n_media, n_trans,
                            text_chars,
                            n_media * 100000 // max(text_chars, 1))
    return out


def test_spans_stats_matches_python_replay(spark):
    got = {r["doc_id"]: (r["n_spans"], r["n_text"], r["n_media"],
                         r["n_transitions"], r["text_chars"],
                         r["media_per_100k"])
           for r in q_spans_stats(spark, SF).collect()}
    want = _spans_stats_python_replay(SF)
    assert got == want
    # the interleave is real on the fixture: some doc has >= 2 transitions
    assert any(t >= 2 for *_, t, _c, _m in
               [(a, b, c, d, e, f) for a, b, c, d, e, f in got.values()])
