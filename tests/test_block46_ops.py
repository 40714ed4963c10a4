"""Block-46 operators: shard handoff, dup-ngram coverage, response
profile."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib

import duckdb

from genesis_spark.queries import (q_host_response_profile,
                                   q_text_dup_ngram_coverage,
                                   q_url_shard_handoff)

SF = "/root/testdata/sf0.001"


def test_shard_handoff_matches_python_replay(spark):
    con = duckdb.connect()
    keys = [int(r[0]) for r in con.execute(
        f"SELECT o_orderkey FROM '{SF}/orders.parquet'").fetchall()]

    def hrw(u, n_shards):
        return max(range(n_shards), key=lambda s: (
            hashlib.md5(f"{u}-{s}".encode()).hexdigest(), -s))

    mod_moved = sum(1 for u in keys if u % 8 != u % 12)
    hrw_moved = sum(1 for u in keys if hrw(u, 8) != hrw(u, 12))
    got = {r["scheme"]: (r["n_urls"], r["n_moved"], r["moved_ppm"])
           for r in q_url_shard_handoff(spark, SF).collect()}
    n = len(keys)
    assert got == {
        "mod": (n, mod_moved, mod_moved * 10**6 // n),
        "rendezvous": (n, hrw_moved, hrw_moved * 10**6 // n)}
    # the whole point: rendezvous moves ~4/12 of keys, mod nearly all
    assert got["rendezvous"][2] < 500_000 < got["mod"][2]


def test_dup_ngram_coverage_matches_python_replay(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' "
        "WHERE text IS NOT NULL").fetchall()
    occ = {}
    words = {}
    for doc_id, text in docs:
        ws = text.split(" ")
        words[doc_id] = len(ws)
        for i in range(len(ws) - 7):
            g = " ".join(ws[i:i + 8])
            occ.setdefault(g, []).append((doc_id, i + 1))
    dup_grams = {g for g, hits in occ.items()
                 if len({d for d, _ in hits}) >= 2}
    covered = {}
    for g in dup_grams:
        for doc_id, pos in occ[g]:
            covered.setdefault(doc_id, set()).update(
                range(pos, pos + 8))
    want = {}
    for doc_id, n in words.items():
        c = len(covered.get(doc_id, ()))
        want[doc_id] = (n, c, c * 10**6 // max(n, 1))
    got = {r["doc_id"]: (r["n_words"], r["n_dup_positions"],
                         r["dup_coverage_ppm"])
           for r in q_text_dup_ngram_coverage(spark, SF).collect()}
    assert got == want
    # the word-soup corpus (plus genuinely repeated docs) must contain
    # SOME cross-doc duplicated 8-grams, and coverage is bounded
    assert any(v[1] > 0 for v in got.values())
    assert all(0 <= v[2] <= 10**6 for v in got.values())


def test_response_profile_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, o_custkey FROM '{SF}/orders.parquet'"
    ).fetchall()
    agg = {}
    for k, c in rows:
        if (k + c) % 20 < (c % 3):
            s = "500"
        elif k % 20 == 3:
            s = "301"
        elif k % 20 in (4, 5):
            s = "404"
        else:
            s = "200"
        st = agg.setdefault(f"h{c % 40}", {"200": 0, "301": 0,
                                           "404": 0, "500": 0})
        st[s] += 1
    want = {}
    for h, st in agg.items():
        n = sum(st.values())
        ppm = st["500"] * 10**6 // n
        want[h] = (n, st["200"], st["301"], st["404"], st["500"],
                   ppm, ppm >= 75000)
    got = {r["host_key"]: (r["n_fetches"], r["n_200"], r["n_301"],
                           r["n_404"], r["n_500"], r["err_ppm"],
                           r["backoff"])
           for r in q_host_response_profile(spark, SF).collect()}
    assert got == want
    # the three host error tiers separate: some hosts flagged, some clean
    assert any(v[6] for v in got.values())
    assert any(not v[6] for v in got.values())
