"""Block-59 operators: STTR lexical diversity, event-type lift matrix,
IVF cell-balance audit."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import re
from collections import Counter, defaultdict

import duckdb

from genesis_spark.queries import (q_embeddings_cell_balance,
                                   q_events_lift_matrix, q_text_ttr_sttr)

SF = "/root/testdata/sf0.001"


def test_sttr_matches_python_replay(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' "
        f"WHERE text IS NOT NULL").fetchall()
    expect = {}
    for doc_id, text in docs:
        ws = [w for w in re.split(r"[^a-z]+", text.lower())
              if len(w) >= 2]
        n_chunks = len(ws) // 50
        if n_chunks == 0:
            continue
        sum_types = sum(len(set(ws[c * 50:(c + 1) * 50]))
                        for c in range(n_chunks))
        expect[doc_id] = (n_chunks,
                          sum_types * 1_000_000 // (n_chunks * 50))
    got = {r["doc_id"]: (r["n_chunks"], r["sttr_ppm"])
           for r in q_text_ttr_sttr(spark, SF).collect()}
    assert got == expect
    # a 50-token chunk has between 1 and 50 types
    assert all(20_000 <= v <= 1_000_000 for _, v in got.values())


def test_lift_matrix_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT DISTINCT user_id || '@' || CAST(CAST(ts AS DATE) AS "
        f"VARCHAR), event_type FROM '{SF}/events.parquet'").fetchall()
    by_basket = defaultdict(set)
    n_t: Counter = Counter()
    for basket, et in rows:
        by_basket[basket].add(et)
        n_t[et] += 1
    nb = len(by_basket)
    n_ab: Counter = Counter()
    for types in by_basket.values():
        ts = sorted(types)
        for i, a in enumerate(ts):
            for b in ts[i + 1:]:
                n_ab[(a, b)] += 1
    got = {(r["a"], r["b"]): r
           for r in q_events_lift_matrix(spark, SF).collect()}
    assert set(got) == set(n_ab)
    for (a, b), c in n_ab.items():
        g = got[(a, b)]
        assert g["n_ab"] == c
        assert g["lift_ppm"] == c * nb * 1_000_000 // (n_t[a] * n_t[b])
        assert g["conf_a_to_b_ppm"] == c * 1_000_000 // n_t[a]
        assert g["conf_b_to_a_ppm"] == c * 1_000_000 // n_t[b]


def test_cell_balance_shape_and_consistency(spark):
    rows = q_embeddings_cell_balance(spark, SF).collect()
    total = sum(r["n_vecs"] for r in rows)
    con = duckdb.connect()
    n_emb = con.execute(
        f"SELECT count(*) FROM '{SF}/embeddings.parquet'").fetchone()[0]
    assert total == n_emb  # every vector lands in exactly one cell
    assert len(rows) <= 8
    for r in rows:
        assert r["share_ppm"] == r["n_vecs"] * 1_000_000 // total
        assert r["imbalance_ppm"] == r["n_vecs"] * 8 * 1_000_000 // total
    # shares sum to ~1 (integer DIV truncation only)
    s = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= s <= 1_000_000
