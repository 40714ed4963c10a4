"""Unit tests for the round-3 block-21 rows: neighbor-Jaccard host
similarity, CDC changelog apply, and n-gram novelty — each replayed on a
hand-built table with closed-form expectations."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import datetime as dt

from genesis_spark import queries as Q


def test_neighbor_jaccard_wedge_closure(spark, tmp_path):
    """Edges 1->{3,4}, 2->{3,4,5}: J(h1,h2) = 2/(2+3-2) = 0.6667. Hosts
    with no shared out-neighbor never pair."""
    rows = [(1, 3), (1, 4), (2, 3), (2, 4), (2, 5)]
    df = spark.createDataFrame(rows, "o_orderkey long, o_custkey long")
    out = str(tmp_path / "g")
    df.coalesce(1).write.parquet(f"{out}/orders.parquet")
    got = Q.q_graph_neighbor_jaccard(spark, out).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["host_a"], r["host_b"]) == ("h1", "h2")
    assert r["n_common"] == 2
    assert abs(r["jaccard"] - 0.6667) < 1e-9
    assert r["rank"] == 1


def test_cdc_apply_tombstone_and_upsert(spark, tmp_path):
    """User 1 ends on a tombstone (deleted); user 2's tombstone is
    superseded by a later upsert (survives, delete still counted);
    same-ts ties break on event_id."""
    t = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        (10, t, 1, "click", 1.0, "{}"),
        (11, t + s, 1, "error", 0.0, "{}"),       # trailing D: deleted
        (20, t, 2, "error", 0.0, "{}"),
        (21, t + s, 2, "view", 2.5, "{}"),        # U after D: survives
        (30, t, 3, "click", 3.0, "{}"),
        (31, t, 3, "view", 4.0, "{}"),            # same ts: id 31 wins
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = str(tmp_path / "e")
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    got = {r["user_id"]: r for r in
           Q.q_events_cdc_apply(spark, out).collect()}
    assert set(got) == {2, 3}
    assert got[2]["last_event_id"] == 21
    assert got[2]["last_value"] == 2.5
    assert got[2]["n_ops"] == 2 and got[2]["n_deletes"] == 1
    assert got[3]["last_event_id"] == 31
    assert got[3]["last_value"] == 4.0 and got[3]["n_deletes"] == 0


def test_ngram_novelty_duplicate_and_short_docs(spark, tmp_path):
    """Doc 1 debuts every shingle (novelty 1.0); doc 3 repeats doc 1's
    text exactly (novelty 0.0); doc 5 is shorter than the 5-gram window
    so its whole text is its single, novel shingle. Odd ids keep the
    _corpus twin injection out of the picture."""
    text = "w1 w2 w3 w4 w5 w6"
    df = spark.createDataFrame(
        [(1, text, "s", "en", len(text)),
         (3, text, "s", "en", len(text)),
         (5, "short", "s", "en", 5)],
        "doc_id long, text string, source string, lang string, "
        "n_chars long")
    out = str(tmp_path / "d")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    got = {r["doc_id"]: r for r in
           Q.q_text_ngram_novelty(spark, out).collect()}
    assert set(got) == {1, 3, 5}
    assert got[1]["n_shingles"] == 2 and got[1]["novelty"] == 1.0
    assert got[3]["n_shingles"] == 2 and got[3]["novelty"] == 0.0
    assert got[5]["n_shingles"] == 1 and got[5]["novelty"] == 1.0
