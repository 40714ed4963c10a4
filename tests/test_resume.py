"""Crash-resume: kill after round 0's snapshot, resume, and the combined
outputs must equal the uninterrupted goldens (SURVEY.md §5.4, ST4)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.slow   # multi-round Spark crawls (t1 x2 stores)

from genesis_spark.crawler import engine
from genesis_spark.sources.tables import SnapshotStore
from tests.gen_fixtures import ensure


@pytest.fixture(scope="module")
def resumed_store(spark, tmp_path_factory):
    fx = ensure("t1")
    seeds = spark.read.parquet(f"{fx}/seeds.parquet")
    pages = spark.read.parquet(f"{fx}/web_pages.parquet")
    store = SnapshotStore(str(tmp_path_factory.mktemp("snaps") / "crawl"))
    engine.run_rounds(spark, seeds, pages, store, stop_after_round=0)
    assert [m["round"] for m in store.snapshots()] == [-1, 0]
    engine.run_rounds(spark, seeds, pages, store)  # resume to drain
    return store, fx


def test_resume_crawl_order_equals_golden(spark, resumed_store):
    store, fx = resumed_store
    golden = pq.read_table(f"{fx}/crawl_order_golden.parquet").to_pylist()
    got = [r.asDict() for r in store.read(spark, "crawl_order")
           .select("crawl_seq", "round", "host_key", "url", "depth",
                   "attempts", "ok")
           .orderBy("crawl_seq").collect()]
    assert got == golden


def test_resume_seen_and_frontier(spark, resumed_store):
    store, fx = resumed_store
    golden_seen = {r["url"] for r in
                   pq.read_table(f"{fx}/seen_golden.parquet").to_pylist()}
    got_seen = {r.url for r in store.read(spark, "seen").collect()}
    assert got_seen == golden_seen
    states = {r["url"]: r["state"] for r in
              pq.read_table(f"{fx}/frontier_golden.parquet").to_pylist()}
    got_states = {r.url: r.state for r in
                  store.read(spark, "frontier").collect()}
    assert got_states == states


def test_delta_state_resume_and_no_rewrite(spark, tmp_path_factory):
    """The 10^10-row frontier layout: install writes frontier_base once;
    every round commits only O(round) state deltas. Resume + final states
    must equal the golden full-rewrite path; no snapshot after install may
    contain a full frontier table."""
    import os

    from genesis_spark.crawler.engine import read_frontier_delta
    fx = ensure("t1")
    seeds = spark.read.parquet(f"{fx}/seeds.parquet")
    pages = spark.read.parquet(f"{fx}/web_pages.parquet")
    store = SnapshotStore(str(tmp_path_factory.mktemp("snaps_d") / "crawl"))
    engine.run_rounds(spark, seeds, pages, store, stop_after_round=0,
                      delta_state=True)
    engine.run_rounds(spark, seeds, pages, store, delta_state=True)

    golden = {r["url"]: (r["state"], r["fail_count"]) for r in
              pq.read_table(f"{fx}/frontier_golden.parquet").to_pylist()}
    got = {r.url: (r.state, r.fail_count) for r in
           read_frontier_delta(spark, store).collect()}
    assert got == golden

    # layout: exactly one frontier_base (the install snapshot); every later
    # snapshot carries only delta updates, never a rewritten frontier
    snaps = store.snapshots()
    assert [m["tables"] for m in snaps[:1]] == [["frontier_base"]]
    for m in snaps[1:]:
        assert "frontier" not in m["tables"]
        assert "frontier_base" not in m["tables"]
        assert "frontier_updates" in m["tables"]
    # deltas are O(dispatched): total update rows == total seeds installed
    n_updates = store.read(spark, "frontier_updates").count()
    assert n_updates == len(golden)
    # crawl outputs equal the golden crawl too
    g_order = pq.read_table(f"{fx}/crawl_order_golden.parquet").to_pylist()
    got_order = [r.asDict() for r in store.read(spark, "crawl_order")
                 .select("crawl_seq", "round", "host_key", "url", "depth",
                         "attempts", "ok").orderBy("crawl_seq").collect()]
    assert got_order == g_order
    assert os.path.isdir(os.path.join(store.root, "snap-00000",
                                      "frontier_base"))
