"""Crawl-engine vs oracle golden equality (the north-rule contract):
crawl order, URL-seen set, frontier end-state, and per-document span
sequences must match the pure-Python oracle exactly on the t1 fixture
web graph (SURVEY.md §5.2)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from genesis_spark.crawler import engine
from tests.gen_fixtures import ensure


@pytest.fixture(scope="module")
def fixture_dir():
    return ensure("t1")


@pytest.fixture(scope="module")
def result(spark, fixture_dir):
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    pages = spark.read.parquet(f"{fixture_dir}/web_pages.parquet")
    return engine.run(spark, seeds, pages)


def test_crawl_order_exact(result, fixture_dir):
    golden = pq.read_table(f"{fixture_dir}/crawl_order_golden.parquet") \
        .to_pylist()
    got = [r.asDict() for r in result["crawl_order"]
           .select("crawl_seq", "round", "host_key", "url", "depth",
                   "attempts", "ok")
           .orderBy("crawl_seq").collect()]
    assert len(got) == len(golden)
    for g, o in zip(got, golden):
        assert g == o, f"crawl_seq {o['crawl_seq']}: {g} != {o}"


def test_seen_set_exact(result, fixture_dir):
    golden = {(r["url"], r["host_key"])
              for r in pq.read_table(f"{fixture_dir}/seen_golden.parquet").to_pylist()}
    got = {(r.url, r.host_key) for r in result["seen"].collect()}
    assert got == golden


def test_frontier_end_state(result, fixture_dir):
    golden = {r["url"]: (r["state"], r["fail_count"], r["seq"])
              for r in pq.read_table(f"{fixture_dir}/frontier_golden.parquet").to_pylist()}
    got = {r.url: (r.state, r.fail_count, r.seq)
           for r in result["frontier_done"].collect()}
    assert got == golden


def test_document_spans_byte_exact(result, fixture_dir):
    golden = pq.read_table(f"{fixture_dir}/documents_golden.parquet").to_pylist()
    by_seq = {g["crawl_seq"]: g for g in golden}
    got = result["documents"].select(
        "crawl_seq", "doc_id", "validity_score", "spans").collect()
    assert len(got) == len(golden)
    for r in got:
        g = by_seq[r.crawl_seq]
        assert r.doc_id == g["doc_id"]
        assert r.validity_score == g["validity_score"], r.doc_id
        got_spans = [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in g["spans"]]
        assert got_spans == want, r.doc_id


def test_bloom_prefilter_path_identical(spark, fixture_dir):
    """With use_bloom=True the sharded-Bloom prefilter fronts the exact
    anti-join; no false negatives -> identical crawl order and seen set."""
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    pages = spark.read.parquet(f"{fixture_dir}/web_pages.parquet")
    frontier = engine.install_seeds(seeds, 8)
    res = engine.crawl_frontier(spark, frontier, pages, use_bloom=True)
    golden = pq.read_table(f"{fixture_dir}/crawl_order_golden.parquet") \
        .to_pylist()
    got = [r.asDict() for r in res["crawl_order"]
           .select("crawl_seq", "round", "host_key", "url", "depth",
                   "attempts", "ok").orderBy("crawl_seq").collect()]
    assert got == golden
    g_seen = {r["url"] for r in
              pq.read_table(f"{fixture_dir}/seen_golden.parquet").to_pylist()}
    assert {r.url for r in res["seen"].collect()} == g_seen


def test_cuckoo_prefilter_path_identical(spark, fixture_dir):
    """With use_cuckoo=True the cuckoo-filter prefilter fronts the exact
    anti-join (the D1 'Bloom/cuckoo' second variant); no false negatives ->
    identical crawl order and seen set."""
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    pages = spark.read.parquet(f"{fixture_dir}/web_pages.parquet")
    frontier = engine.install_seeds(seeds, 8)
    res = engine.crawl_frontier(spark, frontier, pages, use_cuckoo=True)
    golden = pq.read_table(f"{fixture_dir}/crawl_order_golden.parquet") \
        .to_pylist()
    got = [r.asDict() for r in res["crawl_order"]
           .select("crawl_seq", "round", "host_key", "url", "depth",
                   "attempts", "ok").orderBy("crawl_seq").collect()]
    assert got == golden
    g_seen = {r["url"] for r in
              pq.read_table(f"{fixture_dir}/seen_golden.parquet").to_pylist()}
    assert {r.url for r in res["seen"].collect()} == g_seen


def test_score_coverage(result):
    # fixture pages must exercise both zero and positive score branches
    scores = [r.validity_score for r in
              result["documents"].select("validity_score").collect()]
    assert any(s > 0 for s in scores) and any(s == 0 for s in scores)


def test_scaled_install_crawl_invariants(spark, fixture_dir):
    """The bucketed production install (no global-rank barrier) must crawl
    the SAME pages in the SAME per-host order as the golden global path —
    only the cross-host interleaving of crawl_seq may differ."""
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    pages = spark.read.parquet(f"{fixture_dir}/web_pages.parquet")
    res = engine.run(spark, seeds, pages, bucketed=True)

    g_seen = {(r["url"], r["host_key"]) for r in
              pq.read_table(f"{fixture_dir}/seen_golden.parquet").to_pylist()}
    assert {(r.url, r.host_key) for r in res["seen"].collect()} == g_seen

    golden = pq.read_table(f"{fixture_dir}/crawl_order_golden.parquet") \
        .to_pylist()
    got = [r.asDict() for r in res["crawl_order"]
           .select("crawl_seq", "host_key", "url", "depth", "attempts", "ok")
           .collect()]
    assert len(got) == len(golden)

    def per_host(rows):
        out = {}
        for r in sorted(rows, key=lambda x: x["crawl_seq"]):
            out.setdefault(r["host_key"], []).append(
                (r["url"], r["depth"], r["attempts"], r["ok"]))
        return out

    assert per_host(got) == per_host(golden)

    g_docs = {(d["doc_id"], d["validity_score"]) for d in
              pq.read_table(f"{fixture_dir}/documents_golden.parquet")
              .to_pylist()}
    got_docs = {(r.doc_id, r.validity_score) for r in
                res["documents"].select("doc_id", "validity_score")
                .collect()}
    assert got_docs == g_docs
    for df in res["_cached"]:
        df.unpersist()
