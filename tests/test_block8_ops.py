"""Unit tests for the round-3 block-8 operators: robots.txt directives
(Crawl-delay/Sitemap), largest-remainder budget apportionment, CCNet
perplexity buckets, sliding-window aggregation, and the perceptual
image hash kernel."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from pyspark.sql import Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# robots directives
# ---------------------------------------------------------------------------

def _directives(spark, shapes, agent="genesis"):
    from genesis_spark.crawler.politeness import parse_robots_directives
    df = spark.createDataFrame(
        [(f"h{i}", s) for i, s in enumerate(shapes)],
        "host_key string, robots_txt string")
    return {r["host_key"]: r for r in
            parse_robots_directives(df, agent=agent).collect()}


def test_crawl_delay_specific_beats_star_and_min_wins(spark):
    out = _directives(spark, [
        "User-agent: genesis\nCrawl-delay: 0.5\n\n"
        "User-agent: *\nCrawl-delay: 10\n",
        "User-agent: *\nCrawl-delay: 2\n",
        # two applicable specific groups -> min wins
        "User-agent: genesis\nCrawl-delay: 9\n\n"
        "User-agent: genesis\nCrawl-delay: 4\n",
    ])
    assert out["h0"]["crawl_delay_ms"] == 500
    assert out["h1"]["crawl_delay_ms"] == 2000
    assert out["h2"]["crawl_delay_ms"] == 4000


def test_crawl_delay_inapplicable_group_and_garbage_are_null(spark):
    out = _directives(spark, [
        "User-agent: foo\nCrawl-delay: 7\n",      # foreign group only
        "User-agent: *\nCrawl-delay: oops\n",     # unparseable
        "",                                        # empty file
    ])
    assert all(out[h]["crawl_delay_ms"] is None for h in out)


def test_sitemaps_are_file_wide_and_sorted(spark):
    out = _directives(spark, [
        "User-agent: foo\nCrawl-delay: 7\n"
        "Sitemap: https://x.example/b.xml\n"
        "Sitemap: https://x.example/a.xml\n",
    ])
    r = out["h0"]
    assert r["n_sitemaps"] == 2
    assert r["sitemaps"] == "https://x.example/a.xml|https://x.example/b.xml"
    # file-wide: collected even though the only group is inapplicable
    assert r["crawl_delay_ms"] is None


# ---------------------------------------------------------------------------
# largest-remainder budget apportionment
# ---------------------------------------------------------------------------

def _apportion(spark, weights, budget):
    wts = spark.createDataFrame(weights, "host_key string, wt long")
    tot = wts.agg(F.sum("wt").alias("tot"))
    base = (wts.crossJoin(F.broadcast(tot))
            .select("host_key", "wt",
                    F.expr(f"({budget} * wt) DIV tot").alias("base"),
                    F.expr(f"({budget} * wt) % tot").alias("rem")))
    kdf = base.agg((F.lit(budget) - F.sum("base")).alias("k"))
    w = Window.orderBy(F.desc("rem"), F.asc("host_key"))
    out = (base.crossJoin(F.broadcast(kdf))
           .withColumn("rk", F.row_number().over(w))
           .select("host_key",
                   (F.col("base")
                    + F.when(F.col("rk") <= F.col("k"), 1).otherwise(0))
                   .cast("long").alias("alloc")))
    return {r["host_key"]: r["alloc"] for r in out.collect()}


def test_budget_sums_exactly_and_is_proportional(spark):
    alloc = _apportion(
        spark, [("a", 1), ("b", 1), ("c", 1)], budget=10)
    assert sum(alloc.values()) == 10
    # 10/3: base 3 each, remainder 1 -> first host by tie-break gets +1
    assert alloc == {"a": 4, "b": 3, "c": 3}


def test_budget_skewed_weights(spark):
    alloc = _apportion(
        spark, [("hub", 97), ("t1", 1), ("t2", 1), ("t3", 1)], budget=50)
    assert sum(alloc.values()) == 50
    # bases: hub 48 (rem 50), t* 0 (rem 50 each); all remainders tie at
    # 50, host_key ASC breaks it -> hub and t1 take the 2 leftover slots
    assert alloc == {"hub": 49, "t1": 1, "t2": 0, "t3": 0}


# ---------------------------------------------------------------------------
# ppl buckets / sliding windows — invariants over the fixture tables
# ---------------------------------------------------------------------------

def test_ppl_buckets_are_balanced_and_ordered(spark):
    from genesis_spark import queries as Q
    rows = Q.q_corpus_ppl_buckets(spark, "/root/testdata/sf0.001").collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["nll"])
    sizes = {b: len(v) for b, v in by_bucket.items()}
    assert set(sizes) == {"head", "middle", "tail"}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert max(by_bucket["head"]) <= min(by_bucket["middle"]) or \
        max(by_bucket["head"]) <= max(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"]) or \
        max(by_bucket["middle"]) <= max(by_bucket["tail"])


def test_sliding_window_double_counts_each_event(spark):
    from genesis_spark import queries as Q
    sf = "/root/testdata/sf0.001"
    out = Q.q_events_sliding(spark, sf)
    n_events = spark.read.parquet(f"{sf}/events.parquet").count()
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 2 * n_events  # duration/slide = 2 windows per event


# ---------------------------------------------------------------------------
# perceptual hash kernel
# ---------------------------------------------------------------------------

def test_ahash_known_bit_pattern(spark):
    from genesis_spark.operators import multimodal as MM
    # 8x8 image, top half 0, bottom half 255: mean compare px*64 > sum
    # -> rows 0-3 all zero bits (segs 0-1), rows 4-7 all ones (segs 2-3)
    pixels = bytes([0] * 32 + [255] * 32)
    blob = MM.encode_gray8(8, 8, pixels)
    df = spark.createDataFrame([(1, blob)],
                               "doc_id long, media_blob binary")
    r = MM.ahash_media(df).collect()[0]
    assert (r["seg0"], r["seg1"]) == (0, 0)
    assert (r["seg2"], r["seg3"]) == (0xFFFF, 0xFFFF)


def test_ahash_identical_images_same_hash_null_skipped(spark):
    from genesis_spark.operators import multimodal as MM
    blob = MM.gray8_by_doc_id(7)
    df = spark.createDataFrame(
        [(1, blob), (2, blob), (3, None)],
        "doc_id long, media_blob binary")
    rows = {r["doc_id"]: r for r in MM.ahash_media(df).collect()}
    assert set(rows) == {1, 2}
    segs = lambda r: (r["seg0"], r["seg1"], r["seg2"], r["seg3"])  # noqa
    assert segs(rows[1]) == segs(rows[2])
    assert all(0 <= s <= 0xFFFF for s in segs(rows[1]))


# ---------------------------------------------------------------------------
# plan hygiene — batch block-8 rows stay JVM-side
# ---------------------------------------------------------------------------

def test_block8_batch_rows_have_no_python_eval(spark):
    from genesis_spark import queries as Q
    sf = "/root/testdata/sf0.001"
    for fn in (Q.q_robots_directives, Q.q_frontier_budget,
               Q.q_corpus_ppl_buckets, Q.q_events_sliding):
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, fn.__name__
        assert "ArrowEvalPython" not in plan, fn.__name__
