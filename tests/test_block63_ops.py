"""Block-63 operators: percent-encoding normalization, page-level
robots directives, RSS/Atom feed source."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from pyspark.sql import functions as F

from genesis_spark.functions.urls import (pct_normalize_expr,
                                          pct_normalize_one)
from genesis_spark.queries import q_feed_ingest, q_robots_meta
from genesis_spark.sources.feeds import feed_candidates, parse_feed

SF = "/root/testdata/sf0.001"

ADVERSARIAL = [
    "http://e.com/%7euser",        # lowercase unreserved escape -> ~
    "http://e.com/%7Euser",        # uppercase form, same decode
    "http://e.com/a%2fb",          # reserved '/' stays, hex uppercased
    "http://e.com/a%2Fb",          # already normal -> unchanged
    "http://e.com/%41%61%30",      # Aa0 all decode
    "http://e.com/%2d%2e%5f%7e",   # -._~ the 4 punct unreserved
    "http://e.com/100%25off",      # '%' itself stays encoded
    "http://e.com/%zz",            # malformed escape passes through
    "http://e.com/%",              # trailing bare %
    "http://e.com/%4",             # truncated escape
    "http://e.com/%%41",           # bare % then valid escape
    "http://e.com/%fF",            # mixed-case hex, non-unreserved
    "plain-no-escapes",
    "%41",                         # escape at position 0
    "",                            # empty string
]


def test_pct_normalize_matches_python_reference(spark):
    df = spark.createDataFrame([(u,) for u in ADVERSARIAL], ["url"])
    got = [r["n"] for r in
           df.select(pct_normalize_expr("url").alias("n")).collect()]
    want = [pct_normalize_one(u) for u in ADVERSARIAL]
    assert got == want
    # spot-check the semantics, not just self-consistency
    assert want[0] == "http://e.com/~user"
    assert want[2] == "http://e.com/a%2Fb"
    assert want[7] == "http://e.com/%zz"
    assert want[10] == "http://e.com/%A"


def test_pct_normalize_idempotent(spark):
    df = spark.createDataFrame([(u,) for u in ADVERSARIAL], ["url"])
    once = df.select(pct_normalize_expr("url").alias("url"))
    twice = once.select(pct_normalize_expr("url").alias("url"))
    assert [r["url"] for r in once.collect()] == \
        [r["url"] for r in twice.collect()]


def test_robots_meta_census_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    exp: dict[str, list[int]] = {}
    for k in keys:
        m, h = k % 8, k % 5
        noindex = m in (0, 2, 3) or h == 1
        nofollow = m in (1, 2) or h == 0
        noarchive = m == 4 or h == 1
        host = f"h{k % 25}"
        row = exp.setdefault(host, [0, 0, 0, 0, 0])
        row[0] += 1
        row[1] += int(noindex)
        row[2] += int(nofollow)
        row[3] += int(noarchive)
        row[4] += (k % 12) if nofollow else 0
    got = {r["host"]: r for r in q_robots_meta(spark, SF).collect()}
    assert set(got) == set(exp)
    for host, (n, ni, nf, na, lost) in exp.items():
        r = got[host]
        assert (r["n_pages"], r["n_noindex"], r["n_nofollow"],
                r["n_noarchive"], r["links_lost"]) == (n, ni, nf, na, lost)
        assert r["noindex_ppm"] == ni * 1_000_000 // n


def test_parse_feed_dual_format_and_edge_cases(spark):
    rss = ("<rss><channel>"
           "<item><title>a</title><link> http://x/1 </link>"
           "<pubDate>2024-01-02</pubDate></item>"
           "<item><title>no-link</title></item>"
           "<item><link>http://x/2</link></item>"  # no pubDate -> NULL
           "</channel></rss>")
    atom = ("<feed>"
            '<entry><link href="http://x/1"/>'
            "<updated>2024-01-01T00:00:00Z</updated></entry>"
            "<entry><title>no-link</title></entry>"
            "</feed>")
    df = spark.createDataFrame([(rss,), (atom,)], ["content"])
    parsed = parse_feed(df).collect()
    rows = {(r["url"], r["fmt"]): r["published"] for r in parsed}
    # linkless blocks dropped in both formats
    assert len(parsed) == 3
    assert rows[("http://x/1", "rss")] == "2024-01-02"  # trimmed
    assert rows[("http://x/2", "rss")] is None          # missing date
    assert rows[("http://x/1", "atom")] == "2024-01-01T00:00:00Z"
    cand = {r["url"]: r for r in feed_candidates(
        parse_feed(df)).collect()}
    assert cand["http://x/1"]["n_sightings"] == 2
    # earliest declared publication wins across formats
    assert cand["http://x/1"]["published"] == "2024-01-01T00:00:00Z"


def test_feed_ingest_no_python_in_plan(spark):
    plan = q_feed_ingest(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
