"""Classifier harness (M1/J6/D8): one model call per distinct host, lazy
per-worker model load, broadcast join-back, deterministic labels."""

from __future__ import annotations

from pyspark.sql import functions as F

from genesis_spark.operators.classify import (classify_hosts,
                                              stub_model_factory,
                                              with_host_labels)

N_HOSTS = 15
N_PAGES = 120


def _pages(spark):
    rows = [(f"http://host{i % N_HOSTS}.onion",
             f"title {i}", f"important {i}", f"body {i}",
             i // N_HOSTS, i % 7) for i in range(N_PAGES)]
    return spark.createDataFrame(
        rows, "base_url string, title string, important_content string, "
              "content string, depth int, pos int")


def test_one_model_call_per_distinct_host(spark):
    calls = spark.sparkContext.accumulator(0)
    loads = spark.sparkContext.accumulator(0)
    labels = classify_hosts(_pages(spark), call_counter=calls,
                            load_counter=loads)
    got = labels.collect()
    assert len(got) == N_HOSTS                      # D8: dedup before model
    assert calls.value == N_HOSTS                   # M1: one call per host
    assert 1 <= loads.value <= 8                    # lazy load per worker

    # deterministic: same input -> same labels on a re-run
    again = {r.base_url: r.content_type for r in
             classify_hosts(_pages(spark)).collect()}
    assert {r.base_url: r.content_type for r in got} == again


def test_label_joinback_is_broadcast_and_total(spark):
    pages = _pages(spark)
    labels = classify_hosts(pages)
    out = with_host_labels(pages.drop("depth", "pos"), labels)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    rows = out.collect()
    assert len(rows) == N_PAGES
    assert all(r.content_type for r in rows)        # no null labels
    # every page of one host carries the SAME label (the per-host memo)
    by_host = {}
    for r in rows:
        by_host.setdefault(r.base_url, set()).add(tuple(r.content_type))
    assert all(len(v) == 1 for v in by_host.values())


def test_stub_model_threshold_semantics():
    model = stub_model_factory()
    assert model("") == ["general"]                 # empty -> general
    outs = {tuple(model(f"text {i}")) for i in range(50)}
    assert ("general",) in outs                     # sub-threshold branch
    assert len(outs) > 3                            # confident branch too


def test_label_joinback_onto_real_parse_output(spark):
    """Round-2 advice: parse_pages output already carries a parser-filled
    content_type column; with_host_labels must OVERWRITE it (the reference
    assigns the memoized classifier decision), not die on an ambiguous
    reference."""
    from genesis_spark.functions.parse import parse_pages

    html = ("<html><head><title>shop {i}</title></head>"
            "<body><p>plain words about things here</p></body></html>")
    rows = [(f"http://h{i % 3}.onion/p{i}", html.format(i=i))
            for i in range(9)]
    raw = spark.createDataFrame(rows, "url string, html string")
    parsed = (parse_pages(raw)
              .withColumn("depth", F.lit(0))
              .withColumn("pos", F.lit(0)))
    assert "content_type" in parsed.columns
    labels = classify_hosts(parsed)
    out = with_host_labels(parsed, labels)
    got = out.select("base_url", "content_type").collect()
    assert len(got) == 9
    label_by_host = {r.base_url: tuple(r.content_type)
                     for r in labels.collect()}
    # the classifier label, not the parser stub, wins on every page
    assert all(tuple(r.content_type) == label_by_host[r.base_url]
               for r in got)


def test_keyword_centroid_model_real_predictions():
    """A5's real (library-free) model: nearest-centroid over binary
    bag-of-words with the reference decision shape."""
    from genesis_spark.operators.classify import (
        keyword_centroid_model_factory)
    model = keyword_centroid_model_factory()
    assert model("buy bitcoin with your monero wallet on our exchange") \
        == ["cryptocurrency"]
    assert model("fresh database leak dump with 3M breach records") \
        == ["leaks"]
    # sub-threshold (one marker out of six) and off-topic -> general
    assert model("a forum of cats") == ["general"]
    assert model("sunny weather gardening tips") == ["general"]
    assert model("") == ["general"]
    # deterministic tie-break: equal scores resolve to the lexicographically
    # first label (carding before leaks)
    tie = keyword_centroid_model_factory(
        {"leaks": ("alpha", "beta"), "carding": ("alpha", "gamma")},
        threshold=0.1)
    assert tie("alpha") == ["carding"]


def test_classify_hosts_with_centroid_model(spark):
    from genesis_spark.operators.classify import (
        keyword_centroid_model_factory)
    rows = [
        ("http://coins.onion", "crypto hub",
         "bitcoin monero wallet exchange daily", "crypto talk", 0, 0),
        ("http://cats.onion", "cat pictures",
         "fluffy cats doing cat things", "meow", 0, 0),
    ]
    pages = spark.createDataFrame(
        rows, "base_url string, title string, important_content string, "
              "content string, depth int, pos int")
    labels = {r.base_url: r.content_type for r in classify_hosts(
        pages, model_factory=keyword_centroid_model_factory,
        model_key="topic-centroid").collect()}
    assert labels["http://coins.onion"] == ["cryptocurrency"]
    assert labels["http://cats.onion"] == ["general"]
