"""Pluggable spell dictionary (T9/T10): file-backed load (the reference's
spell_check_handler.py:39-44 shape), broadcast threading through the parse
kernel, golden equality when the file carries the same vocabulary."""

from __future__ import annotations

import pytest

from genesis_spark.functions import text as TX
from genesis_spark.functions.parse import parse_page, parse_pages

# 14 dictionary words + 6 gibberish tokens = 70% known with the shipped
# dictionary (sentence kept), 0% with an empty one (sentence dropped) —
# and the kept text differs from the raw paragraph (periods are scrubbed
# before the spell gate), so the dictionary's effect survives the
# clean-vs-raw blanking into the final important_content.
HTML = ("<html><head><title>t</title></head><body>"
        "<p>market service hidden search engine forum board data base "
        "record file archive page site. zxqv qwfp glorb snark blixt "
        "krunk.</p></body></html>")
URL = "http://dict-test.onion"


def test_load_dictionary_file_roundtrip(tmp_path):
    p = tmp_path / "dict.txt"
    p.write_text("alpha beta\ngamma\n")
    assert TX.load_dictionary(str(p)) == frozenset({"alpha", "beta", "gamma"})
    assert TX.load_dictionary(None) is TX.DICTIONARY
    with pytest.raises(FileNotFoundError):
        TX.load_dictionary(str(tmp_path / "missing.txt"))


def test_shipped_default_dictionary_superset():
    d = TX.load_dictionary(TX.default_dictionary_path())
    # the shipped file carries at least the frozen stand-in vocabulary, so
    # swapping to the file-backed path cannot lose fixture-golden words
    assert TX.DICTIONARY <= d and TX.STOPWORDS <= d


def test_parse_kernel_golden_with_file_backed_dictionary(tmp_path):
    file_dict = TX.load_dictionary(TX.default_dictionary_path())
    base = parse_page(URL, HTML)
    filed = parse_page(URL, HTML, dictionary=file_dict)
    assert filed == base
    # an empty dictionary kills the sentence gate -> different output
    starved = parse_page(URL, HTML, dictionary=frozenset())
    assert starved["important_content"] != base["important_content"]


def test_parse_pages_broadcast_dictionary(spark):
    df = spark.createDataFrame([(URL, HTML)], "url string, html string")
    base = parse_pages(df, "url", "html").collect()[0]
    bc = spark.sparkContext.broadcast(
        TX.load_dictionary(TX.default_dictionary_path()))
    got = parse_pages(df, "url", "html", dictionary=bc).collect()[0]
    assert got.asDict() == base.asDict()
    starved = parse_pages(
        df, "url", "html",
        dictionary=spark.sparkContext.broadcast(frozenset())).collect()[0]
    assert starved.important_content != base.important_content
