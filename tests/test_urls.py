"""Phase-1 URL kernel tests: pure-Python kernels are reference-exact
(checked against hand-derived expectations from helper_method.py semantics),
and the JVM Column expressions agree with the Arrow UDFs on the fixture URL
space (expr == udf == kernel).

Reference: /root/reference/app/crawler/crawler_services/shared/helper_method.py
(on_clean_url :34-45, normalize_slashes :166-177, get_network_type :48-61,
get_host_name :105-121) and html_parse_manager.py:56-111.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from genesis_spark.functions import urls as U

ONION = "http://vv7pabmmyr2vnflor36gcmqt34024eitqzqlej7cvu6ngqhe5r6sslqd.onion"

CASES = [
    # (raw, clean, network, host_name, ext_bucket)
    ("HTTP://WWW.Example.COM/path/a//b/?q=1#f",
     "http://www.example.com/path/a//b?q=1#f", "clearnet", "Example", "none"),
    ("http://www.example.com/path/", "http://example.com/path", "clearnet",
     "example", "none"),
    (f"{ONION}/x/", f"{ONION}/x", "onion",
     "vv7pabmmyr2vnflor36gcmqt34024eitqzqlej7cvu6ngqhe5r6sslqd", "none"),
    ("http://sub.example.i2p/doc.pdf", "http://sub.example.i2p/doc.pdf",
     "i2p", "example", "document"),
    ("http://a.b/photo.JPeG", "http://a.b/photo.JPeG", "clearnet", "a",
     "image"),
    ("http://a.b/x.tar.gz", "http://a.b/x.tar.gz", "clearnet", "a",
     "archive"),
    ("http://a.b/clip.webm?dl=1", "http://a.b/clip.webm?dl=1", "clearnet",
     "a", "video"),
    ("http://a.b/page.html", "http://a.b/page.html", "clearnet", "a", "none"),
    ("http://host.onion/deep/www.mirror/", "http://host.onion/deep/www.mirror",
     "onion", "host", "none"),
]


@pytest.mark.parametrize("raw,clean,network,host,bucket", CASES)
def test_kernels_reference_exact(raw, clean, network, host, bucket):
    assert U.clean_url_one(raw) == clean
    assert U.network_type_one(raw) == network
    assert U.host_name_one(raw) == host
    assert U.ext_bucket_one(raw) == bucket


def test_clean_url_removes_first_www_occurrence_case_sensitive():
    # helper_method.py:36 — replace('www.', '', 1) happens BEFORE lower()
    assert U.clean_url_one("http://WWW.ex.com/") == "http://www.ex.com"
    assert U.clean_url_one("http://www.ex.com/") == "http://ex.com"
    # first occurrence anywhere in the netloc, faithful to the reference
    assert U.clean_url_one("http://a.www.ex.com/") == "http://a.ex.com"


def test_normalize_slashes_reference_exact():
    # helper_method.py:166-177 — strips empty segments then repairs schemes
    assert U.normalize_slashes_one("http://a//b///c") == "http://a/b/c"
    assert U.normalize_slashes_one("http://a/b/") == "http://a/b"
    assert U.normalize_slashes_one("//x//y") == "x/y"


def test_uri_validator():
    assert U.is_uri_valid_one("http://a.onion/x")
    assert not U.is_uri_valid_one("not a url")
    assert not U.is_uri_valid_one("/relative/only")


def test_network_type_schemeless_gets_http_prefix():
    # helper_method.py:50-51
    assert U.network_type_one("example.onion/x") == "onion"
    assert U.network_type_one("example.com") == "clearnet"


@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
               min_size=1, max_size=60))
@settings(max_examples=300, deadline=None)
def test_clean_url_stabilizes(s):
    """on_clean_url (helper_method.py:34-45) is NOT idempotent on every
    string: urlunparse renders an empty netloc + '//'-leading path (e.g.
    'http:////A') so that re-parsing shifts the path into the netloc,
    which only then gets lowercased. The reference has the identical
    quirk (same urlparse/urlunparse round trip), so the kernel keeps it;
    the guarantee that IS stable — and that the engine relies on, since
    install canonicalizes exactly once and re-canonicalization happens
    only on already-cleaned URLs — is stability from the second
    application on, pinned here over the full printable input space."""
    u = "http://" + s
    try:
        once = U.clean_url_one(u)
        twice = U.clean_url_one(once)
        thrice = U.clean_url_one(twice)
    except ValueError:
        return  # urlparse rejects some port-ish garbage; reference would too
    assert twice == thrice


def test_expr_equals_udf_on_url_space(spark):
    """The codegen fast path must agree with the Arrow truth path on
    well-formed scheme://host/path URLs (the only shape the engine feeds it).
    """
    rows = [(c[0],) for c in CASES] + [
        (f"{ONION}/p{i}/item{i}.html",) for i in range(50)
    ] + [
        (f"http://www.site{i}.com/a/b{i}?q={i}#frag",) for i in range(50)
    ] + [
        (f"http://host{i}.i2p/f{i}.tar.gz",) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "url string")
    out = df.select(
        "url",
        U.clean_url_udf("url").alias("c_udf"),
        U.canonicalize_expr(F.col("url")).alias("c_expr"),
        U.network_type_udf("url").alias("n_udf"),
        U.network_type_expr(F.col("url")).alias("n_expr"),
        U.host_name_udf("url").alias("h_udf"),
        U.host_name_expr(F.col("url")).alias("h_expr"),
        U.ext_bucket_udf("url").alias("e_udf"),
        U.ext_bucket_expr(F.col("url")).alias("e_expr"),
    ).collect()
    for r in out:
        assert r.c_udf == r.c_expr, r.url
        assert r.n_udf == r.n_expr, r.url
        assert r.h_udf == r.h_expr, r.url
        assert r.e_udf == r.e_expr, r.url


def test_politeness_bucket_is_deterministic(spark):
    df = spark.createDataFrame([("hostA",), ("hostB",)], "host_key string")
    a = df.select(U.politeness_bucket_expr(F.col("host_key")).alias("b")).collect()
    b = df.select(U.politeness_bucket_expr(F.col("host_key")).alias("b")).collect()
    assert a == b
    assert all(0 <= r.b < 256 for r in a)
