"""Production fetch_fn (S4) e2e against an in-process HTTP fixture server:
status/redirect/html capture, canonicalized final URL, politeness pacing
measured. No external network — CI-safe."""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from genesis_spark.crawler.fetch import make_fetch_fn
from genesis_spark.crawler.politeness import paced_fetch


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path == "/redirect":
            self.send_response(302)
            self.send_header("Location", "/Final/")
            self.end_headers()
            return
        if self.path == "/missing":
            self.send_response(404)
            self.end_headers()
            return
        if self.path == "/subs":
            body = b"# book\nsub-x.i2p=Dest1\nsub-y.i2p=Dest2\n"
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        body = f"<html><body>page {self.path}</body></html>".encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):   # quiet
        pass


@pytest.fixture(scope="module")
def http_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_fn_status_redirect_and_clean(http_server):
    fetch = make_fetch_fn(timeout_s=5)
    status, final, html = fetch(f"{http_server}/p1")
    assert status == 200 and "page /p1" in html
    assert final == f"{http_server}/p1"
    # redirect followed; final URL canonicalized (trailing slash stripped
    # by clean_url_one, case preserved in path)
    status, final, html = fetch(f"{http_server}/redirect")
    assert status == 200 and "page /Final/" in html
    assert final == f"{http_server}/Final"
    status, final, html = fetch(f"{http_server}/missing")
    assert status == 404 and final is None and html is None
    status, final, html = fetch("http://127.0.0.1:1/nope")  # refused
    assert status == -1 and final is None and html is None


def test_paced_fetch_e2e_with_pacing(spark, http_server):
    delay = 0.15
    rows = [(f"{http_server}/h{h}/p{i}", f"h{h}", i)
            for h in range(2) for i in range(4)]
    df = spark.createDataFrame(rows, "url string, host_key string, pos int")
    fetch = make_fetch_fn(timeout_s=5)
    t0 = time.monotonic()
    out = paced_fetch(df, fetch, per_host_delay_s=delay,
                      order_col="pos").collect()
    wall = time.monotonic() - t0
    assert len(out) == 8
    assert all(r.status == 200 and f"page /h" in r.fetched_html for r in out)
    assert all(r.final_url == r.url for r in out)
    # pacing: 4 sequential requests per host -> >= 3 enforced gaps; hosts
    # land in different politeness buckets (parallel tasks), so the lower
    # bound is per-host, not global
    assert wall >= 3 * delay


def test_socks_path_requires_requests():
    try:
        import requests  # noqa: F401
        pytest.skip("requests installed; socks path constructible")
    except ImportError:
        with pytest.raises(ImportError):
            make_fetch_fn(socks_proxy="127.0.0.1:9050")


SUBSCRIPTION = "\n".join([
    "# official addressbook",
    "",
    "site-a.i2p=Base64Dest0001",
    "  ",
    " #not-actually-a-comment=x",          # raw line doesn't start with '#'
    "http://already-prefixed.i2p=Dest2",
    "site-b.i2p=Base64Dest0003",
])


def test_i2p_addressbook_line_semantics(spark):
    """i2p_controller.py:25-50 parse, including the leading-whitespace-#
    quirk (the reference tests startswith('#') on the RAW line)."""
    from genesis_spark.sources.i2p import addressbook_seeds
    subs = spark.createDataFrame([(SUBSCRIPTION,)], "content string")
    got = [r.url for r in addressbook_seeds(subs).collect()]
    assert got == [
        "http://site-a.i2p",
        "http://#not-actually-a-comment",
        "http://already-prefixed.i2p",
        "http://site-b.i2p",
    ]


def test_i2p_subscription_fetch_to_install(spark, http_server):
    """Subscription fetched over HTTP (fixture server), parsed, installed:
    the full S3 -> S8 path."""
    from genesis_spark.crawler import engine
    from genesis_spark.sources.i2p import (addressbook_seeds,
                                           fetch_subscriptions)
    fetch = make_fetch_fn(timeout_s=5)
    subs = fetch_subscriptions(
        spark, [f"{http_server}/subs", f"{http_server}/missing"], fetch)
    assert subs.count() == 1                      # failed fetch skipped
    seeds = (addressbook_seeds(subs)
             .withColumn("installed_at",
                         F.timestamp_seconds(F.lit(1_700_000_000)))
             .withColumn("seed_id", F.monotonically_increasing_id()))
    frontier = engine.install_seeds(seeds, host_budget=8)
    got = {(r.url, r.network) for r in
           frontier.select("url", "network").collect()}
    assert got == {("http://sub-x.i2p", "i2p"), ("http://sub-y.i2p", "i2p")}


def test_i2p_addressbook_crlf_and_tab_lines(spark):
    """Round-2 advice: reference splitlines()+strip() semantics — CRLF
    subscription files must not leave '\\r' on hosts, and tab-only lines
    are blank, not bogus seeds."""
    from genesis_spark.sources.i2p import addressbook_seeds
    crlf = "\r\n".join([
        "# comment",
        "site-crlf.i2p=Dest1",
        "\t",
        "site-last.i2p=Dest2",
    ])
    subs = spark.createDataFrame([(crlf,)], "content string")
    got = [r.url for r in addressbook_seeds(subs).collect()]
    assert got == ["http://site-crlf.i2p", "http://site-last.i2p"]
