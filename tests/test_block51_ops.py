"""Block-51 operators: blocklist admission, MIME sniff audit,
URL template mining."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
import re

import duckdb

from genesis_spark.functions.urls import blocklist_match
from genesis_spark.queries import (_BLOCKLIST51, _MAGIC51,
                                   q_fetch_mime_mismatch,
                                   q_url_blocklist_filter,
                                   q_url_pattern_mine)

SF = "/root/testdata/sf0.001"


def test_blocklist_label_boundary(spark):
    """'notads4.com' must NOT match 'ads4.com'; subdomains at any depth
    must; an exact entry hit must."""
    hosts = spark.createDataFrame(
        [("ads4.com",), ("x.ads4.com",), ("deep.x.ads4.com",),
         ("notads4.com",), ("clean.org",), ("www.site8.com",),
         ("localhost",), ("",), (None,)],  # <2-label edge: sequence(2,1)
        "host string")
    bl = spark.createDataFrame([("ads4.com",), ("www.site8.com",)],
                               "entry string")
    got = {r["host"]: r["matched_entry"]
           for r in blocklist_match(hosts, bl).collect()}
    assert got == {"ads4.com": "ads4.com", "x.ads4.com": "ads4.com",
                   "deep.x.ads4.com": "ads4.com", "notads4.com": None,
                   "clean.org": None, "www.site8.com": "www.site8.com",
                   "localhost": None, "": None, None: None}


def test_blocklist_filter_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, o_custkey FROM '{SF}/orders.parquet'"
    ).fetchall()
    names = ["ads", "track", "spam", "cdn", "site", "shop"]
    tlds = ["com", "org", "net", "io"]
    census: dict[str, int] = {}
    for k, c in rows:
        sub = ("www." if k % 3 == 0
               else f"s{c % 5}." if k % 3 == 1 else "")
        host = f"{sub}{names[c % 6]}{k % 10}.{tlds[k % 4]}"
        census[host] = census.get(host, 0) + 1
    expect: dict[str, list[int]] = {}
    for host, n in census.items():
        matches = [e for e in _BLOCKLIST51
                   if host == e or host.endswith("." + e)]
        key = min(matches) if matches else "ALLOWED"
        agg = expect.setdefault(key, [0, 0])
        agg[0] += 1
        agg[1] += n
    got = {r["matched_entry"]: [r["n_hosts"], r["n_urls"]]
           for r in q_url_blocklist_filter(spark, SF).collect()}
    assert got == expect
    # the synthesis must actually exercise the gate
    assert len(got) >= 5 and "ALLOWED" in got


def test_mime_mismatch_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT l_orderkey, l_partkey FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    types = [t for _, t in _MAGIC51]
    sniff_prefixes = [("89504E47", "image/png"), ("FFD8FF", "image/jpeg"),
                      ("474946", "image/gif"), ("25504446",
                                                "application/pdf"),
                      ("504B0304", "application/zip"),
                      ("3C21444F", "text/html")]
    expect: dict[tuple, int] = {}
    for lk, pk in rows:
        fmt = lk % 6
        hx = (_MAGIC51[fmt][0]
              + hashlib.md5(str(pk).encode()).hexdigest()[:8].upper())
        declared = types[(fmt + 1) % 6 if pk % 7 == 0 else fmt]
        sniffed = next((t for p, t in sniff_prefixes
                        if hx.startswith(p)), "application/octet-stream")
        expect[(declared, sniffed)] = expect.get((declared, sniffed),
                                                 0) + 1
    got = {(r["declared"], r["sniffed"]): (r["n_blobs"], r["is_mismatch"])
           for r in q_fetch_mime_mismatch(spark, SF).collect()}
    assert {k: v[0] for k, v in got.items()} == expect
    for (d, s), (_, mm) in got.items():
        assert mm == (d != s)
    # planted mismatches exist and every format sniffs back to itself
    assert any(d != s for d, s in expect)
    assert all((t, t) in expect for t in types)


def test_pattern_mine_template_collapse_and_rank(spark):
    out = q_url_pattern_mine(spark, SF).collect()
    templates = {r["template"] for r in out}
    assert "/item/{N}/v{N}" in templates
    assert "/u/{H}/profile" in templates
    assert "/static/css" in templates
    # per-host: rnk is 1..3, volumes non-increasing
    by_host: dict[str, list] = {}
    for r in out:
        by_host.setdefault(r["host_key"], []).append(r)
    for rows in by_host.values():
        rows.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        vols = [r["n_urls"] for r in rows]
        assert vols == sorted(vols, reverse=True)
    # id-bearing templates are high-variability, static pages low
    for r in out:
        if r["template"] == "/static/css":
            assert r["n_distinct"] == 1
            # one distinct URL re-encountered many times -> low ppm
            assert r["variability_ppm"] < 200_000
        if r["template"] == "/item/{N}/v{N}":
            assert r["variability_ppm"] > 500_000


def test_pattern_mine_hex_before_digit_order():
    """The hex-run collapse must run before the digit collapse or a
    6+-digit id would split into {N} islands."""
    t = re.sub(r"[0-9]+", "{N}",
               re.sub(r"[0-9a-f]{6,}", "{H}", "/u/ab12cd/profile"))
    assert t == "/u/{H}/profile"
    t2 = re.sub(r"[0-9]+", "{N}",
                re.sub(r"[0-9a-f]{6,}", "{H}", "/item/123/v4"))
    assert t2 == "/item/{N}/v{N}"
