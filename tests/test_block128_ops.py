"""Block-128 operators: JSON-LD extraction, CART split search, Link
header parsing."""

from __future__ import annotations

import json
from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_events_cart_split, q_http_link_header,
                                   q_text_jsonld_extract)

SF = "/root/testdata/sf0.001"


def test_jsonld_census_python_replay(spark):
    docs = [(r.doc_id, r.n_chars) for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "n_chars", "text").collect()
            if r.n_chars is not None]
    cls = defaultdict(lambda: [0, 0, []])
    for d, n in docs:
        typ = ["Article", "Product", "NewsArticle"][d % 3]
        payload = json.dumps({"@context": "https://schema.org",
                              "@type": typ, "name": f"doc {d}",
                              "wordCount": n}, separators=(",", ":"))
        if d % 13 == 0:
            payload = payload[:-7]
            try:
                json.loads(payload)
                raise AssertionError("torn block unexpectedly valid")
            except json.JSONDecodeError:
                pass
            key, wc = "_torn", 0
        else:
            key, wc = typ, n
        cls[key][0] += 1
        cls[key][1] += wc
        cls[key][2].append(d)
    got = {r.jtype: r for r in q_text_jsonld_extract(spark, SF).collect()}
    assert set(got) == set(cls)
    for typ, (n, wc, ids) in cls.items():
        r = got[typ]
        assert (r.n_docs, r.sum_wc, r.min_doc, r.max_doc) == (
            n, wc, min(ids), max(ids)), typ
    assert got["_torn"].n_docs > 0


def test_cart_split_gain_replay_and_best(spark):
    evs = [(r.event_type, r.ts.hour, int(r.value * 100 + 0.5)) for r in
           spark.read.parquet(f"{SF}/events.parquet")
           .select("event_type", "ts", "value").collect()]
    rows = q_events_cart_split(spark, SF).collect()
    by_type = defaultdict(dict)
    for r in rows:
        by_type[r.event_type][r.t] = r
    for et, per_t in by_type.items():
        pts = [(h, c) for t_, h, c in evs if t_ == et]
        assert set(per_t) == set(range(1, 24))
        gains = {}
        for t in range(1, 24):
            left = [c for h, c in pts if h < t]
            right = [c for h, c in pts if h >= t]
            g = 0
            if left:
                g += sum(left) ** 2 * 1000000 // len(left)
            if right:
                g += sum(right) ** 2 * 1000000 // len(right)
            r = per_t[t]
            assert (r.n_l, r.n_r) == (len(left), len(right))
            assert (r.s_l, r.s_r) == (sum(left), sum(right))
            assert int(r.gain_u) == g, (et, t)
            gains[t] = g
        best = [t for t, r in per_t.items() if r.is_best]
        top = max(gains.values())
        assert best == [min(t for t, g in gains.items() if g == top)]


def test_link_header_parse_replay(spark):
    pages = {r.o_orderkey % 300 for r in
             spark.read.parquet(f"{SF}/orders.parquet")
             .select("o_orderkey").collect()}
    got = defaultdict(dict)
    for r in q_http_link_header(spark, SF).collect():
        got[r.page_id][r.idx] = (r.url, r.rel, r.has_next)
    assert set(got) == pages
    for p in pages:
        base = f"http://h{p % 30}.onion/page"
        expect_next = p % 7 != 0
        links = got[p]
        rels = [v[1] for _, v in sorted(links.items())]
        if expect_next:
            assert rels == ["next", "prev", "canonical"]
            assert links[0][0] == f"{base}{p + 1}"
        else:
            assert rels == ["prev", "canonical"]
        assert links[max(links)][0] == f"{base}{p}"      # canonical = self
        prev_idx = 1 if expect_next else 0
        assert links[prev_idx][0] == f"{base}{max(p - 1, 0)}"
        assert all(v[2] == int(expect_next) for v in links.values())
