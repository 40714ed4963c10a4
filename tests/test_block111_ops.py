"""Block-111 operators: audience overlap, image caption-coverage
audit."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from collections import defaultdict

from genesis_spark.queries import (q_events_audience_overlap,
                                   q_spans_alt_text_audit)

SF = "/root/testdata/sf0.001"


def test_audience_overlap_golden(spark):
    users = defaultdict(set)
    for r in spark.read.parquet(f"{SF}/events.parquet") \
            .select("event_type", "user_id").collect():
        users[r["event_type"]].add(r["user_id"])
    got = {(r["type_a"], r["type_b"]): r for r in
           q_events_audience_overlap(spark, SF).collect()}
    types = sorted(users)
    exp_pairs = {(a, b) for i, a in enumerate(types)
                 for b in types[i + 1:]
                 if users[a] & users[b]}
    assert set(got) == exp_pairs
    for (a, b), r in got.items():
        inter = len(users[a] & users[b])
        union = len(users[a] | users[b])
        assert (r["n_a"], r["n_b"]) == (len(users[a]), len(users[b]))
        assert r["n_inter"] == inter
        assert r["jaccard_ppm"] == inter * 10**6 // union
        assert 0 <= r["jaccard_ppm"] <= 10**6


def test_alt_text_audit_golden(spark):
    got = {r["doc_id"]: r for r in
           q_spans_alt_text_audit(spark, SF).collect()}
    for r in spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text").collect():
        if r["text"] is None:
            continue
        words = r["text"].split(" ")
        n_chunks = max((len(words) + 7) // 8, 1)
        spans = []
        for j in range(n_chunks):
            spans.append(("section", " ".join(words[j * 8:j * 8 + 8])))
            if (j + 1) % 3 == 0:
                spans.append(("image", None))
        n_img = sum(1 for k, _t in spans if k == "image")
        cap = 0
        for i, (k, _t) in enumerate(spans):
            if k != "image":
                continue
            ok = False
            if i >= 1 and spans[i - 1][0] == "section" \
                    and len(spans[i - 1][1]) >= 20:
                ok = True
            if i + 1 < len(spans) and spans[i + 1][0] == "section" \
                    and len(spans[i + 1][1]) >= 20:
                ok = True
            cap += int(ok)
        g = got[str(r["doc_id"])]
        assert g["n_images"] == n_img
        assert g["n_captioned"] == cap
        exp_cov = cap * 10**6 // n_img if n_img else 0
        assert g["coverage_ppm"] == exp_cov
        exp_cls = ("no_media" if n_img == 0 else
                   "full" if cap == n_img else
                   "partial" if cap > 0 else "bare")
        assert g["audit_class"] == exp_cls
