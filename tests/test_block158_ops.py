"""Block-158 operators: RFC 1123 hostname validation, Wasserstein-1
drift, chunked-encoding artifacts."""

from __future__ import annotations

import re
from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_events_wasserstein_drift,
                                   q_url_hostname_validate,
                                   q_warc_chunked_artifact)

SF = "/root/testdata/sf0.001"


def test_hostname_validate_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    got = {r.rid: r for r in q_url_hostname_validate(spark, SF).collect()}
    verdicts = set()
    for k in ks:
        m = k % 7
        if m == 1:
            host = "a" + "x" * 64 + ".example"
        elif m == 2:
            host = f"-bad{k % 9}.example"
        elif m == 3:
            host = f"bad-{k % 9}-.example"
        elif m == 4:
            host = f"a..{k % 9}.example"
        elif m == 5:
            host = f"site{k % 9}.12345"
        elif m == 6:
            host = f"un_der{k % 9}.example"
        else:
            host = f"ok-site{k % 50}.example"
        ls = host.split(".")
        if len(host) > 253:
            want = "too_long"
        elif any(len(l) == 0 for l in ls):
            want = "empty_label"
        elif any(len(l) > 63 for l in ls):
            want = "label_too_long"
        elif any(l.startswith("-") or l.endswith("-") for l in ls):
            want = "hyphen_edge"
        elif any(not re.fullmatch(r"[a-z0-9-]+", l) for l in ls):
            want = "bad_chars"
        elif re.fullmatch(r"[0-9]+", ls[-1]):
            want = "numeric_tld"
        else:
            want = "valid"
        r = got[k]
        assert (r.host, r.verdict) == (host, want), k
        assert r.is_valid == int(want == "valid")
        assert r.n_labels == len(ls)
        verdicts.add(want)
    assert verdicts == {"valid", "empty_label", "label_too_long",
                        "hyphen_edge", "bad_chars", "numeric_tld"}


def _w1(sample_a, sample_b):
    na, nb = len(sample_a), len(sample_b)
    pts = sorted([(v, "a") for v in sample_a]
                 + [(v, "b") for v in sample_b])
    cum_a = cum_b = 0
    total = 0
    for i, (v, t) in enumerate(pts):
        if t == "a":
            cum_a += 1
        else:
            cum_b += 1
        if i + 1 < len(pts):
            gap = pts[i + 1][0] - v
            total += abs(cum_a * nb - cum_b * na) * gap
    return na, nb, total


def test_wasserstein_replay(spark):
    halves = defaultdict(lambda: ([], []))
    import datetime as dt
    for r in spark.read.parquet(f"{SF}/events.parquet") \
            .select("event_type", "ts", "value").collect():
        d = (r.ts.date() - dt.date(2024, 1, 1)).days
        halves[r.event_type][0 if d < 15 else 1].append(
            int(round(r.value * 100)))
    got = {r.event_type: r for r in
           q_events_wasserstein_drift(spark, SF).collect()}
    assert set(got) == set(halves)
    for t, (a, b) in halves.items():
        na, nb, w1 = _w1(a, b)
        r = got[t]
        assert (r.na, r.nb, r.w1_scaled) == (na, nb, w1), t
        assert r.w1_millicents == w1 * 1000 // (na * nb)
    # W1 is a metric: identical halves would be 0; real halves drift
    assert all(r.w1_scaled >= 0 for r in got.values())


def test_w1_translation_property():
    # moving every point of one sample by delta moves W1 by ~delta
    a = [10, 20, 30, 40]
    b = [v + 5 for v in a]
    na, nb, w1 = _w1(a, b)
    assert w1 // (na * nb) == 5  # exact for a pure shift


def test_chunked_artifact_replay(spark):
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect() if r.text is not None}
    got = {r.doc_id: r for r in
           q_warc_chunked_artifact(spark, SF).collect()}
    assert set(got) == set(docs)
    pat = re.compile(r"\r\n[0-9a-f]{1,4}\r\n")
    for d, text in docs.items():
        t = text[:200]
        if d % 13 == 0:
            ch = "\r\n" + format(200 + d % 800, "x") + "\r\n"
            ns = 2 + d % 3
            p = t[:50] + ch + t[50:110] + ch
            if ns > 2:
                p += t[110:150] + ch + t[150:]
            else:
                p += t[110:]
        else:
            p = t
        arts = pat.findall(p)
        r = got[d]
        assert r.n_artifacts == len(arts), d
        assert r.payload_len == len(p)
        assert r.clean_len == len(p) - sum(len(a) for a in arts)
        assert r.needs_dechunk == int(bool(arts))
    planted = [d for d in docs if d % 13 == 0 and len(docs[d]) > 0]
    assert planted and all(got[d].needs_dechunk for d in planted)
    assert any(not r.needs_dechunk for r in got.values())
