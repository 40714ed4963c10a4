"""Block-146 operators: consumer-lag accounting, open-redirect
detection, WARC digest verification."""

from __future__ import annotations

import hashlib

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_stream_consumer_lag,
                                   q_url_open_redirect_detect,
                                   q_warc_digest_verify)

SF = "/root/testdata/sf0.001"


def test_consumer_lag_replay(spark):
    got = {(r.p, r.t): r for r in
           q_stream_consumer_lag(spark, SF).collect()}
    assert len(got) == 80
    prev_lag = {}
    for t in range(10):
        for p in range(8):
            rate = 100 + p * 13
            dp = 1 + p % 3
            produced = (t + 1) * rate
            consumed = max(0, t + 1 - dp) * rate
            lag = produced - consumed
            r = got[(p, t)]
            assert (r.produced_n, r.consumed_n, r.lag_n) == (
                produced, consumed, lag), (p, t)
            assert r.lag_delta == lag - prev_lag.get(p, 0)
            if consumed > 0:
                assert r.eta_ticks == (lag + rate - 1) // rate == dp
            else:
                assert r.eta_ticks == -1
            assert r.growing == int(r.lag_delta > 0)
            prev_lag[p] = lag
    # steady state: once the consumer runs, lag stops growing
    assert all(got[(p, 9)].growing == 0 for p in range(8))
    # warm-up: every partition's lag grows during its delay window
    assert all(got[(p, 0)].growing == 1 for p in range(8))


def test_open_redirect_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    got = {r.rid: r for r in
           q_url_open_redirect_detect(spark, SF).collect()}
    verdicts = set()
    for k in ks:
        r = got[k]
        m = k % 4
        want = {0: "same_host", 1: "open_redirect",
                2: "relative", 3: "none"}[m]
        assert r.verdict == want, (k, r.verdict)
        assert r.cross_host == int(m == 1)
        if m == 1:
            assert r.target_host == f"evil{k % 7}.example"
            assert r.redirect_param == ("next" if k % 2 == 0
                                        else "goto")
        verdicts.add(want)
    assert verdicts == {"same_host", "open_redirect", "relative",
                        "none"}


def test_digest_verify_replay(spark):
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect()}
    got = {r.doc_id: r for r in q_warc_digest_verify(spark, SF).collect()}
    for d, text in docs.items():
        payload = f"payload for doc {d}: " + text[:100]
        digest = hashlib.md5(payload.encode()).hexdigest()
        r = got[d]
        assert r.digest8 == digest[:8], d
        want_ok = int(d % 13 != 0)
        assert r.digest_ok == want_ok
        assert r.verdict == ("verified" if want_ok else "corrupt")
    assert any(r.digest_ok == 0 for r in got.values())
    assert sum(r.digest_ok == 0 for r in got.values()) < len(got) // 10
