"""Block-148 operators: forward fill, 2PC commit audit, HDR log2
histogram."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_events_forward_fill,
                                   q_events_latency_hdr,
                                   q_snapshot_commit_audit)

SF = "/root/testdata/sf0.001"


def test_forward_fill_replay(spark):
    got = {(r.s, r.t): r for r in
           q_events_forward_fill(spark, SF).collect()}
    assert len(got) == 100
    for s in range(5):
        last_t, last_v = None, None
        for t in range(20):
            present = (s + t) % 4 != 0
            if present:
                last_t, last_v = t, s * 100 + t
            r = got[(s, t)]
            assert r.present == int(present)
            if last_t is None:
                assert (r.filled_value, r.fill_age) == (-1, -1)
            else:
                assert r.filled_value == last_v
                assert r.fill_age == t - last_t
    # holes really get filled with the previous value, not dropped
    holes = [r for r in got.values() if r.present == 0]
    assert holes and any(r.filled_value >= 0 for r in holes)
    # leading holes stay unfilled
    assert got[(0, 0)].present == 0 and got[(0, 0)].fill_age == -1


def test_commit_audit_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    got = {r.txn: r for r in q_snapshot_commit_audit(spark, SF).collect()}
    verdicts = set()
    for k in ks:
        r = got[k]
        assert r.n_prepare == 1
        if k % 11 == 0:
            want, nc, lat = "orphaned", 0, -1
        elif k % 13 == 0:
            want, nc, lat = "duplicate", 2, 3 + k % 5
        else:
            want, nc, lat = "clean", 1, 3 + k % 5
        assert (r.verdict, r.n_commit, r.commit_latency) == (
            want, nc, lat), k
        verdicts.add(want)
    assert verdicts == {"orphaned", "duplicate", "clean"}


def test_latency_hdr_replay(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("event_type", "value").collect()
    hist = defaultdict(lambda: defaultdict(int))
    for r in ev:
        v = int(round(r.value * 100))
        if v > 0:
            hist[r.event_type][v.bit_length() - 1] += 1
    got = {(r.event_type, r.bucket): r for r in
           q_events_latency_hdr(spark, SF).collect()}
    assert set(got) == {(t, b) for t, bs in hist.items() for b in bs}
    for t, bs in hist.items():
        n = sum(bs.values())
        cum = 0
        p50 = p95 = None
        tmp = 0
        for b in sorted(bs):
            tmp += bs[b]
            if p50 is None and tmp * 2 >= n:
                p50 = b
            if p95 is None and tmp * 20 >= n * 19:
                p95 = b
        for b in sorted(bs):
            cum += bs[b]
            r = got[(t, b)]
            assert (r.cnt, r.cum) == (bs[b], cum)
            assert (r.p50_bucket, r.p95_bucket) == (p50, p95)
        assert p50 <= p95  # tails sit at or above the median bucket


def test_bit_length_is_log2_floor():
    import math
    for v in (1, 2, 3, 4, 7, 8, 1023, 1024, 99999):
        assert v.bit_length() - 1 == int(math.floor(math.log2(v)))
