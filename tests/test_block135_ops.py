"""Block-135 operators: streaming native session windows, charset
sniffing, Mann-Whitney U."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_events_mann_whitney,
                                   q_events_session_native,
                                   q_fetch_charset_sniff)

SF = "/root/testdata/sf0.001"


def test_charset_sniff_precedence_replay(spark):
    keys = [r.o_orderkey for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    got = {r.rid: (r.charset, r.source) for r in
           q_fetch_charset_sniff(spark, SF).collect()}
    seen_sources = set()
    for k in keys:
        if k % 7 == 0:
            want = ("utf-8", "bom")
        elif k % 7 == 1:
            want = ("utf-16le", "bom")
        elif k % 7 == 2:
            want = ("utf-16be", "bom")
        elif k % 5 == 0:
            want = ("shift_jis", "header")
        elif k % 3 == 0:
            want = (("iso-8859-1" if k % 2 == 0 else "utf-8"), "meta")
        else:
            want = ("windows-1252", "default")
        assert got[k] == want, k
        seen_sources.add(want[1])
    assert seen_sources == {"bom", "header", "meta", "default"}
    # override coverage: a BOM doc that ALSO carries a header charset
    assert any(k % 7 in (0, 1, 2) and k % 5 == 0 for k in keys)


def test_mann_whitney_replay_and_decisions(spark):
    vals = [(r.event_id % 2, int(r.value * 100 + 0.5)) for r in
            spark.read.parquet(f"{SF}/events.parquet")
            .select("event_id", "value").collect()]
    a = [v for g, v in vals if g == 0]
    b = [v for g, v in vals if g == 1]

    def mw(xs, ys):
        census = defaultdict(lambda: [0, 0])
        for v in xs:
            census[v][0] += 1
        for v in ys:
            census[v][1] += 1
        prior, r1_2x, tie = 0, 0, 0
        for v in sorted(census):
            c1, c2 = census[v]
            t = c1 + c2
            r1_2x += c1 * (2 * (prior + 1) + t - 1)
            tie += t ** 3 - t
            prior += t
        n1, n2 = len(xs), len(ys)
        u2x = r1_2x - n1 * (n1 + 1)
        N = n1 + n2
        diff = u2x - n1 * n2
        lhs = diff * diff * 120000 * N * (N - 1)
        rhs = 153664 * n1 * n2 * ((N + 1) * N * (N - 1) - tie)
        return n1, n2, u2x, tie, int(lhs > rhs)

    want = {"ab": mw(a, b), "ac": mw(a, [v + v // 2 for v in b])}
    got = {r.pair: (r.n1, r.n2, r.u2x, r.tie_sum, r.reject)
           for r in q_events_mann_whitney(spark, SF).collect()}
    assert got == want
    assert got["ab"][4] == 0 and got["ac"][4] == 1
    # ties genuinely present (the correction term is live)
    assert got["ab"][3] > 0


def test_stream_session_native_equals_batch(spark):
    """The streaming row's oracle IS the batch islands SQL; here the
    stream result is compared against the batch session_window
    DataFrame directly — engine-internal agreement."""
    from genesis_spark.queries import q_stream_session_native

    batch = {(r.user_id, r.session_n): (r.n_events, r.first_ts, r.last_ts)
             for r in q_events_session_native(spark, SF).collect()}
    stream = {(r.user_id, r.session_n): (r.n_events, r.first_ts,
                                         r.last_ts)
              for r in q_stream_session_native(spark, SF).collect()}
    assert stream == batch
