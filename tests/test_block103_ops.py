"""Block-103 operators: Luhn-validated PAN detection, CUSUM
changepoint."""

from __future__ import annotations

from genesis_spark.queries import q_events_cusum, q_text_luhn_pii

import pytest

pytestmark = pytest.mark.block

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return [(r["doc_id"], r["text"]) for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect() if r["text"] is not None]


def _luhn_ok(s):
    tot = 0
    for i, ch in enumerate(reversed(s)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        tot += d
    return tot % 10 == 0


def test_luhn_pii_golden(spark):
    import re
    exp = {}
    for did, text in _docs(spark):
        xt = text
        if did % 6 == 0:
            xt += " card 4111111111111111 on file"
        if did % 10 == 7:
            xt += " ref 4111111111111112 code"
        if did % 15 == 5:
            xt += " acct 5555555555554444 ok"
        cands = re.findall(r"\b[0-9]{16}\b", xt)
        nv = sum(1 for c in cands if _luhn_ok(c))
        exp[did] = (len(cands), nv)
    got = {r["doc_id"]: r for r in q_text_luhn_pii(spark, SF).collect()}
    assert set(got) == set(exp)
    for did, (nc, nv) in exp.items():
        r = got[did]
        assert (r["n_candidates"], r["n_valid_pan"]) == (nc, nv)
        assert r["n_luhn_fail"] == nc - nv
        assert r["has_pii"] == int(nv > 0)
        assert r["redact_chars"] == 16 * nv
    # checksum separation: invalid injections never count as PANs
    only_invalid = [d for d in exp
                    if d % 10 == 7 and d % 6 != 0 and d % 15 != 5
                    and exp[d][0] == 1]
    assert only_invalid
    assert all(got[d]["n_valid_pan"] == 0 for d in only_invalid)
    assert all(got[d]["n_luhn_fail"] >= 1 for d in only_invalid)


def test_cusum_golden(spark):
    from collections import defaultdict
    daily = defaultdict(int)
    for r in spark.read.parquet(f"{SF}/events.parquet") \
            .select("event_type", "ts").collect():
        daily[(r["event_type"], r["ts"].date())] += 1
    by_type = defaultdict(dict)
    for (t, d), n in daily.items():
        by_type[t][d] = n
    got = {(r["event_type"], r["day"]): r for r in
           q_events_cusum(spark, SF).collect()}
    assert len(got) == len(daily)
    for t, days in by_type.items():
        total = sum(days.values())
        nd = len(days)
        s_up = s_lo = 0
        for d in sorted(days):
            n = days[d]
            # the native recursion the closed form must reproduce
            s_up = max(0, s_up + (n * nd - total - total // 8))
            s_lo = max(0, s_lo + (total - n * nd - total // 8))
            r = got[(t, d)]
            assert r["n"] == n
            assert r["s_up"] == s_up, (t, d)
            assert r["s_lo"] == s_lo, (t, d)
            assert r["alarm_up"] == int(s_up >= 2 * total)
            assert r["alarm_lo"] == int(s_lo >= 2 * total)
