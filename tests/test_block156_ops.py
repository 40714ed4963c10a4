"""Block-156 operators: 1-bit minhash, TLS resumption accounting, alert
flap detection."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_dedup_minhash_1bit,
                                   q_events_flap_detect,
                                   q_fetch_tls_resume)

SF = "/root/testdata/sf0.001"
P = 2147483647


def _sig(text):
    toks = [t for t in text.lower().split(" ") if t]
    hs = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
          for t in toks]
    return [min((h * (2 * j + 3) + 7 * j + 1) % P for h in hs) % 2
            for j in range(16)]


def test_minhash_1bit_replay(spark):
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect()}
    got = {r.doc_id: r for r in q_dedup_minhash_1bit(spark, SF).collect()}
    pairs = [d for d in docs if d % 2 == 0]
    assert set(got) == set(pairs)
    for d in pairs:
        a = docs[d]
        b = a if d % 5 == 0 else re.sub(r" [^ ]+$", "", a)
        sa, sb = _sig(a), _sig(b)
        match = sum(1 for x, y in zip(sa, sb) if x == y)
        ta = set(t for t in a.lower().split(" ") if t)
        tb = set(t for t in b.lower().split(" ") if t)
        inter, union = len(ta & tb), len(ta | tb)
        r = got[d]
        assert r.n_match_bits == match, d
        assert (r.n_inter, r.n_union) == (inter, union)
        assert r.est_jaccard_ppm == max(
            0, (2 * match - 16) * 1000000 // 16)
        assert r.true_jaccard_ppm == inter * 1000000 // union
    # identical twins: all 16 bits match, both scores say 1.0
    ident = [d for d in pairs if d % 5 == 0]
    assert ident
    for d in ident:
        assert got[d].n_match_bits == 16
        assert got[d].est_jaccard_ppm == 1000000
        assert got[d].true_jaccard_ppm == 1000000
    # near-dups keep high estimates on average (debiasing works)
    near = [d for d in pairs if d % 5 != 0]
    avg_est = sum(got[d].est_jaccard_ppm for d in near) / len(near)
    avg_true = sum(got[d].true_jaccard_ppm for d in near) / len(near)
    assert avg_true > 900000 and avg_est > 600000


def test_tls_resume_replay(spark):
    per_host = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/orders.parquet") \
            .select("o_orderkey").collect():
        k = r.o_orderkey
        per_host[k % 40].append((k // 40) * 900 + (k % 7) * 50)
    got = {r.host: r for r in q_fetch_tls_resume(spark, SF).collect()}
    for h, ts in per_host.items():
        ts = sorted(ts)
        resumed = sum(1 for a, b in zip(ts, ts[1:]) if b - a <= 7200)
        r = got[f"h{h}"]
        assert r.n_sessions == len(ts)
        assert r.n_resumed == resumed
        assert r.n_full_handshakes == len(ts) - resumed
        assert r.ms_saved == resumed * 120
    # ticket cache really pays: most sessions resume
    tot = sum(r.n_sessions for r in got.values())
    res = sum(r.n_resumed for r in got.values())
    assert res * 2 > tot


def test_flap_detect_replay(spark):
    ev = sorted(spark.read.parquet(f"{SF}/events.parquet")
                .select("event_type", "event_id", "value").collect(),
                key=lambda r: r.event_id)
    per_type = defaultdict(list)
    for r in ev:
        per_type[r.event_type].append(
            int(int(round(r.value * 100)) > 10000))
    got = {r.event_type: r for r in
           q_events_flap_detect(spark, SF).collect()}
    assert set(got) == set(per_type)
    for t, states in per_type.items():
        trans = sum(1 for a, b in zip(states, states[1:]) if a != b)
        r = got[t]
        assert (r.n_samples, r.n_transitions, r.n_active) == (
            len(states), trans, sum(states))
        assert r.flapping == int(trans * 10 > len(states))
