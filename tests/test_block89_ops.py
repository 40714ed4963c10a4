"""Block-89 operators: math-content detection, session entry/exit
census, redirect-loop detection."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import re
from itertools import permutations

from genesis_spark.queries import (q_events_entry_exit, q_text_math_detect,
                                   q_url_redirect_loops)

SF = "/root/testdata/sf0.001"


def test_math_detect_golden(spark):
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["text"] is not None}
    got = {r["doc_id"]: r for r in q_text_math_detect(spark, SF).collect()}
    assert set(got) == set(docs)
    verdicts = set()
    for d, t in docs.items():
        xt = t
        if d % 4 == 0:
            xt += " x = 3 + 4 y = x * 2 z = y - 1"
        if d % 6 == 0:
            xt += " \\frac{a}{b} \\sum_{i=0} e^x"
        toks = xt.split(" ")
        r = got[d]
        assert r["n_tokens"] == len(toks)
        assert r["n_digit_tokens"] == \
            sum(bool(re.fullmatch(r"[0-9]+", w)) for w in toks)
        assert r["n_operators"] == len(re.findall(r"[=+*/^]| - ", xt))
        assert r["n_equations"] == \
            len(re.findall(r"[a-z0-9}] = [a-z0-9\\]", xt))
        assert r["n_latex"] == \
            len(re.findall(r"\\(frac|sum|int|sqrt)", xt))
        want = ("math" if r["n_latex"] > 0 or r["n_equations"] >= 3
                else "mixed" if r["n_equations"] >= 1 else "prose")
        assert r["verdict"] == want
        verdicts.add(want)
    assert {"math", "prose"} <= verdicts


def test_entry_exit_census_golden(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "event_id", "event_type", "ts").collect()
    per_user = {}
    for r in ev:
        per_user.setdefault(r["user_id"], []).append(
            (int(r["ts"].timestamp()), r["event_id"], r["event_type"]))
    sessions = []
    for u, rows in per_user.items():
        rows.sort()
        cur = []
        prev = None
        for es, eid, et in rows:
            if prev is not None and es - prev > 1800:
                sessions.append(cur)
                cur = []
            cur.append((es, eid, et))
            prev = es
        sessions.append(cur)
    n_sessions = len(sessions)
    entry, exit_, bounce = {}, {}, {}
    for s in sessions:
        first, last = min(s), max(s)
        entry[first[2]] = entry.get(first[2], 0) + 1
        exit_[last[2]] = exit_.get(last[2], 0) + 1
        if len(s) == 1:
            bounce[first[2]] = bounce.get(first[2], 0) + 1
    got = {r["event_type"]: r for r in
           q_events_entry_exit(spark, SF).collect()}
    assert set(got) == set(entry) | set(exit_)
    for et, r in got.items():
        assert r["n_entry"] == entry.get(et, 0)
        assert r["n_exit"] == exit_.get(et, 0)
        assert r["n_bounce"] == bounce.get(et, 0)
        assert r["entry_ppm"] == entry.get(et, 0) * 10**6 // n_sessions
        assert r["exit_ppm"] == exit_.get(et, 0) * 10**6 // n_sessions
    # conservation: every session has exactly one entry and one exit
    assert sum(r["n_entry"] for r in got.values()) == n_sessions
    assert sum(r["n_exit"] for r in got.values()) == n_sessions


def test_redirect_loops_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    edges = set()
    for k in keys:
        s = f"u{k % 300}"
        if k % 7 == 0:
            d = f"u{(k + 150) % 300}"
        elif k % 11 == 0:
            d = f"u{(k * 3 + 1) % 300}"
        else:
            d = f"u{(k % 300) % 20}"
        if s != d:
            edges.add((s, d))
    want = set()
    for s, d in edges:
        if (d, s) in edges and s < d:
            want.add((s, 2, f"{s},{d}"))
    for a, b in edges:
        for b2, c in edges:
            if b2 != b:
                continue
            if (c, a) in edges and a < b and a < c and b != c:
                want.add((a, 3, f"{a},{b},{c}"))
    got = {(r["loop_key"], r["loop_len"], r["members"]) for r in
           q_url_redirect_loops(spark, SF).collect()}
    assert got == want
    # injected cycles must actually be found
    assert any(l == 2 for _, l, _ in got)
    # each loop's members are distinct and keyed by the minimum
    for key, ln, members in got:
        ms = members.split(",")
        assert len(ms) == ln == len(set(ms))
        assert key == min(ms) == ms[0]
