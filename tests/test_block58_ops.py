"""Block-58 operators: calibration/ECE table, change-point detection,
Wilson lower-bound host ranking."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math
from collections import defaultdict

import duckdb

from genesis_spark.queries import (q_events_changepoint,
                                   q_host_wilson_rank,
                                   q_text_calibration_ece)

SF = "/root/testdata/sf0.001"


def test_calibration_table_properties(spark):
    rows = q_text_calibration_ece(spark, SF).collect()
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM '{SF}/documents.parquet' "
        f"WHERE text IS NOT NULL").fetchone()[0]
    assert sum(r["n"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["bin"] <= 9
        lo = r["bin"] * 100_000
        hi = 1_000_000 if r["bin"] == 9 else (r["bin"] + 1) * 100_000
        assert lo <= r["mean_conf_ppm"] < hi or (
            r["bin"] == 9 and r["mean_conf_ppm"] == 1_000_000)
        assert 0 <= r["acc_ppm"] <= 1_000_000
        assert r["gap_ppm"] == abs(r["mean_conf_ppm"] - r["acc_ppm"])


def test_changepoint_matches_python_replay(spark):
    con = duckdb.connect()
    daily = con.execute(
        f"SELECT event_type, CAST(ts AS DATE) AS day, count(*) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2 "
        f"ORDER BY 1, 2").fetchall()
    series = defaultdict(list)
    for et, day, c in daily:
        series[et].append((day, c))
    expect = {}
    for et, pts in series.items():
        n = len(pts)
        total = sum(c for _, c in pts)
        st = 0
        best = None
        for t, (day, c) in enumerate(pts, start=1):
            st += c
            if t >= n:
                break
            stat = abs(st * (n - t) - (total - st) * t) * 1_000_000 \
                // (t * (n - t))
            key = (-stat, day)
            if best is None or key < best[0]:
                best = (key, (day, stat, st, total - st, n))
        expect[et] = best[1]
    got = {r["event_type"]: (r["split_day"], r["stat_ppm"],
                             r["left_sum"], r["right_sum"], r["n_days"])
           for r in q_events_changepoint(spark, SF).collect()}
    assert got == expect


def test_wilson_rank_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, o_custkey "
        f"FROM '{SF}/orders.parquet'").fetchall()
    agg = defaultdict(lambda: [0, 0])
    for k, c in rows:
        a = agg[f"h{c % 40}"]
        a[0] += 1
        a[1] += 1 if (k * 13 + c * 7) % (11 + c % 17) != 0 else 0
    scored = []
    for host, (n, s) in agg.items():
        p = s / n
        z2 = 1.96 * 1.96
        lb = (p + z2 / (2 * n)
              - 1.96 * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))) \
            / (1 + z2 / n)
        scored.append((host, n, s, math.floor(lb * 1e6 + 0.5)))
    scored.sort(key=lambda t: (-t[3], t[0]))
    expect = [(h, n, s, w, r + 1)
              for r, (h, n, s, w) in enumerate(scored)]
    got = sorted(((r["host"], r["n"], r["s"], r["wilson_ppm"], r["rank"])
                  for r in q_host_wilson_rank(spark, SF).collect()),
                 key=lambda t: t[4])
    assert got == expect
    # the lower bound sits strictly below the point estimate
    for h, n, s, w, _ in got:
        assert 0 <= w < s * 1_000_000 // n or s == 0
