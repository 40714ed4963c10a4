"""Block-99 operators: Pareto-front skyline, Herfindahl concentration,
Theil-Sen robust trend."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math

from genesis_spark.queries import (q_events_hhi, q_events_pareto_front,
                                   q_events_theil_sen)

SF = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").collect()


def test_pareto_front_golden(spark):
    per = {}
    for r in _events(spark):
        x, y = per.get(r["user_id"], (0, 0))
        cv = r["value"] * 100
        c = math.floor(cv + 0.5) if cv >= 0 else -math.floor(-cv + 0.5)
        per[r["user_id"]] = (x + 1, y + c)
    sky = set()
    for u, (x, y) in per.items():
        dominated = any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for u2, (x2, y2) in per.items() if u2 != u)
        if not dominated:
            sky.add(u)
    got = {r["user_id"]: r for r in
           q_events_pareto_front(spark, SF).collect()}
    assert set(got) == sky
    for u in sky:
        assert (got[u]["n_events"], got[u]["value_centi"]) == per[u]
    # the front is a strict antichain: distinct x values, y decreasing in x
    pts = sorted((got[u]["n_events"], got[u]["value_centi"]) for u in got)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    assert all(b > a for a, b in zip(ys[1:], ys)) or len(pts) == 1
    assert 1 <= len(sky) < len(per)
    assert len(xs) == len(set(xs)) or any(
        per[u] == per[v] for u in sky for v in sky if u != v)


def test_hhi_golden(spark):
    per = {}
    for r in _events(spark):
        k = (r["event_type"], r["user_id"])
        per[k] = per.get(k, 0) + 1
    types = {}
    for (t, _u), n in per.items():
        nu, ne, sq, top = types.get(t, (0, 0, 0, 0))
        types[t] = (nu + 1, ne + n, sq + n * n, max(top, n))
    got = {r["event_type"]: r for r in q_events_hhi(spark, SF).collect()}
    assert set(got) == set(types)
    for t, (nu, ne, sq, top) in types.items():
        r = got[t]
        hhi = sq * 10**6 // (ne * ne)
        assert (r["n_users"], r["n_events"]) == (nu, ne)
        assert r["hhi_ppm"] == hhi
        assert r["effective_users_centi"] == ne * ne * 100 // sq
        assert r["top1_share_ppm"] == top * 10**6 // ne
        assert r["doj_band"] == (0 if hhi < 150000 else
                                 1 if hhi < 250000 else 2)
        # inverse-HHI is bounded by the user count
        assert r["effective_users_centi"] <= nu * 100
        # uniform lower bound: HHI >= 1/n_users
        assert hhi >= 10**6 // nu


def test_theil_sen_golden(spark):
    daily = {}
    for r in _events(spark):
        d = (r["ts"].date() - __import__("datetime").date(1970, 1, 1)).days
        k = (r["event_type"], d)
        daily[k] = daily.get(k, 0) + 1
    types = {}
    for (t, d), y in daily.items():
        types.setdefault(t, []).append((d, y))
    got = {r["event_type"]: r for r in q_events_theil_sen(spark, SF).collect()}
    assert set(got) == set(types)
    for t, pts in types.items():
        pts.sort()
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                (di, yi), (dj, yj) = pts[i], pts[j]
                num = (yj - yi) * 1000
                den = dj - di
                # Spark DIV / DuckDB // truncate toward zero
                slopes.append(abs(num) // den * (1 if num >= 0 else -1))
        slopes.sort()
        n = len(slopes)
        picks = {slopes[(n + 1) // 2 - 1], slopes[n // 2]}
        med = math.floor(sum(picks) / len(picks))
        r = got[t]
        assert r["n_days"] == len(pts)
        assert r["n_pairs"] == n
        assert r["ts_slope_milli"] == med
        assert r["drift"] == (1 if med >= 50 else -1 if med <= -50 else 0)
