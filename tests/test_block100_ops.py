"""Block-100 operators: bipartite projection, M/M/1 queue plan,
SPC control chart."""

from __future__ import annotations

import math

from genesis_spark.queries import (q_events_queueing_mm1,
                                   q_events_spc_control,
                                   q_graph_bipartite_projection)

import pytest

pytestmark = pytest.mark.block

SF = "/root/testdata/sf0.001"


def _trunc(num, den):
    # Spark DIV / DuckDB // truncate toward zero
    return abs(num) // den * (1 if num >= 0 else -1)


def test_bipartite_projection_golden(spark):
    rows = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .select("l_orderkey", "l_partkey").collect()
    edges = {(f"h{r['l_orderkey'] % 40}", r["l_partkey"] % 200)
             for r in rows}
    df = {}
    for _h, it in edges:
        df[it] = df.get(it, 0) + 1
    kept = [(h, it) for h, it in edges if df[it] <= 20]
    deg = {}
    for h, _it in kept:
        deg[h] = deg.get(h, 0) + 1
    items = {}
    for h, it in kept:
        items.setdefault(it, []).append(h)
    w = {}
    for hs in items.values():
        hs.sort()
        for i in range(len(hs)):
            for j in range(i + 1, len(hs)):
                w[(hs[i], hs[j])] = w.get((hs[i], hs[j]), 0) + 1
    expect = {k: v for k, v in w.items() if v >= 3}
    got = {(r["ha"], r["hb"]): r for r in
           q_graph_bipartite_projection(spark, SF).collect()}
    assert set(got) == set(expect)
    for (ha, hb), v in expect.items():
        r = got[(ha, hb)]
        assert r["weight"] == v
        assert (r["deg_a"], r["deg_b"]) == (deg[ha], deg[hb])
        assert r["overlap_milli"] == v * 1000 // min(deg[ha], deg[hb])
    # the df-cap dropped at least one hot item in this fixture
    assert any(v > 20 for v in df.values())
    assert expect


def test_queueing_mm1_golden(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet") \
        .select("event_type", "ts", "value").collect()
    per = {}
    for r in rows:
        sec = math.floor(r["ts"].timestamp())
        cv = r["value"] * 100
        c = max(math.floor(cv + 0.5) if cv >= 0
                else -math.floor(-cv + 0.5), 1)
        n, lo, hi, sv = per.get(r["event_type"],
                                (0, 10**18, -10**18, 0))
        per[r["event_type"]] = (n + 1, min(lo, sec), max(hi, sec),
                                sv + c)
    got = {r["event_type"]: r for r in
           q_events_queueing_mm1(spark, SF).collect()}
    assert set(got) == set(per)
    for t, (n, lo, hi, sv) in per.items():
        r = got[t]
        hz = max(hi - lo, 1)
        lam = max(n * 10**6 // hz, 1)
        rho = sv * 10**4 // hz
        assert (r["n_arrivals"], r["horizon_s"]) == (n, hz)
        assert r["lambda_micro"] == lam
        assert r["rho_ppm"] == rho
        if rho >= 10**6:
            assert r["saturated"] == 1
            assert r["lq_milli"] == r["wq_milli"] == -1
        else:
            lq = rho * rho // (1000 * (10**6 - rho))
            assert r["saturated"] == 0
            assert r["lq_milli"] == lq
            assert r["wq_milli"] == lq * 10**6 // lam
    # light-traffic fixture: nothing saturates, every queue priced
    assert all(r["saturated"] == 0 for r in got.values())


def test_spc_control_golden(spark):
    import datetime
    rows = spark.read.parquet(f"{SF}/events.parquet") \
        .select("event_type", "ts").collect()
    daily = {}
    for r in rows:
        d = (r["ts"].date() - datetime.date(1970, 1, 1)).days
        k = (r["event_type"], d)
        daily[k] = daily.get(k, 0) + 1
    types = {}
    for (t, d), y in daily.items():
        types.setdefault(t, []).append((d, y))
    got = {r["event_type"]: r for r in
           q_events_spc_control(spark, SF).collect()}
    assert set(got) == set(types)
    for t, pts in types.items():
        pts.sort()
        n = len(pts)
        s1 = sum(y for _d, y in pts)
        s2 = sum(y * y for _d, y in pts)
        mu = s1 / n
        sigma = math.sqrt((n * s2 - s1 * s1) / (n * n))
        zs = [0 if sigma == 0
              else math.floor(1000.0 * (y - mu) / sigma)
              for _d, y in pts]
        b3 = sum(z >= 3000 or z <= -3000 for z in zs)
        we2 = 0
        for i in range(n):
            win = zs[max(0, i - 2):i + 1]
            if (sum(z >= 2000 for z in win) >= 2
                    or sum(z <= -2000 for z in win) >= 2):
                we2 += 1
        r = got[t]
        assert r["n_days"] == n
        assert r["center_milli"] == math.floor(1000.0 * mu)
        assert r["sigma_milli"] == math.floor(1000.0 * sigma)
        assert (r["beyond_3s"], r["we2_windows"]) == (b3, we2)
        assert r["in_control"] == int(b3 == 0 and we2 == 0)
