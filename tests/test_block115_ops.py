"""Block-115 operators: gaps-and-islands activity streaks,
path-depth budget histogram, co-failure correlation."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from collections import defaultdict
from datetime import date

from genesis_spark.queries import (q_events_streaks, q_host_cofailure,
                                   q_url_path_depth)

SF = "/root/testdata/sf0.001"


def test_streaks_golden(spark):
    days = defaultdict(set)
    for r in spark.read.parquet(f"{SF}/events.parquet") \
            .select("user_id", "ts").collect():
        days[r["user_id"]].add(
            (r["ts"].date() - date(2024, 1, 1)).days)
    got = {r["user_id"]: r for r in q_events_streaks(spark, SF).collect()}
    assert set(got) == set(days)
    for u, ds in days.items():
        sd = sorted(ds)
        runs = []
        start = prev = sd[0]
        for d in sd[1:]:
            if d == prev + 1:
                prev = d
            else:
                runs.append((prev - start + 1, start))
                start = prev = d
        runs.append((prev - start + 1, start))
        best = max(runs, key=lambda x: (x[0], -x[1]))
        r = got[u]
        assert r["active_days"] == len(ds)
        assert r["n_streaks"] == len(runs)
        assert r["longest_streak"] == best[0]
        assert r["longest_start_day"] == best[1]
        # streak lengths partition the active days exactly
        assert sum(l for l, _s in runs) == len(ds)


def test_path_depth_golden(spark):
    cens = defaultdict(int)
    for r in spark.read.parquet(f"{SF}/orders.parquet") \
            .select("o_orderkey").collect():
        k = r["o_orderkey"]
        cens[min(k % 9, (k // 9) % 5)] += 1
    total = sum(cens.values())
    got = {r["depth"]: r for r in q_url_path_depth(spark, SF).collect()}
    assert set(got) == set(cens)
    cum = 0
    prev_ppm = 0
    cap_depths = []
    for d in sorted(cens):
        cum += cens[d]
        ppm = cum * 10**6 // total
        r = got[d]
        assert r["n_urls"] == cens[d]
        assert r["cum_urls"] == cum
        assert r["cum_ppm"] == ppm
        exp_cap = int(ppm >= 950000 and prev_ppm < 950000)
        assert r["is_recommended_cap"] == exp_cap
        if exp_cap:
            cap_depths.append(d)
        prev_ppm = ppm
    # exactly one recommended cap, and it covers >= 95%
    assert len(cap_depths) == 1
    assert got[cap_depths[0]]["cum_ppm"] >= 950000


def test_cofailure_golden(spark):
    fails = defaultdict(set)
    for r in spark.read.parquet(f"{SF}/orders.parquet") \
            .select("o_orderkey").collect():
        k = r["o_orderkey"]
        h = k % 36
        if not (h % 6 == 2 or k % 5 == 0):
            continue
        w = (k % 21) - (k % 21) % 7 if h % 6 == 2 else (k * 13) % 21
        fails[f"h{h}"].add(w)
    got = {(r["host_a"], r["host_b"]): r for r in
           q_host_cofailure(spark, SF).collect()}
    hosts = sorted(fails)
    exp = {}
    for i, a in enumerate(hosts):
        for b in hosts[i + 1:]:
            co = len(fails[a] & fails[b])
            if co:
                exp[(a, b)] = co
    assert set(got) == set(exp)
    cluster = {h for h in fails if int(h[1:]) % 6 == 2}
    for (a, b), co in exp.items():
        r = got[(a, b)]
        assert (r["n_a"], r["n_b"]) == (len(fails[a]), len(fails[b]))
        assert r["n_co"] == co
        jac = co * 10**6 // (len(fails[a]) + len(fails[b]) - co)
        assert r["jaccard_ppm"] == jac
        assert r["correlated"] == int(jac >= 500000 and co >= 3)
    # every cluster pair is flagged as correlated
    cl = sorted(cluster)
    for i, a in enumerate(cl):
        for b in cl[i + 1:]:
            assert got[(a, b)]["correlated"] == 1, (a, b)
