"""Block-56 operators: Adamic-Adar link prediction, Kaplan-Meier
repurchase survival, HTTP cache-header freshness rules."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math
from collections import Counter, defaultdict

import duckdb

from genesis_spark.queries import (_AA_UNITS, q_events_survival,
                                   q_graph_adamic_adar,
                                   q_http_cache_headers)

SF = "/root/testdata/sf0.001"


def test_adamic_adar_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey % 200, o_custkey % 200 "
        f"FROM '{SF}/orders.parquet'").fetchall()
    und = set()
    for i, j in rows:
        if i != j and (i * 7 + j) % 13 == 0:
            und.add((f"g{i}", f"g{j}"))
            und.add((f"g{j}", f"g{i}"))
    nbrs = defaultdict(set)
    for s, d in und:
        nbrs[s].add(d)
    score = Counter()
    for w, ns in nbrs.items():
        assert 1 <= len(ns) <= len(_AA_UNITS)
        for u in ns:
            for v in ns:
                if u < v:
                    # element_at / DuckDB [i] are 1-based over _AA_UNITS
                    score[(u, v)] += _AA_UNITS[len(ns) - 1]
    cand = [(u, v, s) for (u, v), s in score.items()
            if (u, v) not in und]
    cand.sort(key=lambda t: (-t[2], t[0], t[1]))
    expect = [(u, v, s, r + 1) for r, (u, v, s) in enumerate(cand[:20])]
    got = [(r["u"], r["v"], r["score_units"], r["rank"])
           for r in q_graph_adamic_adar(spark, SF).collect()]
    got.sort(key=lambda t: t[3])
    assert got == expect
    # predictions are genuinely non-edges with at least one wedge
    assert all(s > 0 for _, _, s, _ in got)


def test_survival_km_python_replay(spark):
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, event_id, ts, CAST(ts AS DATE) "
        f"FROM '{SF}/events.parquet' WHERE event_type = 'purchase' "
        f"ORDER BY user_id, ts, event_id").fetchall()
    gmax_date = max(r[3] for r in ev)
    by_user = defaultdict(list)
    for uid, eid, ts, d in ev:
        by_user[uid].append(d)
    subjects = []  # (gap_d, observed)
    for ds in by_user.values():
        for a, b in zip(ds, ds[1:]):
            subjects.append(((b - a).days, 1))
        subjects.append(((gmax_date - ds[-1]).days, 0))
    census = defaultdict(lambda: [0, 0])
    for g, obs in subjects:
        census[g][0] += 1
        census[g][1] += obs
    total = len(subjects)
    removed = 0
    cum_lnq = 0
    expect = []
    for g in sorted(census):
        n_all, d = census[g]
        n_risk = total - removed
        removed += n_all
        if d == 0:
            continue
        if n_risk == d:
            expect.append((g, n_risk, d, 0))
            continue
        cum_lnq += round(math.log((n_risk - d) / n_risk) * 1e9)
        srv = math.floor(math.exp(cum_lnq / 1e9) * 1e6 + 0.5)
        expect.append((g, n_risk, d, srv))
    got = sorted((r["gap_d"], r["n_risk"], r["n_deaths"],
                  r["survival_ppm"])
                 for r in q_events_survival(spark, SF).collect())
    assert got == expect
    # the product-limit estimate is monotone non-increasing
    survs = [s for *_, s in got]
    assert all(a >= b for a, b in zip(survs, survs[1:]))
    assert survs[0] < 1_000_000  # first step already loses mass


def test_cache_header_rules(spark):
    rows = {r["req_id"]: r
            for r in q_http_cache_headers(spark, SF).collect()}
    for k, r in rows.items():
        v = k % 6
        if v == 1:  # no-store: not cacheable at all
            assert (r["cacheable"], r["must_revalidate"]) == (0, 1)
            assert r["private_ttl_s"] == r["shared_ttl_s"] == 0
        elif v == 3:  # no-cache: stored but always revalidated
            assert (r["cacheable"], r["must_revalidate"]) == (1, 1)
            assert r["private_ttl_s"] == r["shared_ttl_s"] == 0
        elif v == 2:  # private: shared caches get nothing
            assert r["shared_ttl_s"] == 0
            assert r["private_ttl_s"] == 120
        elif v == 4:  # s-maxage overrides max-age for shared; Age=30
            assert r["shared_ttl_s"] == max((k % 4) * 450 - 30, 0)
            assert r["private_ttl_s"] == max(60 - 30, 0)
        elif v == 0:  # plain max-age minus Age, floored at 0
            want = max((k % 7) * 600 - (k % 3) * 150, 0)
            assert r["private_ttl_s"] == r["shared_ttl_s"] == want
        else:  # no cache headers: heuristic zero freshness
            assert (r["cacheable"], r["must_revalidate"]) == (1, 0)
            assert r["private_ttl_s"] == r["shared_ttl_s"] == 0
