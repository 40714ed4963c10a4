"""Block-88 operators: cohort LTV triangle, Simpson's-paradox audit,
host vertical mix."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_events_ltv_triangle,
                                   q_events_simpson_audit,
                                   q_host_vertical_mix)

SF = "/root/testdata/sf0.001"


def test_ltv_triangle_golden(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "ts", "value").collect()
    rows = [(r["user_id"], int(r["ts"].timestamp()) // 604800,
             int(round(r["value"] * 100))) for r in ev]
    first = {}
    for u, w, _ in rows:
        first[u] = min(first.get(u, w), w)
    size = {}
    for u, cw in first.items():
        size[cw] = size.get(cw, 0) + 1
    cells = {}
    for u, w, c in rows:
        key = (first[u], w - first[u])
        cells[key] = cells.get(key, 0) + c
    got = {(r["cohort_week"], r["age"]): r for r in
           q_events_ltv_triangle(spark, SF).collect()}
    assert set(got) == set(cells)
    for (cw, age), spend in cells.items():
        cum = sum(v for (c2, a2), v in cells.items()
                  if c2 == cw and a2 <= age)
        r = got[(cw, age)]
        assert r["cohort_size"] == size[cw]
        assert r["spend"] == spend
        assert r["cum_spend"] == cum
        assert r["ltv_centicents"] == cum * 100 // size[cw]
    # LTV is monotone in age within a cohort
    for cw in size:
        ages = sorted(a for (c2, a) in cells if c2 == cw)
        ltvs = [got[(cw, a)]["ltv_centicents"] for a in ages]
        assert ltvs == sorted(ltvs)


def test_simpson_audit_golden(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "event_type").collect()
    pu = {}
    for r in ev:
        n, c = pu.get(r["user_id"], (0, 0))
        pu[r["user_id"]] = (n + 1, c + (r["event_type"] == "purchase"))
    cells = {}
    for u, (n, c) in pu.items():
        seg = "heavy" if n >= 70 else "mid" if n >= 40 else "light"
        arm = u % 2
        uu, ee, cc = cells.get((seg, arm), (0, 0, 0))
        cells[(seg, arm)] = (uu + 1, ee + n, cc + c)
    segs = sorted({s for s, _ in cells})
    segs = [s for s in segs if (s, 0) in cells and (s, 1) in cells]
    got = {r["segment"]: r for r in
           q_events_simpson_audit(spark, SF).collect()}
    assert set(got) == set(segs)
    winners = {}
    for s in segs:
        ua, ea, ca = cells[(s, 0)]
        ub, eb, cb = cells[(s, 1)]
        r = got[s]
        assert (r["users_a"], r["ev_a"], r["conv_a"]) == (ua, ea, ca)
        assert (r["users_b"], r["ev_b"], r["conv_b"]) == (ub, eb, cb)
        assert r["rate_a_ppm"] == ca * 10**6 // ea
        assert r["rate_b_ppm"] == cb * 10**6 // eb
        w = "a" if ca * eb > cb * ea else "b" if ca * eb < cb * ea \
            else "tie"
        assert r["seg_winner"] == w
        winners[s] = w
    ca = sum(cells[(s, 0)][2] for s in segs)
    ea = sum(cells[(s, 0)][1] for s in segs)
    cb = sum(cells[(s, 1)][2] for s in segs)
    eb = sum(cells[(s, 1)][1] for s in segs)
    aw = "a" if ca * eb > cb * ea else "b" if ca * eb < cb * ea \
        else "tie"
    par = int((aw == "a" and all(w == "b" for w in winners.values()))
              or (aw == "b" and all(w == "a" for w in winners.values())))
    for r in got.values():
        assert r["agg_winner"] == aw
        assert r["is_paradox"] == par


def test_vertical_mix_router_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    per = {}
    for k in keys:
        hm = k % 80
        if hm % 4 == 0:
            v = "shop"
        elif hm % 4 == 1:
            v = "reference"
        elif hm % 4 == 2:
            v = "ugc"
        else:
            v = ("shop" if k % 3 == 0
                 else "reference" if k % 3 == 1 else "editorial")
        per.setdefault(f"h{hm}", []).append(v)
    got = {r["host_key"]: r for r in q_host_vertical_mix(spark, SF).collect()}
    assert set(got) == set(per)
    doms = set()
    for h, vs in per.items():
        r = got[h]
        n = len(vs)
        counts = {c: vs.count(c) for c in
                  ("shop", "reference", "ugc", "editorial")}
        assert r["n_urls"] == n
        assert (r["n_shop"], r["n_reference"], r["n_ugc"],
                r["n_editorial"]) == (counts["shop"],
                                      counts["reference"], counts["ugc"],
                                      counts["editorial"])
        top = max(counts.values())
        if top * 2 <= n:
            dom = "mixed"
        elif counts["shop"] == top:
            dom = "shop"
        elif counts["reference"] == top:
            dom = "reference"
        elif counts["ugc"] == top:
            dom = "ugc"
        else:
            dom = "editorial"
        assert r["dominant"] == dom
        assert r["top_share_ppm"] == top * 10**6 // n
        doms.add(dom)
    # pure hosts AND genuinely mixed hosts both classified
    assert {"shop", "reference", "ugc", "mixed"} <= doms
