"""Block-93 operators: bounded Katz centrality, template mining,
host uptime SLA."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import re

from genesis_spark.queries import (q_graph_katz_bounded,
                                   q_host_uptime_sla,
                                   q_text_template_mine)

SF = "/root/testdata/sf0.001"


def test_katz_bounded_golden(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet") \
        .select("o_orderkey", "o_custkey").collect()
    edges = set()
    for r in orders:
        u = f"t{r['o_orderkey'] % 30}"
        v = f"t{(r['o_custkey'] % 30) % 20}"
        if u != v:
            edges.add((min(u, v), max(u, v)))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = {r["host_key"]: r for r in q_graph_katz_bounded(spark, SF).collect()}
    assert set(got) == set(adj)
    for v, ns in adj.items():
        d = len(ns)
        snd = sum(len(adj[u]) for u in ns)
        r = got[v]
        assert (r["deg"], r["sum_nbr_deg"]) == (d, snd)
        assert r["katz_milli"] == d * 1000 + 250 * snd
    # Katz with positive attenuation dominates degree alone: the hub
    # ordering can differ from raw degree only via neighbor quality
    assert all(r["katz_milli"] > r["deg"] * 1000 for r in got.values())


def test_template_mine_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    lines = []
    for k in keys:
        if k % 4 == 0:
            lines.append(f"fetch {k} took {k % 900} ms")
        elif k % 4 == 1:
            lines.append(f"retry {k % 5} for host h{k % 120}")
        elif k % 4 == 2:
            lines.append(f"parsed {k % 60} links depth {k % 3}")
        else:
            lines.append("politeness sleep done")
    per = {}
    for ln in lines:
        tpl = re.sub(r"[0-9]+", "<N>", ln)
        n, variants = per.get(tpl, (0, set()))
        variants.add(ln)
        per[tpl] = (n + 1, variants)
    got = {r["template"]: r for r in q_text_template_mine(spark, SF).collect()}
    assert set(got) == set(per)
    for tpl, (n, variants) in per.items():
        r = got[tpl]
        assert r["n_instances"] == n
        assert r["n_variants"] == len(variants)
        assert r["n_slots"] == tpl.count("<N>")
        assert r["template_class"] == \
            ("static" if len(variants) == 1 else "parametric")
    # exactly 4 templates, one static, three parametric
    assert len(got) == 4
    assert sum(r["template_class"] == "static"
               for r in got.values()) == 1


def test_uptime_sla_golden(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "ts", "event_type").collect()
    hd = {}
    for r in ev:
        h = r["user_id"] % 20
        d = int(r["ts"].timestamp()) // 86400
        n, e = hd.get((h, d), (0, 0))
        hd[(h, d)] = (n + 1, e + (r["event_type"] == "error"))
    per = {}
    for (h, _), (n, e) in hd.items():
        days, down = per.get(h, (0, 0))
        per[h] = (days + 1, down + (e * 2 > n))
    got = {r["host_id"]: r for r in q_host_uptime_sla(spark, SF).collect()}
    assert set(got) == set(per)
    for h, (days, down) in per.items():
        r = got[h]
        assert (r["n_days"], r["down_days"]) == (days, down)
        up = (days - down) * 10**6 // days
        assert r["uptime_ppm"] == up
        tier = ("meets-99.9" if up >= 999000 else
                "meets-99" if up >= 990000 else
                "meets-95" if up >= 950000 else "breach")
        assert r["sla_tier"] == tier
        credit = {"meets-99.9": 0, "meets-99": 10,
                  "meets-95": 25, "breach": 100}[tier]
        assert r["credit_pct"] == credit
    # ~1/6 error share rarely exceeds 50% on a full day: most hosts
    # meet some tier; the ladder itself must be exercised
    assert len({r["sla_tier"] for r in got.values()}) >= 1
