"""Block-155 operators: crawl-ledger reconciliation, HLS parsing, URI
template expansion."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_frontier_ledger_audit,
                                   q_media_hls_parse,
                                   q_url_template_expand)

SF = "/root/testdata/sf0.001"


def test_ledger_audit_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    cells = defaultdict(Counter)
    for k in ks:
        cell = (k % 40, (k // 40) % 5)
        o = ("fetched" if k % 10 < 6 else "failed" if k % 10 < 8
             else "deduped" if k % 10 == 8 else "pending")
        cells[cell][o] += 1
    got = {(r.host, r.round): r for r in
           q_frontier_ledger_audit(spark, SF).collect()}
    assert set(got) == {(f"h{h}", rd) for h, rd in cells}
    lost = 0
    for (h, rd), c in cells.items():
        r = got[(f"h{h}", rd)]
        n = sum(c.values())
        leak = 2 if (h + rd) % 17 == 0 else 0
        assert r.n_reported == n + leak
        assert (r.n_fetched, r.n_failed, r.n_deduped, r.n_pending) \
            == (c["fetched"], c["failed"], c["deduped"], c["pending"])
        assert r.imbalance == leak
        assert r.urls_lost == int(leak > 0)
        lost += r.urls_lost
    # the audit finds the planted losses and nothing else
    assert lost == sum(1 for (h, rd) in cells if (h + rd) % 17 == 0)
    assert 0 < lost < len(cells)


def test_hls_parse_replay(spark):
    ks = [r.c_custkey for r in
          spark.read.parquet(f"{SF}/customer.parquet")
          .select("c_custkey").collect()]
    got = {r.stream: r for r in q_media_hls_parse(spark, SF).collect()}
    for k in ks:
        nv = 3 + k % 3
        bws = [800000 * (v + 1) + k % 1000 for v in range(nv)]
        res = [f"{640 * (v + 1)}x{360 * (v + 1)}" for v in range(nv)]
        under = [i for i, b in enumerate(bws) if b <= 3_000_000]
        r = got[f"s{k}"]
        assert r.n_variants == nv
        assert (r.min_bw, r.max_bw) == (bws[0], bws[-1])
        assert r.ladder_ok == 1  # fixture ladders are increasing
        want = res[max(under)] if under else "none"
        assert r.best_res_under_3mbps == want, k
    # the budget really truncates tall ladders (5 variants > 2Mbps*5)
    assert any(got[f"s{k}"].best_res_under_3mbps != ""
               and int(got[f"s{k}"].max_bw) > 3_000_000
               for k in ks if 3 + k % 3 >= 5)


def test_template_expand_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    got = {r.rid: r for r in q_url_template_expand(spark, SF).collect()}
    for k in ks:
        r = got[k]
        if k % 4 == 0:
            assert (r.expanded, r.n_vars, r.n_unresolved,
                    r.complete) == (f"/users/{k}", 1, 0, 1)
        elif k % 4 == 1:
            assert r.expanded == f"/repos/org{k % 10}/proj{k % 7}"
            assert (r.n_vars, r.n_unresolved, r.complete) == (2, 0, 1)
        elif k % 4 == 2:
            assert (r.expanded, r.n_vars, r.n_unresolved,
                    r.complete) == ("/search?q={q}", 1, 1, 0)
        else:
            assert (r.expanded, r.n_vars, r.n_unresolved,
                    r.complete) == ("/static/logo.png", 0, 0, 1)
    # unbound variables are detected, never silently fetched
    assert any(r.complete == 0 for r in got.values())
