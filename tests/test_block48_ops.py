"""Block-48 operators: SCC, DNS cache planning, fetch backoff."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import duckdb

from genesis_spark.queries import (q_dns_cache_plan, q_fetch_backoff_plan,
                                   q_graph_scc)

SF = "/root/testdata/sf0.001"


def test_scc_structure_is_exact(spark):
    """The synthetic graph has one 20-SCC, four 5-SCCs, and singleton
    feeders; SCC membership must come out exactly."""
    rows = {r["host_key"]: (r["scc_id"], r["scc_size"], r["on_cycle"])
            for r in q_graph_scc(spark, SF).collect()}
    # which node ids appear depends on o_orderkey % 60 coverage; at any
    # SF >= 0.001 all 60 residues are hit
    assert len(rows) == 60
    big = {f"g{i}" for i in range(20)}
    assert {rows[n][0] for n in big} == {"g0"}  # min label of the cycle
    assert all(rows[n][1] == 20 and rows[n][2] for n in big)
    for n in range(20, 40):
        assert rows[f"g{n}"] == (f"g{n}", 1, False)  # feeder singletons
    for base in (40, 45, 50, 55):
        group = {f"g{base + j}" for j in range(5)}
        labels = {rows[n][0] for n in group}
        assert labels == {f"g{base}"}
        assert all(rows[n][1] == 5 and rows[n][2] for n in group)


def test_dns_cache_plan_matches_python_replay(spark):
    con = duckdb.connect()
    hosts = con.execute(
        f"SELECT o_custkey % 200 AS h, count(*) FROM "
        f"'{SF}/orders.parquet' GROUP BY h").fetchall()
    now = 1_700_000_000
    want = {}
    for h, n_urls in hosts:
        if h % 3 == 0:
            klass = "miss"
        elif now > (now - 300 - (h * 7) % 900) + 600:
            klass = "expired"
        else:
            klass = "fresh"
        shard = h % 16
        cur = want.setdefault(shard, [0, 0, 0, 0, 0])
        cur[0] += 1
        cur[1] += klass == "miss"
        cur[2] += klass == "expired"
        cur[3] += klass == "fresh"
        cur[4] += n_urls if klass != "fresh" else 0
    got = {r["resolver_shard"]:
           [r["n_hosts"], r["n_miss"], r["n_expired"], r["n_fresh"],
            r["n_urls_blocked"]]
           for r in q_dns_cache_plan(spark, SF).collect()}
    assert got == want
    # all three classes exist by construction
    assert sum(v[1] for v in got.values()) > 0
    assert sum(v[2] for v in got.values()) > 0
    assert sum(v[3] for v in got.values()) > 0


def test_fetch_backoff_matches_python_replay(spark):
    con = duckdb.connect()
    att = con.execute(
        f"SELECT l_orderkey, l_linenumber FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    ledger = {}
    for lk, ln in att:
        ledger.setdefault(lk % 40, []).append(
            (1_700_000_000 + lk * 7 + ln,
             200 if (lk + ln) % (lk % 9 + 2) == 0 else 503))
    want = {}
    for h, rows in ledger.items():
        ok = [ts for ts, st in rows if st == 200]
        last_ok = max(ok) if ok else None
        consec = sum(1 for ts, _ in rows
                     if last_ok is None or ts > last_ok)
        backoff = min(30 * (1 << min(consec, 20)), 3600)
        want[f"h{h}"] = (len(rows), max(ts for ts, _ in rows),
                         sum(1 for _, st in rows if st != 200),
                         consec, backoff,
                         max(ts for ts, _ in rows) + backoff,
                         consec >= 6)
    got = {r["host_key"]: (r["n_attempts"], None, r["n_failures"],
                           r["consec_failures"], r["backoff_s"],
                           r["next_allowed_at"], r["quarantined"])
           for r in q_fetch_backoff_plan(spark, SF).collect()}
    assert set(got) == set(want)
    for h, w in want.items():
        g = got[h]
        assert (g[0], g[2], g[3], g[4], g[5], g[6]) == \
            (w[0], w[2], w[3], w[4], w[5], w[6]), h
    # both quarantined and healthy hosts exist
    assert any(v[6] for v in got.values())
    assert not all(v[6] for v in got.values())
