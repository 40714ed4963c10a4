"""Block-140 operators: MAD outlier flags, Retry-After interpretation,
SURT canonical keys."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_events_mad_outliers,
                                   q_http_retry_after, q_url_surt_key)

SF = "/root/testdata/sf0.001"


def test_mad_outliers_replay(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("event_id", "event_type", "value").collect()
    by_type = defaultdict(list)
    for r in ev:
        by_type[r.event_type].append((int(round(r.value * 100)),
                                      r.event_id))
    med, mad = {}, {}
    for t, vs in by_type.items():
        n = len(vs)
        ordered = sorted(vs)
        med[t] = ordered[(n + 1) // 2 - 1][0]
        devs = sorted((abs(v - med[t]), eid) for v, eid in vs)
        mad[t] = devs[(n + 1) // 2 - 1][0]
    got = {r.event_id: r for r in
           q_events_mad_outliers(spark, SF).collect()}
    assert len(got) == len(ev)
    n_out = 0
    for r in ev:
        g = got[r.event_id]
        v = int(round(r.value * 100))
        t = r.event_type
        assert (g.v_cents, g.med_cents, g.mad_cents) == (
            v, med[t], mad[t]), r.event_id
        want = int(abs(v - med[t]) > 3 * mad[t])
        assert g.is_outlier == want
        n_out += want
    # flags exist but MAD is robust: a minority are outliers
    assert 0 < n_out < len(ev) // 4


def test_mad_robust_to_whale():
    # a single whale does not move the median pair
    vals = [100] * 20 + [10_000_000]
    n = len(vals)
    ordered = sorted(vals)
    m = ordered[(n + 1) // 2 - 1]
    assert m == 100
    devs = sorted(abs(v - m) for v in vals)
    assert devs[(n + 1) // 2 - 1] == 0


def test_retry_after_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    got = {r.rid: r for r in q_http_retry_after(spark, SF).collect()}
    kinds = set()
    for k in ks:
        r = got[k]
        if k % 4 == 0:
            want = min(300, 30 + k % 600)
            assert (r.kind, r.wait_s) == ("delta-seconds", want)
        elif k % 4 == 1:
            assert r.kind == "http-date"
            assert r.wait_s == min(300, k % 900)
            assert r.retry_after.startswith("Wed, 21 Oct 2015 07:")
            assert r.retry_after.endswith(" GMT")
        else:
            assert (r.kind, r.wait_s) == ("default", 60)
        kinds.add(r.kind)
    assert kinds == {"delta-seconds", "http-date", "default"}
    # the clamp actually engages on long deltas
    assert any(got[k].wait_s == 300 for k in ks if k % 4 == 0)


def test_surt_key_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    got = {r.rid: r for r in q_url_surt_key(spark, SF).collect()}
    for k in ks:
        site = f"site{k % 50}.example"
        host = ("a.b." + site if k % 7 == 0 else
                "www." + site if k % 3 == 0 else site)
        hnw = host[4:] if host.startswith("www.") else host
        path = f"/p{k % 20}/item{k}" + ("/" if k % 11 == 0 else "")
        surt = (",".join(reversed(hnw.split("."))) + ")"
                + path.rstrip("/"))
        r = got[k]
        assert r.surt == surt, (k, r.surt, surt)
        assert r.had_query == int(k % 5 == 0)


def test_surt_domain_contiguity():
    # the property SURT exists for: one registrable domain's pages
    # sort contiguously even across subdomains
    surts = sorted([
        "example,site1)/z",
        "example,site1,a)/p",
        "example,site1,b)/q",
        "example,site2)/a",
    ])
    prefix = "example,site1"
    in_dom = [s.startswith(prefix) for s in surts]
    first, last = in_dom.index(True), len(in_dom) - 1 - \
        in_dom[::-1].index(True)
    assert all(in_dom[first:last + 1])
