"""Block-97 operators: truncation-loss audit, fast-flux detection,
data-repetition value curve."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math

from genesis_spark.queries import (q_corpus_repeat_value,
                                   q_corpus_truncation_loss,
                                   q_host_fast_flux)

SF = "/root/testdata/sf0.001"


def test_truncation_loss_golden(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("source", "text").collect()
    per = {}
    for r in docs:
        if r["text"] is None:
            continue
        n = len(r["text"].split(" "))
        lost = max(n - 96, 0)
        nd, nt, tok, tl, w = per.get(r["source"], (0, 0, 0, 0, 0))
        per[r["source"]] = (nd + 1, nt + (lost > 0), tok + n,
                            tl + lost, max(w, lost))
    got = {r["source"]: r for r in
           q_corpus_truncation_loss(spark, SF).collect()}
    assert set(got) == set(per)
    for s, (nd, nt, tok, tl, w) in per.items():
        r = got[s]
        assert (r["n_docs"], r["n_truncated"], r["tokens"],
                r["tokens_lost"], r["worst_doc_loss"]) == \
            (nd, nt, tok, tl, w)
        assert r["loss_ppm"] == tl * 10**6 // tok
    # both truncated and untouched docs exist at max_len 96
    assert any(r["n_truncated"] > 0 for r in got.values())
    assert any(r["n_truncated"] < r["n_docs"] for r in got.values())


def test_fast_flux_golden(spark):
    keys = {r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()}
    obs = set()
    for k in keys:
        h = k % 90
        day = (k // 90) % 5 if h % 9 == 0 else k % 28
        if h % 9 == 0:
            ip = f"10.{(k * 7) % 250}.{(k * 13) % 250}.1"
        else:
            ip = f"10.0.{h % 50}.{k % 3}"
        obs.add((f"h{h}", day, ip))
    first = {}
    days = {}
    for h, d, ip in obs:
        first[(h, ip)] = min(first.get((h, ip), d), d)
        days.setdefault(h, set()).add(d)
    per = {}
    for (h, ip), fd in first.items():
        ips, npd = per.get(h, (0, {}))
        npd[fd] = npd.get(fd, 0) + 1
        per[h] = (ips + 1, npd)
    got = {r["host_key"]: r for r in q_host_fast_flux(spark, SF).collect()}
    assert set(got) == set(per)
    for h, (n_ips, npd) in per.items():
        r = got[h]
        nd = len(days[h])
        assert r["n_ips"] == n_ips
        assert r["n_days"] == nd
        assert r["max_new_per_day"] == max(npd.values())
        rate = n_ips * 100 // nd
        assert r["ips_per_day_centi"] == rate
        assert r["is_flux"] == int(rate >= 300 and n_ips >= 10)
    # the rotating cohort is flagged, stable hosts are not
    assert any(r["is_flux"] for r in got.values())
    stable = [r for r in got.values() if r["n_ips"] <= 3]
    assert stable and all(r["is_flux"] == 0 for r in stable)


def test_repeat_value_curve_golden(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("source", "text").collect()
    per = {}
    for r in docs:
        if r["text"] is None:
            continue
        per[r["source"]] = per.get(r["source"], 0) + \
            len(r["text"].split(" "))
    got = {(r["source"], r["epochs"]): r for r in
           q_corpus_repeat_value(spark, SF).collect()}
    assert set(got) == {(s, e) for s in per for e in
                        (1, 2, 4, 8, 16, 32)}
    for (s, e), r in got.items():
        u = per[s]
        eff = round(u * 15.0 * (1.0 - math.exp(-e / 15.0)))
        assert r["unique_tokens"] == u
        assert r["raw_exposures"] == u * e
        assert r["effective_exposures"] == eff
        assert r["efficiency_ppm"] == eff * 10**6 // (u * e)
    # diminishing returns: efficiency strictly decreases with epochs
    for s in per:
        effs = [got[(s, e)]["efficiency_ppm"]
                for e in (1, 2, 4, 8, 16, 32)]
        assert effs == sorted(effs, reverse=True)
        assert effs[0] > 950000       # one epoch is nearly full value
        assert effs[-1] < 500000      # 32 epochs waste over half
