"""Block-73 operators: composed URL normalizer, frontier admission
ensemble, priority aging."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_frontier_admission_ensemble,
                                   q_frontier_priority_decay,
                                   q_url_normalize_pipeline)

SF = "/root/testdata/sf0.001"


def test_url_pipeline_idempotent_and_stagewise(spark):
    rows = q_url_normalize_pipeline(spark, SF).collect()
    for r in rows:
        n = r["url_norm"]
        assert "/./" not in n and "/../" not in n
        assert "utm_" not in n and "ref=t" not in n.split("?")[-1]
        assert "%7e" not in n and "%7E" not in n  # unreserved decoded
        assert "%2f" not in n                     # reserved hex uppercased
        assert not n.endswith("/")
    # normalized URLs collapse aliases: raw forms are all distinct,
    # normalized space is no larger
    raws = {r["url_raw"] for r in rows}
    norms = {r["url_norm"] for r in rows}
    assert len(norms) <= len(raws)


def test_admission_ensemble_first_failing_reason(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    exp = {}
    for k in keys:
        m = k % 8
        if m == 0:
            v = "invalid_scheme"
        elif m == 1:
            v = "ssrf_internal"
        elif m == 2:
            v = "blocklisted"
        elif m == 3:
            v = "trap"
        elif m == 4 and (k % 9) % 2 == 0:
            v = "robots_disallowed"
        else:
            v = "admit"
        e = exp.setdefault(v, [0, 0])
        e[0] += 1
        e[1] += k
    got = {r["verdict"]: (r["n_urls"], r["id_checksum"]) for r in
           q_frontier_admission_ensemble(spark, SF).collect()}
    assert got == {v: tuple(e) for v, e in exp.items()}
    assert set(got) == {"invalid_scheme", "ssrf_internal", "blocklisted",
                        "trap", "robots_disallowed", "admit"}


def test_priority_decay_prevents_starvation(spark):
    rows = q_frontier_priority_decay(spark, SF).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
        assert r["eff_priority"] == r["base_priority"] + r["age"] * 5
        assert 1 <= r["rank"] <= 3
    for host, picks in by_host.items():
        assert len(picks) <= 3
        # the aging guarantee: a max-age URL (age 20, boost 100)
        # outranks any fresh URL regardless of base priority (<100)
        old = [p for p in picks if p["age"] == 20]
        for p in old:
            assert p["eff_priority"] >= 100
    # picks are the true per-host top-3 (spot-check one host by rank)
    for picks in by_host.values():
        ranked = sorted(picks, key=lambda p: (-p["eff_priority"],
                                              p["url_id"]))
        assert [p["rank"] for p in ranked] == list(range(1, len(picks) + 1))
