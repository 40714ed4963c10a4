"""Unit tests for the round-3 block-25 rows: scheduler fairness Gini and
consistent-hash reshard churn."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from genesis_spark import queries as Q


def test_gini_bounds_and_uniform_case(spark, tmp_path):
    """A perfectly uniform backlog has Gini 0 (up to the exact-formula
    (n-1)/n correction term being 0 for equal x); the fixture value must
    lie in [0, 1)."""
    # uniform: hosts h1..h4 (keys 1,2,4,5 mod-3-filtered), one each ->
    # build 4 hosts x 3 urls uniformly: keys chosen so k%3 != 0
    keys = [50 + h + 200 * r for h in (1, 2, 4, 5) for r in range(3)]
    keys = [k for k in keys if k % 3 != 0]
    df = spark.createDataFrame([(k,) for k in keys], "o_orderkey long")
    out = str(tmp_path / "u")
    df.coalesce(1).write.parquet(f"{out}/orders.parquet")
    r = Q.q_frontier_host_fairness(spark, out).collect()[0]
    assert r["total_backlog"] == len(keys)
    assert 0.0 <= r["gini"] < 1.0

    real = Q.q_frontier_host_fairness(
        spark, "/root/testdata/sf0.001").collect()[0]
    assert 0.0 <= real["gini"] < 1.0


def test_hrw_rebalance_moves_one_over_n_plus_1(spark):
    rows = {r["strategy"]: r for r in
            Q.q_url_shard_rebalance(
                spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {"mod", "hrw"}
    # HRW: only keys won by the 17th shard move (~1/17 = 5.9%)
    assert 0.03 <= rows["hrw"]["moved_pct"] <= 0.09
    # mod-N: nearly everything moves (~16/17)
    assert rows["mod"]["moved_pct"] >= 0.85
    assert rows["mod"]["n_urls"] == rows["hrw"]["n_urls"]
