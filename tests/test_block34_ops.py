"""Block-34 operators: k-core peeling and the Bloom FPR-eval row."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib

import duckdb
import pyspark.sql.functions as F

from genesis_spark.operators.cc import kcore
from genesis_spark.queries import _BLOOM_EVAL_M, q_url_bloom_eval

SF = "/root/testdata/sf0.001"


def _sym(spark, edges):
    e = spark.createDataFrame(edges, "a string, b string")
    return (e.unionByName(e.select(F.col("b").alias("a"),
                                   F.col("a").alias("b")))
            .distinct())


def test_kcore_peels_pendants_keeps_clique(spark):
    """K5 plus a pendant chain at k=3: the chain peels, the clique
    survives with within-core degree exactly 4."""
    k5 = [(f"k{i}", f"k{j}") for i in range(5) for j in range(i + 1, 5)]
    chain = [("k0", "p1"), ("p1", "p2"), ("p2", "p3")]
    out = kcore(_sym(spark, k5 + chain), k=3, rounds=3).collect()
    got = {r["node"]: r["core_degree"] for r in out}
    assert got == {f"k{i}": 4 for i in range(5)}


def test_kcore_synchronous_rounds_peel_one_link_per_round(spark):
    """A path v-a-b-c hanging off K4 at k=2: round N's degrees are
    computed against round N-1's alive set, so the chain peels exactly
    one node per round — after 1 round only c is gone, after 3 the
    whole chain is."""
    k4 = [(f"v{i}", f"v{j}") for i in range(4) for j in range(i + 1, 4)]
    path = [("v0", "a"), ("a", "b"), ("b", "c")]
    sym = _sym(spark, k4 + path)
    alive1 = {r["node"] for r in kcore(sym, k=2, rounds=1).collect()}
    assert alive1 == {"v0", "v1", "v2", "v3", "a", "b"}
    alive3 = {r["node"] for r in kcore(sym, k=2, rounds=3).collect()}
    assert alive3 == {"v0", "v1", "v2", "v3"}


def _bloom_python_replay(sf_dir):
    """Pure-Python replay of the url_bloom_eval fixture: same synth,
    same md5-substring positions, exact expected counts."""
    con = duckdb.connect()
    cand = {f"http://u{k % 1000}.onion" for (k,) in con.execute(
        f"SELECT l_orderkey FROM '{sf_dir}/lineitem.parquet'").fetchall()}
    seen = {f"http://u{k % 300}.onion" for (k,) in con.execute(
        f"SELECT o_orderkey FROM '{sf_dir}/orders.parquet' "
        "WHERE o_orderkey % 3 = 0").fetchall()}

    def pos(url):
        h = hashlib.md5(url.encode()).hexdigest()
        return [int(h[8 * i:8 * i + 8], 16) % _BLOOM_EVAL_M
                for i in range(4)]

    bits = {p for u in seen for p in pos(u)}
    n_new = n_maybe = n_fp = n_fn = 0
    for u in cand:
        maybe = all(p in bits for p in pos(u))
        is_new = u not in seen
        n_new += is_new
        n_maybe += maybe
        n_fp += is_new and maybe
        n_fn += (not is_new) and (not maybe)
    return len(cand), n_new, n_maybe, n_fn, n_fp


def test_bloom_eval_matches_python_replay(spark):
    row = q_url_bloom_eval(spark, SF).collect()[0]
    n_cand, n_new, n_maybe, n_fn, n_fp = _bloom_python_replay(SF)
    assert row["n_candidates"] == n_cand
    assert row["n_new"] == n_new
    assert row["n_maybe"] == n_maybe
    assert row["n_false_pos"] == n_fp
    # The contract the engine prefilter path relies on, and a fixture
    # geometry that actually measures something:
    assert row["n_false_neg"] == n_fn == 0
    assert row["n_false_pos"] > 0
    assert row["fpr_ppm"] == n_fp * 1000000 // n_new
