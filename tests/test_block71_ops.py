"""Block-71 operators: community conductance, LSH bucket fan-out audit,
IDN homograph detection."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from genesis_spark.operators import dedup as D
from genesis_spark.queries import (_corpus, q_dedup_lsh_bucket_audit,
                                   q_dedup_minhash_lsh, q_graph_conductance,
                                   q_graph_modularity, q_host_homograph)

SF = "/root/testdata/sf0.001"


def test_conductance_consistent_with_modularity_partition(spark):
    cond = {r["community"]: r for r in
            q_graph_conductance(spark, SF).collect()}
    mod = {r["community"]: r for r in
           q_graph_modularity(spark, SF).collect()}
    # same partition, same volumes (d_c == vol by definition)
    assert set(cond) == set(mod)
    two_m = sum(r["vol"] for r in cond.values())
    for c, r in cond.items():
        assert r["vol"] == mod[c]["d_c"]
        # internal endpoints + cut endpoints = community volume
        assert mod[c]["w_c"] + r["cut"] == r["vol"]
        denom = min(r["vol"], two_m - r["vol"])
        if denom == 0:
            assert r["conductance_ppm"] == -1
        else:
            assert r["conductance_ppm"] == r["cut"] * 10**6 // denom
            assert 0 <= r["conductance_ppm"] <= 10**6


def test_lsh_bucket_audit_bounds_actual_join(spark):
    audit = {r["band"]: r for r in
             q_dedup_lsh_bucket_audit(spark, SF).collect()}
    assert set(audit) == set(range(D.N_BANDS))
    n_docs = _corpus(spark, SF).filter("text IS NOT NULL").count()
    for r in audit.values():
        assert r["n_docs"] == n_docs
        assert r["n_singletons"] <= r["n_buckets"]
        assert r["max_bucket"] >= 1
        # singleton buckets contribute zero join cost
        assert r["join_cost"] >= r["max_bucket"] * (r["max_bucket"] - 1) // 2
    # the audited cost upper-bounds the candidate pairs the real join
    # produces (cands are deduped across bands, cost sums per band)
    pairs = q_dedup_minhash_lsh(spark, SF).count()
    assert pairs <= sum(r["join_cost"] for r in audit.values())


def test_homograph_detection(spark):
    rows = q_host_homograph(spark, SF).collect()
    assert rows
    for r in rows:
        lbl = r["host"].split(".")[0]
        assert any("Ѐ" <= ch <= "ӿ" for ch in lbl)  # cyrillic
        if r["mixed_script"]:
            assert any("a" <= ch <= "z" for ch in lbl)
        # a resolved victim must be the Latin brand the skeleton folds to
        if r["victim_host"] != "-":
            assert r["victim_host"].startswith("brand")
            assert r["victim_urls"] > 0
        else:
            # unresolved = skeleton absent from the census (sparse
            # orderkeys can skip a brand digit) — sentinel, not a bug
            assert r["victim_urls"] == 0
    # at least one confusable resolves to its victim; both fixture
    # families carry Latin letters beside the Cyrillic confusable, so
    # every detected label is mixed-script
    assert any(r["victim_host"] != "-" for r in rows)
    assert all(r["mixed_script"] == 1 for r in rows)
