"""Block-80 operators: EXIF metadata scrub plan, license admission gate,
A/B power analysis."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math

from genesis_spark.queries import (q_corpus_license_gate,
                                   q_events_power_sample_size,
                                   q_media_metadata_scrub)

SF = "/root/testdata/sf0.001"


def test_metadata_scrub_census_golden(spark):
    parts = [r["p_partkey"] for r in
             spark.read.parquet(f"{SF}/part.parquet")
             .select("p_partkey").collect()]
    n = len(parts)
    want = {
        "Make": (n, "keep"), "Model": (n, "keep"),
        "Orientation": (n, "keep"), "DateTime": (n, "strip-pii"),
        "GPSLat": (sum(1 for k in parts if k % 3 == 0), "strip-pii"),
        "GPSLon": (sum(1 for k in parts if k % 3 == 0), "strip-pii"),
        "SerialNumber": (sum(1 for k in parts if k % 4 == 0),
                         "strip-forensic"),
    }
    got = {r["tag"]: r for r in q_media_metadata_scrub(spark, SF).collect()}
    assert set(got) == set(want)
    for tag, (cnt, action) in want.items():
        r = got[tag]
        assert r["n_images"] == cnt
        assert r["action"] == action
        assert r["is_blocked"] == int(action != "keep")


def test_license_gate_partition_golden(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "n_chars", "text").collect()
    per = {}
    for r in docs:
        if r["text"] is None:
            continue
        m = r["doc_id"] % 6
        verdict = ("admit" if m in (1, 2, 4)
                   else "admit-attribution" if m == 3 else "reject")
        dn, dc = per.get(verdict, (0, 0))
        per[verdict] = (dn + 1, dc + r["n_chars"])
    total = sum(c for _, c in per.values())
    got = {r["verdict"]: r for r in q_corpus_license_gate(spark, SF).collect()}
    assert set(got) == set(per)
    for v, (dn, dc) in per.items():
        r = got[v]
        assert (r["n_docs"], r["n_chars"]) == (dn, dc)
        assert r["class_ppm"] == dc * 10**6 // total
    # the gate must actually partition: all three verdict classes present
    # and the rejected mass is the no-tag + all-rights share (2 of 6 slots)
    assert got["reject"]["n_docs"] > 0


def test_power_sample_size_closed_form(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "value").collect()
    spend = {}
    for r in ev:
        spend[r["user_id"]] = spend.get(r["user_id"], 0) + \
            int(round(r["value"] * 100))
    vals = list(spend.values())
    n, s1, s2 = len(vals), sum(vals), sum(v * v for v in vals)
    mean = s1 / n
    var = (n * s2 - s1 * s1) / (n * n)
    zz = (1.959964 + 0.841621) ** 2
    got = {r["lift_pm"]: r for r in
           q_events_power_sample_size(spark, SF).collect()}
    assert set(got) == {10, 20, 50}
    for pm in (10, 20, 50):
        delta = mean * pm / 1000.0
        want_n = math.ceil(2.0 * zz * var / (delta * delta))
        r = got[pm]
        assert abs(r["mean_spend"] - round(mean, 3)) < 1e-9
        assert abs(r["var_spend"] - round(var, 3)) < 1e-6
        assert r["n_per_arm"] == want_n
    # detecting a smaller lift needs more users — strict monotone
    assert got[10]["n_per_arm"] > got[20]["n_per_arm"] > \
        got[50]["n_per_arm"]
