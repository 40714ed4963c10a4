"""Block-160 operators: Bloom join-prefilter payoff, shuffle-partition
sizing, AV epoch duration budgeting."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_join_bloom_prefilter,
                                   q_media_duration_budget,
                                   q_shuffle_size_plan)

SF = "/root/testdata/sf0.001"


def test_bloom_prefilter_replay(spark):
    li = [(r.l_returnflag, r.l_partkey) for r in
          spark.read.parquet(f"{SF}/lineitem.parquet")
          .select("l_returnflag", "l_partkey").collect()]
    build = {r.p_partkey for r in
             spark.read.parquet(f"{SF}/part.parquet")
             .select("p_partkey").collect() if r.p_partkey % 53 == 0}
    probe, match = defaultdict(int), defaultdict(int)
    for flag, pk in li:
        probe[flag] += 1
        if pk in build:
            match[flag] += 1
    fpr = (1 - math.exp(-7.0 * len(build) / 65536.0)) ** 7
    got = {r.l_returnflag: r for r in
           q_join_bloom_prefilter(spark, SF).collect()}
    assert set(got) == set(probe)
    for flag in probe:
        r = got[flag]
        efp = round((probe[flag] - match[flag]) * fpr)
        assert (r.n_probe, r.n_match, r.n_build, r.expected_fp) == \
            (probe[flag], match[flag], len(build), efp), flag
        assert r.shuffled_rows == match[flag] + efp
        assert r.reduction_ppm == math.floor(
            1_000_000 - r.shuffled_rows * 1_000_000 / probe[flag])
        # the whole point: a selective build side must cut the shuffle
        # by an order of magnitude
        assert r.reduction_ppm > 900_000


def test_shuffle_size_plan_replay(spark):
    rows = {r.table_name: r for r in q_shuffle_size_plan(spark, SF).collect()}
    assert set(rows) == {"documents", "orders", "events", "lineitem"}
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "text", "lang", "source").collect()
    est = sum(len(r.text.encode()) + len(r.lang.encode())
              + len(r.source.encode()) + 16 for r in docs)
    r = rows["documents"]
    assert (r.n_rows, r.est_bytes) == (len(docs), est)
    assert r.est_mb == round(est / 1048576.0, 2)
    assert r.rec_partitions == min(max(math.ceil(est / 67108864.0), 1), 2048)
    # tiny SF: every table must clamp to the floor, never 0
    assert all(v.rec_partitions >= 1 for v in rows.values())


def test_media_duration_budget_replay(spark):
    li = [(r.l_orderkey, r.l_linenumber) for r in
          spark.read.parquet(f"{SF}/lineitem.parquet")
          .select("l_orderkey", "l_linenumber").collect()]
    per = defaultdict(list)
    for ok, ln in li:
        key = ok * 7 + ln
        src = f"s{key % 2 if key % 4 < 2 else key % 5}"
        per[src].append((hashlib.md5(str(key).encode()).hexdigest(),
                         key, (key % 60) * 1000 + 1000))
    want = {}
    for src, clips in per.items():
        clips.sort()
        cum = kept = kept_ms = 0
        for i, (_, _, dur) in enumerate(clips):
            cum += dur
            if cum <= 600_000 or i == 0:
                kept += 1
                kept_ms += dur
        want[src] = (len(clips), kept, kept_ms,
                     math.floor(1_000_000 - kept * 1_000_000 / len(clips)))
    got = {r.source: (r.n_clips, r.n_kept, r.kept_ms, r.cut_ppm)
           for r in q_media_duration_budget(spark, SF).collect()}
    assert got == want
    # hub sources (s0/s1) carry double volume -> deeper cuts
    assert got["s0"][3] > got["s3"][3] and got["s1"][3] > got["s4"][3]
