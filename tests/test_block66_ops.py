"""Block-66 operators: streaming histogram sketch, politeness-violation
audit, dedup threshold-calibration curve."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import os
import tempfile
from collections import defaultdict

from pyspark.sql import functions as F

from genesis_spark.queries import (q_corpus_dedup_threshold_curve,
                                   q_dedup_ngram_jaccard,
                                   q_politeness_violations)
from genesis_spark.streaming.pipeline import hist_stream

SF = "/root/testdata/sf0.001"


def test_hist_stream_accumulates_across_batches(spark):
    # 3 files -> 3 micro-batches; values straddle both clamp edges
    rows = [("a", -5.0), ("a", 0.0), ("a", 15.9), ("a", 16.0),
            ("a", 600.0), ("b", 100.0), ("b", None), ("b", 100.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    tmp = tempfile.mkdtemp(prefix="gs_histtest_")
    src, ck = os.path.join(tmp, "src"), os.path.join(tmp, "ck")
    df.repartition(3).write.parquet(src)
    stream = (spark.readStream.schema("event_type string, value double")
              .option("maxFilesPerTrigger", 1).format("parquet").load(src))
    q = (hist_stream(stream, lo=0.0, hi=512.0, n_bins=32)
         .writeStream.format("memory").queryName("hist_unit")
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    final = {(r["event_type"], r["bin"]): r["cnt"]
             for r in spark.table("hist_unit")
             .groupBy("event_type", "bin")
             .agg(F.max("cnt_cum").alias("cnt")).collect()}
    # bin width 16: -5 clamps to 0, 0 -> 0, 15.9 -> 0, 16 -> 1,
    # 600 clamps to 31, 100 -> 6 (twice), None dropped
    assert final == {("a", 0): 3, ("a", 1): 1, ("a", 31): 1, ("b", 6): 2}


def test_politeness_violations_golden(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .select("l_orderkey", "l_partkey", "l_suppkey",
                "l_linenumber").collect()
    per_host = defaultdict(list)
    for r in li:
        hid = r["l_orderkey"] % 30
        ts = (r["l_partkey"] * 137 + r["l_suppkey"] * 11
              + r["l_linenumber"]) % 600000
        per_host[f"h{hid}"].append(
            (ts, r["l_orderkey"] * 10 + r["l_linenumber"],
             500 * (1 + hid % 4)))
    got = {r["host"]: r for r in
           q_politeness_violations(spark, SF).collect()}
    assert set(got) == set(per_host)
    for host, fetches in per_host.items():
        fetches.sort()
        delay = fetches[0][2]
        gaps = [b[0] - a[0] for a, b in zip(fetches, fetches[1:])]
        r = got[host]
        assert r["delay_ms"] == delay
        assert r["n_fetches"] == len(fetches)
        assert r["n_violations"] == sum(g < delay for g in gaps)
        assert r["min_gap_ms"] == (min(gaps) if gaps else -1)
        assert r["violation_ppm"] == \
            sum(g < delay for g in gaps) * 10**6 // len(fetches)


def test_threshold_curve_consistent_with_base_row(spark):
    curve = {r["band"]: r for r in
             q_corpus_dedup_threshold_curve(spark, SF).collect()}
    assert curve and all(5 <= b <= 9 for b in curve)
    for r in curve.values():
        # a pair touches exactly 2 docs; distinct docs <= 2*pairs
        assert 2 <= r["n_docs"] <= 2 * r["n_pairs"]
    base_pairs = q_dedup_ngram_jaccard(spark, SF).count()
    # bands >= 6 partition exactly the base row's threshold-0.6 pairs
    assert sum(r["n_pairs"] for b, r in curve.items() if b >= 6) \
        == base_pairs
