"""Block-124 operators: event cross-correlation, local bridges,
streaming anomaly detection."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import q_events_xcorr, q_graph_local_bridges

SF = "/root/testdata/sf0.001"


def test_xcorr_python_replay_and_best_lag(spark):
    evs = [(r.event_type,
            (r.ts.date() - __import__("datetime").date(2024, 1, 1)).days)
           for r in spark.read.parquet(f"{SF}/events.parquet")
           .select("event_type", "ts").collect()]
    counts = defaultdict(int)
    for t, d in evs:
        counts[(t, d)] += 1
    lo, hi = min(d for _, d in evs), max(d for _, d in evs)
    types = {t for t, _ in evs}
    series = {t: [counts.get((t, d), 0) for d in range(lo, hi + 1)]
              for t in types}

    def stats(ta, tb, lag):
        xs, ys = [], []
        for i, x in enumerate(series[ta]):
            jd = i + lag
            if 0 <= jd < len(series[tb]):
                xs.append(x)
                ys.append(series[tb][jd])
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
        cov = n * sxy - sx * sy
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        sign = (cov > 0) - (cov < 0)
        return n, cov, sign * (cov * cov * 1000000 // (vx * vy))

    rows = q_events_xcorr(spark, SF).collect()
    assert len(rows) == 21
    by_pair = defaultdict(dict)
    for r in rows:
        n, cov, r2 = stats(r.ta, r.tb, r.lag)
        assert (r.n, r.cov_num, r.r2_ppm) == (n, cov, r2), (r.ta, r.lag)
        by_pair[(r.ta, r.tb)][r.lag] = (r.r2_ppm, r.best_lag)
    for pair, lags in by_pair.items():
        best = {bl for _, bl in lags.values()}
        assert len(best) == 1                       # consistent per pair
        bl = best.pop()
        top = max(abs(r2) for r2, _ in lags.values())
        assert abs(lags[bl][0]) == top
        # tie-break: smallest lag among the max-|r2| candidates
        cands = [l for l, (r2, _) in lags.items() if abs(r2) == top]
        assert bl == min(cands)


def test_local_bridges_python_replay(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey").collect()
    edges = {tuple(sorted((r.o_orderkey % 499, r.o_custkey % 499)))
             for r in df if r.o_orderkey % 499 != r.o_custkey % 499}
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    got = {(r.a, r.b): (r.cn, r.min_deg, r.is_local_bridge)
           for r in q_graph_local_bridges(spark, SF).collect()}
    assert set(got) == edges
    n_bridge = 0
    for a, b in edges:
        cn = len(nbrs[a] & nbrs[b])
        want = (cn, min(len(nbrs[a]), len(nbrs[b])), int(cn == 0))
        assert got[(a, b)] == want, (a, b)
        n_bridge += cn == 0
    # the sparse 499-node graph has both bridges and embedded edges
    assert 0 < n_bridge < len(edges)


def test_anomaly_stream_outlier_and_cold_start(spark):
    import glob
    import os
    import shutil
    import tempfile
    import time
    from datetime import datetime, timedelta

    from genesis_spark.streaming.pipeline import anomaly_stream

    t0d = datetime(2024, 1, 1)
    rows = []
    vals = [100, 101, 99, 100, 102, 101, 100, 5000, 99, 100]
    for i, v in enumerate(vals):
        rows.append(("a", t0d + timedelta(minutes=i), i, v))
    tmp = tempfile.mkdtemp(prefix="gs_anom_unit_")
    src, ck = os.path.join(tmp, "pts"), os.path.join(tmp, "ckpt")
    os.makedirs(src)
    base = time.time() - 50
    for bi, sl in enumerate([rows[:4], rows[4:8], rows[8:]], 1):
        part = os.path.join(tmp, f"p{bi}")
        (spark.createDataFrame(
            sl, "event_type string, ts timestamp_ntz, event_id long, "
                "cents long")
         .coalesce(1).write.mode("overwrite").parquet(part))
        f = glob.glob(os.path.join(part, "*.parquet"))[0]
        dst = os.path.join(src, f"b{bi}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (base + bi, base + bi))
    stream = (spark.readStream
              .schema("event_type string, ts timestamp_ntz, "
                      "event_id bigint, cents bigint")
              .option("maxFilesPerTrigger", 1).format("parquet").load(src))
    q = (anomaly_stream(stream).writeStream.format("memory")
         .queryName("gs_anom_unit").option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r.event_id: r for r in spark.table("gs_anom_unit").collect()}
    assert len(got) == len(vals)
    # cold start: first 5 points never flagged
    for i in range(5):
        assert got[i].is_anomaly == 0
    # the 5000 spike (ordinal 8 > min_history) is flagged, neighbors not
    assert got[7].is_anomaly == 1
    assert got[6].is_anomaly == 0 and got[8].is_anomaly == 0
    assert [got[i].ordinal for i in range(10)] == list(range(1, 11))
