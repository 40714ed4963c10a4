"""Block-54 operators: bot cadence detection, PQ distortion grading,
politeness makespan."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import duckdb

from genesis_spark.operators.similarity import pq_centroids
from genesis_spark.queries import (_PQ_DIM, _PQ_K, _PQ_M,
                                   q_embeddings_pq_distortion,
                                   q_events_bot_detect,
                                   q_frontier_makespan)

SF = "/root/testdata/sf0.001"


def test_bot_detect_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) "
        f"FROM '{SF}/events.parquet' ORDER BY user_id, 3, event_id"
    ).fetchall()
    by_user: dict[int, list[int]] = {}
    for uid, _, es in rows:
        by_user.setdefault(uid, []).append(es)
    got = {r["user_id"]: r for r in q_events_bot_detect(spark, SF).collect()}
    assert set(got) == set(by_user)
    for uid, ts in by_user.items():
        gaps = [min(b - a, 86400) for a, b in zip(ts, ts[1:])]
        n, sg = len(gaps), sum(gaps)
        ssg = sum(g * g for g in gaps)
        mean = sg // max(n, 1)
        cv2 = max(n * ssg - sg * sg, 0) // max((sg * sg) // 1_000_000, 1)
        r = got[uid]
        assert (r["n_events"], r["n_gaps"]) == (len(ts), n)
        assert r["mean_gap_s"] == mean
        assert r["cv2_ppm"] == cv2
        assert r["is_bot"] == (len(ts) >= 20 and mean < 600
                               and cv2 < 500_000)


def test_bot_detect_flags_metronome_not_burst(spark):
    # 30 events at a fixed 10 s tick -> bot; 30 events in 3 bursts -> not
    rows = []
    for i in range(30):
        rows.append((1, i, 1000 + 10 * i))
    for i in range(30):
        rows.append((2, 100 + i, 1000 + (i // 10) * 3000 + (i % 10) * 37))
    df = spark.createDataFrame(
        [(u, e, float(s)) for u, e, s in rows],
        "user_id long, event_id long, sec double")
    df = df.select("user_id", "event_id",
                   df.sec.cast("timestamp").alias("ts"),
                   df.sec.alias("value"))
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        df.withColumn("event_type", df.user_id.cast("string")) \
          .withColumn("props", df.user_id.cast("string")) \
          .write.parquet(f"{td}/events.parquet")
        out = {r["user_id"]: r for r in
               q_events_bot_detect(spark, td).collect()}
    assert out[1]["is_bot"] and out[1]["cv2_ppm"] == 0
    assert not out[2]["is_bot"] and out[2]["cv2_ppm"] >= 500_000


def test_pq_distortion_matches_python_replay(spark):
    con = duckdb.connect()
    vecs = con.execute(
        f"SELECT embedding FROM '{SF}/embeddings.parquet'").fetchall()
    sub = _PQ_DIM // _PQ_M
    cents = pq_centroids(_PQ_M, _PQ_K, sub)
    agg = {j: [0, 0, 0] for j in range(_PQ_M)}  # n, sse, max
    for (emb,) in vecs:
        x = [float(v) for v in emb]
        for j in range(_PQ_M):
            xs = x[j * sub:(j + 1) * sub]
            xn = 0.0
            for v in xs:
                xn += v * v
            best = None
            for c in cents[j]:
                cn = float(sum(v * v for v in c))
                dot = 0.0
                for a, b in zip(xs, c):
                    dot += a * b
                d = cn - 2.0 * dot
                best = d if best is None or d < best else best
            err_u = round((xn + best) * 1_000_000)
            agg[j][0] += 1
            agg[j][1] += err_u
            agg[j][2] = max(agg[j][2], err_u)
    got = {r["subspace"]: r
           for r in q_embeddings_pq_distortion(spark, SF).collect()}
    assert set(got) == set(agg)
    for j, (n, sse, mx) in agg.items():
        r = got[j]
        assert (r["n_vecs"], r["sse_u"], r["max_err_u"]) == (n, sse, mx)
        assert r["mse_u"] == sse // n
        # a 16-centroid random codebook must leave real residual error
        assert r["mse_u"] > 0


def test_makespan_matches_python_replay(spark):
    con = duckdb.connect()
    pend = dict(con.execute(
        f"SELECT o_orderkey % 50, count(*) "
        f"FROM '{SF}/orders.parquet' GROUP BY 1").fetchall())
    buckets: dict[int, list] = {}
    for hn, p in pend.items():
        eta = p * (200 + 100 * (hn % 7))
        buckets.setdefault(hn % 8, []).append((f"h{hn}", p, eta))
    got = {r["bucket"]: r for r in q_frontier_makespan(spark, SF).collect()}
    assert set(got) == set(buckets)
    for b, hosts in buckets.items():
        mk = max(e for _, _, e in hosts)
        crit = min(h for h, _, e in hosts if e == mk)
        work = sum(e for _, _, e in hosts)
        r = got[b]
        assert r["n_hosts"] == len(hosts)
        assert r["total_pending"] == sum(p for _, p, _ in hosts)
        assert r["makespan_ms"] == mk
        assert r["critical_host"] == crit
        assert r["balance_ppm"] == (work * 1_000_000
                                    // max(mk * len(hosts), 1))
        assert r["balance_ppm"] <= 1_000_000
