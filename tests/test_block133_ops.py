"""Block-133 operators: SpotSigs dedup, bounded weighted SSSP,
keep-alive connection planning."""

from __future__ import annotations

import re
from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.operators.dedup import (SPOTSIG_ANCHORS, SPOTSIG_CHAIN,
                                           spotsigs_pairs)
from genesis_spark.queries import (q_fetch_connection_reuse,
                                   q_graph_sssp_bounded)

SF = "/root/testdata/sf0.001"


def _spotsigs(text):
    toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
    sigs = set()
    for i, t in enumerate(toks):
        if t in SPOTSIG_ANCHORS:
            chain = [x for x in toks[i + 1:]
                     if x not in SPOTSIG_ANCHORS][:SPOTSIG_CHAIN]
            if len(chain) == SPOTSIG_CHAIN:
                sigs.add(":".join([t] + chain))
    return sigs


def test_spotsigs_kernel_and_invariance_to_boilerplate(spark):
    # near-dup pages with different navigation chrome share signatures
    core = "read the full report of quarterly results to investors"
    page_a = "home nav menu " + core + " footer contact"
    page_b = "breaking sidebar ad " + core + " share buttons"
    sa, sb = _spotsigs(page_a), _spotsigs(page_b)
    # the core anchors survive the chrome; only the trailing 'to'
    # chain leaks into it — signature overlap stays high
    assert {"the:full:report", "of:quarterly:results"} <= sa & sb
    inter, union = len(sa & sb), len(sa | sb)
    df = spark.createDataFrame(
        [(1, page_a), (2, page_b), (3, "completely different words")],
        "doc_id long, text string")
    pairs = {(r.a, r.b): r.jaccard
             for r in spotsigs_pairs(df, threshold=0.4).collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == round(inter / union, 4) >= 0.4

    # full corpus replay for a sample: operator sigs == python sigs
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text").limit(30).collect()
    from genesis_spark.operators.dedup import spotsig_expr
    from pyspark.sql import functions as F
    got = {r.doc_id: set(r.s) for r in
           spark.createDataFrame([(r.doc_id, r.text) for r in docs],
                                 "doc_id long, text string")
           .select("doc_id", spotsig_expr(F.col("text")).alias("s"))
           .collect()}
    for r in docs:
        assert got[r.doc_id] == _spotsigs(r.text), r.doc_id


def test_sssp_python_replay_and_seed_zero(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey").collect()
    edges = {(r.o_orderkey % 50, r.o_custkey % 50)
             for r in df if r.o_orderkey % 50 != r.o_custkey % 50}
    INF = float("inf")
    nodes = {n for e in edges for n in e}
    dist = {n: (0 if n % 10 == 0 else INF) for n in nodes}
    for _ in range(3):
        nd = dict(dist)
        for s, t in edges:
            if dist[s] < INF:
                w = 10 + (s * 7 + t * 13) % 90
                nd[t] = min(nd[t], dist[s] + w)
        dist = nd
    got = {int(r.host[1:]): r.dist_ms for r in
           q_graph_sssp_bounded(spark, SF).collect()}
    assert set(got) == nodes
    for n in nodes:
        want = -1 if dist[n] == INF else dist[n]
        assert got[n] == want, n
    for n in nodes:
        if n % 10 == 0:
            assert got[n] == 0


def test_connection_reuse_replay(spark):
    rows = {(f"h{r.o_orderkey % 50}",
             (r.o_orderkey % 13) * 3600
             + ((r.o_orderkey * 11) % 29) * 20)
            for r in spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()}
    per_host = defaultdict(list)
    for h, t in rows:
        per_host[h].append(t)
    got = {r.host_key: r for r in
           q_fetch_connection_reuse(spark, SF).collect()}
    assert set(got) == set(per_host)
    for h, ts in per_host.items():
        ts.sort()
        runs, cur = [], 1
        for prev, t in zip(ts, ts[1:]):
            if t - prev > 300:
                runs.append(cur)
                cur = 1
            else:
                cur += 1
        runs.append(cur)
        r = got[h]
        assert (r.n_fetches, r.n_connections) == (len(ts), len(runs))
        assert r.saved_handshakes == len(ts) - len(runs)
        assert r.reuse_ppm == (len(ts) - len(runs)) * 1000000 // len(ts)
        assert r.max_run == max(runs)
    # keep-alive genuinely saves handshakes somewhere
    assert any(r.saved_handshakes > 0 for r in got.values())
