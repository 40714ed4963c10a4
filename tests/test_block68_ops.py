"""Block-68 operators: IVF n_probe recall sweep, HTTP compression
audit, robots-vs-page-directive conflict census."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from collections import defaultdict

from genesis_spark.queries import (q_ann_recall_vs_nprobe,
                                   q_http_compression, q_robots_conflict)

SF = "/root/testdata/sf0.001"


def test_recall_nondecreasing_in_nprobe(spark):
    rows = q_ann_recall_vs_nprobe(spark, SF).collect()
    by_q = defaultdict(dict)
    for r in rows:
        by_q[r["query_id"]][r["n_probe"]] = r["n_hits"]
    assert len(by_q) == 10
    for q, hits in by_q.items():
        assert set(hits) == {1, 2, 3}
        # probing more cells can only ADD candidates -> recall monotone
        assert hits[1] <= hits[2] <= hits[3], f"query {q}"
    # the sweep must show an actual recall gradient somewhere
    assert any(h[3] > h[1] for h in by_q.values())
    # n_probe=3 must reproduce ann_recall_eval's ivf config exactly
    from genesis_spark.queries import q_ann_recall_eval
    ivf_eval = {r["query_id"]: r["n_hits"] for r in
                q_ann_recall_eval(spark, SF).collect()
                if r["method"] == "ivf"}
    assert {q: h[3] for q, h in by_q.items()} == ivf_eval


def test_http_compression_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    exp = {}
    for k in keys:
        c, raw = k % 5, 1000 + k % 9000
        enc = {0: "gzip", 1: "br", 2: "zstd", 3: "identity",
               4: "gzip"}[c]
        sent = {"gzip": raw // 3, "br": raw // 4, "zstd": raw // 5,
                "identity": raw}[enc]
        row = exp.setdefault(f"h{k % 15}",
                             defaultdict(int))
        row["n"] += 1
        row[enc] += 1
        row["raw"] += raw
        row["sent"] += sent
    got = {r["host"]: r for r in q_http_compression(spark, SF).collect()}
    assert set(got) == set(exp)
    for host, e in exp.items():
        r = got[host]
        assert (r["n_responses"], r["n_gzip"], r["n_br"], r["n_zstd"],
                r["n_identity"]) == (e["n"], e["gzip"], e["br"],
                                     e["zstd"], e["identity"])
        assert (r["bytes_raw"], r["bytes_sent"]) == (e["raw"], e["sent"])
        assert r["savings_ppm"] == \
            (e["raw"] - e["sent"]) * 10**6 // e["raw"]


def test_robots_conflict_classes(spark):
    rows = {r["host"]: r for r in q_robots_conflict(spark, SF).collect()}
    for host, r in rows.items():
        hid = int(host[1:])
        if hid % 5 == 0:
            # disallowing hosts have both conflict classes by fixture
            assert r["n_blocked_indexable"] > 0
        else:
            # non-disallowing hosts can never block anything
            assert r["n_blocked_indexable"] == 0
        assert r["n_fetch_wasted"] > 0  # noindex pages exist everywhere
        assert r["conflict_ppm"] == \
            (r["n_fetch_wasted"] + r["n_blocked_indexable"]) \
            * 10**6 // r["n_pages"]
