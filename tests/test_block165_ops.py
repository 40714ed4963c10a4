"""Block-165 operators: byte-based crawl budgeting, meta-refresh
redirect extraction."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_frontier_byte_budget,
                                   q_http_meta_refresh)

SF = "/root/testdata/sf0.001"


def test_byte_budget_replay(spark):
    ks = [r.l_orderkey for r in
          spark.read.parquet(f"{SF}/lineitem.parquet")
          .select("l_orderkey").collect()]
    per = defaultdict(lambda: [0, 0])
    for k in ks:
        b = (400_000 if k % 40 < 5 else 50_000) + (k % 97) * 100
        e = per[f"h{k % 40}"]
        e[0] += 1
        e[1] += b
    got = {r.host_key: r for r in q_frontier_byte_budget(spark, SF).collect()}
    assert set(got) == set(per)
    for host, (n, tot) in per.items():
        r = got[host]
        mean = tot // n
        quota = 67108864 // mean
        assert (r.n_pages, r.total_bytes, r.mean_page_bytes,
                r.byte_quota_pages) == (n, tot, mean, quota), host
        assert r.binding_constraint == ("bytes" if quota < 500 else "count")
    # hub hosts (h0-h4) serve 8x pages -> bytes must bind for them and
    # count for the tail
    assert all(got[f"h{i}"].binding_constraint == "bytes" for i in range(5))
    assert any(r.binding_constraint == "count" for r in got.values())


def test_meta_refresh_replay(spark):
    ids = [r.doc_id for r in
           spark.read.parquet(f"{SF}/documents.parquet")
           .select("doc_id").collect()]
    got = {r.url: r for r in q_http_meta_refresh(spark, SF).collect()}
    assert len(got) == len(ids)
    for d in ids:
        r = got[f"http://s{d % 30}.onion/p{d}"]
        shape = d % 4
        want_cls = ["immediate", "delayed", "reload_only", "none"][shape]
        want_delay = [0, 5, 30, -1][shape]
        want_tgt = (f"http://s{d % 30}.onion/new{d % 50}"
                    if shape in (0, 1) else "")
        assert (r.refresh_class, r.refresh_delay_s, r.refresh_target) == \
            (want_cls, want_delay, want_tgt), d
    # the regexp must be case-insensitive: shape 0 uses uppercase META
    assert any(r.refresh_class == "immediate" for r in got.values())
