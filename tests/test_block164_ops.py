"""Block-164 operator: archive temporal-coverage audit."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import q_warc_date_coverage

SF = "/root/testdata/sf0.001"


def test_date_coverage_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    days = defaultdict(set)
    for k in ks:
        h, d = k % 25, (k // 25) % 60
        if (h + d) % 7 != 0:
            days[f"h{h}"].add(d)
    got = {r.host_key: r for r in q_warc_date_coverage(spark, SF).collect()}
    assert set(got) == set(days)
    for host, ds in days.items():
        sd = sorted(ds)
        span = sd[-1] - sd[0] + 1
        max_gap = max((b - a - 1 for a, b in zip(sd, sd[1:])), default=0)
        r = got[host]
        assert (r.n_days, r.span_days, r.max_gap_days, r.coverage_ppm) == \
            (len(sd), span, max_gap, len(sd) * 1_000_000 // span), host
    # the % 7 drop rule must create real gaps somewhere
    assert any(r.max_gap_days >= 1 for r in got.values())
    assert all(r.coverage_ppm <= 1_000_000 for r in got.values())
