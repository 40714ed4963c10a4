"""Block-166 operator: HTTPS->HTTP downgrade-link detection."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import q_url_scheme_downgrade

SF = "/root/testdata/sf0.001"


def test_scheme_downgrade_replay(spark):
    li = [(r.l_orderkey, r.l_linenumber) for r in
          spark.read.parquet(f"{SF}/lineitem.parquet")
          .select("l_orderkey", "l_linenumber").collect()]
    per = defaultdict(lambda: [0, 0])
    for ok, ln in li:
        k = ok + ln
        h = k % 30
        src_https = not (k % 7 == 0 or (h % 3 == 0 and k % 2 == 0))
        dst_https = not (k % 7 == 0 or (h % 3 == 0 and k % 4 < 2))
        e = per[f"h{h}"]
        e[0] += 1
        e[1] += src_https and not dst_https
    got = {r.src_host: r for r in q_url_scheme_downgrade(spark, SF).collect()}
    assert set(got) == set(per)
    for host, (n, d) in per.items():
        r = got[host]
        ppm = d * 1_000_000 // n
        assert (r.n_links, r.n_downgrade, r.downgrade_ppm,
                r.needs_rewrite) == (n, d, ppm, ppm >= 200_000), host
    # the mixed fixture must produce BOTH verdicts, and downgrade hosts
    # must be exactly the h%3==0 family (their src stays https on odd k
    # while dst drops on k%4 in {0,1})
    flags = {r.needs_rewrite for r in got.values()}
    assert flags == {True, False}
    assert all(got[f"h{h}"].n_downgrade == 0 for h in range(30) if h % 3)
