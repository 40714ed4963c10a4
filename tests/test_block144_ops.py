"""Block-144 operators: count-min sketch audit, CDN detection,
partition-scheme evolution."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (_CMS_A, _CMS_B, _CMS_D, _CMS_P,
                                   _CMS_W, q_events_countmin,
                                   q_host_cdn_detect,
                                   q_layout_partition_evolution)

SF = "/root/testdata/sf0.001"


def _cms_bucket(key, j):
    return ((key * _CMS_A[j] + _CMS_B[j]) % _CMS_P) % _CMS_W


def test_countmin_replay(spark):
    users = [r.user_id for r in
             spark.read.parquet(f"{SF}/events.parquet")
             .select("user_id").collect()]
    true = Counter(users)
    counters = defaultdict(int)
    for u in users:
        for j in range(_CMS_D):
            counters[(j, _cms_bucket(u, j))] += 1
    got = {r.user_id: r for r in q_events_countmin(spark, SF).collect()}
    assert set(got) == set(true)
    for u, n in true.items():
        est = min(counters[(j, _cms_bucket(u, j))]
                  for j in range(_CMS_D))
        r = got[u]
        assert (r.true_n, r.est_n) == (n, est)
        assert r.overcount == est - n
        assert r.never_under == 1  # the CMS one-sided guarantee
    # overcount is one-sided; at this key cardinality (~15 users in
    # 4x32 cells) a full 4-row collision may or may not occur, so
    # only the sign is asserted — the constructed-collision test
    # below pins the collision arithmetic.
    assert all(r.overcount >= 0 for r in got.values())


def test_countmin_one_sided_property():
    # constructed FULL collision: key and key+P hash identically in
    # every row (k*A mod P is P-periodic), so the estimate really
    # overcounts — and still never undercounts
    counts = Counter({10: 5, 10 + _CMS_P: 3})
    cells = defaultdict(int)
    for k, n in counts.items():
        for j in range(_CMS_D):
            cells[(j, _cms_bucket(k, j))] += n
    for k, n in counts.items():
        est = min(cells[(j, _cms_bucket(k, j))] for j in range(_CMS_D))
        assert est >= n
    # the collision is real: key 10's estimate includes the twin's mass
    est10 = min(cells[(j, _cms_bucket(10, j))] for j in range(_CMS_D))
    assert est10 == 8


def test_cdn_detect_replay(spark):
    ks = [r.c_custkey for r in
          spark.read.parquet(f"{SF}/customer.parquet")
          .select("c_custkey").collect()]
    got = {r.host: r for r in q_host_cdn_detect(spark, SF).collect()}
    providers = set()
    for k in ks:
        r = got[f"h{k}"]
        if k % 5 == 0:
            want, via_c = "cloudfront", 1
        elif k % 5 == 1:
            want, via_c = "fastly", 1
        elif k % 5 == 2:
            want, via_c = "akamai", 1
        elif k % 7 == 0:
            want, via_c = "cloudflare", 0
        else:
            want, via_c = "none", 0
        assert r.provider == want, (k, r.provider)
        assert r.via_cname == via_c
        assert r.via_header == int(want == "cloudflare")
        assert r.is_cdn == int(want != "none")
        providers.add(r.provider)
    assert providers == {"cloudfront", "fastly", "akamai",
                         "cloudflare", "none"}
    # origin CNAMEs must NOT match any provider suffix
    origin = [k for k in ks if k % 5 == 3 and k % 7 != 0]
    assert origin and all(got[f"h{k}"].provider == "none"
                          for k in origin)


def test_partition_evolution_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    per = defaultdict(lambda: [0, 0])     # (year, month) -> [old, new]
    for k in ks:
        mid = k % 24
        y, m = 2023 + mid // 12, mid % 12 + 1
        per[(y, m)][(k // 24) % 3 == 0] += 1
    got = {(r.year, r.month): r for r in
           q_layout_partition_evolution(spark, SF).collect()}
    assert set(got) == set(per)
    for (y, m), (old, new) in per.items():
        r = got[(y, m)]
        assert (r.n_files, r.n_old, r.n_new) == (old + new, old, new)
        assert r.mixed == int(old > 0 and new > 0)
        assert r.new_ppm == new * 1000000 // (old + new)
    # the audit's point: coexisting layouts are detected everywhere
    assert all(r.mixed == 1 for r in got.values())
