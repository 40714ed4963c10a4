"""Block-106 operator: capped-proportional domain-mix waterfill."""

from __future__ import annotations

from collections import defaultdict

from genesis_spark.queries import q_corpus_mix_waterfill

import pytest

pytestmark = pytest.mark.block

SF = "/root/testdata/sf0.001"


def test_mix_waterfill_golden(spark):
    per = defaultdict(int)
    for r in spark.read.parquet(f"{SF}/documents.parquet") \
            .select("source", "text").collect():
        if r["text"] is not None:
            per[r["source"]] += len(r["text"].split(" "))
    budget = sum(per.values())
    share = {s: (int(s[3:]) % 4 + 1) * 20000 for s in per}
    alloc1, capped = {}, {}
    for s in per:
        want = share[s] * budget // 10**6
        alloc1[s] = min(per[s], want)
        capped[s] = int(want >= per[s])
    surplus = budget - sum(alloc1.values())
    u_share = sum(share[s] for s in per if not capped[s])
    exp = {}
    for s in per:
        if capped[s] or u_share == 0:
            a = alloc1[s]
        else:
            a = min(per[s], alloc1[s] + share[s] * surplus // u_share)
        exp[s] = a
    got = {r["source"]: r for r in
           q_corpus_mix_waterfill(spark, SF).collect()}
    assert set(got) == set(per)
    for s in per:
        r = got[s]
        assert r["avail_tokens"] == per[s]
        assert r["target_ppm"] == share[s]
        assert r["capped"] == capped[s]
        assert r["alloc_tokens"] == exp[s]
        assert r["fill_ppm"] == exp[s] * 10**6 // per[s]
        assert r["realized_ppm"] == exp[s] * 10**6 // budget
    # the 8%-target sources cap on a ~5% inventory, 2% never do
    assert all(got[s]["capped"] == 1 for s in per
               if share[s] == 80000)
    assert all(got[s]["capped"] == 0 for s in per
               if share[s] == 20000)
    # allocation never exceeds budget or availability
    assert sum(exp.values()) <= budget
    assert all(exp[s] <= per[s] for s in per)
