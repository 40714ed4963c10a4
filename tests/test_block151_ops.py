"""Block-151 operators: API semver diff, exact embedding dup, warcinfo
inheritance."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_code_api_diff,
                                   q_embeddings_exact_dup,
                                   q_warc_warcinfo_join)

SF = "/root/testdata/sf0.001"


def test_api_diff_replay(spark):
    got = {r.module: r for r in q_code_api_diff(spark, SF).collect()}
    assert set(got) == set(range(25))
    semvers = set()
    for m in range(25):
        js = list(range(4 + m % 4))
        v1 = {f"fn{m}_{j}": 1 + (m + j) % 3 for j in js}
        v2 = {f"fn{m}_{j}": (1 + (m + j) % 3
                             + (1 if (m + j) % 5 == 0 else 0))
              for j in js if (m + j) % 7 != 0}
        v2[f"fn{m}_new"] = 2
        removed = sum(1 for f in v1 if f not in v2)
        added = sum(1 for f in v2 if f not in v1)
        changed = sum(1 for f in v1
                      if f in v2 and v1[f] != v2[f])
        r = got[m]
        assert (r.n_v1, r.n_v2) == (len(v1), len(v2))
        assert (r.n_removed, r.n_added, r.n_changed) == (
            removed, added, changed), m
        want = ("major" if removed or changed else
                "minor" if added else "patch")
        assert r.semver == want
        semvers.add(want)
    # every module adds fn_new, so 'patch' can't occur — but both
    # breaking and additive releases must
    assert semvers == {"major", "minor"}


def test_exact_dup_replay(spark):
    ids = [r.vec_id for r in
           spark.read.parquet(f"{SF}/embeddings.parquet")
           .select("vec_id").collect()]
    planted = [i for i in ids if i % 10 == 0]
    got = {r.vec_id: r for r in q_embeddings_exact_dup(spark, SF).collect()}
    assert set(got) == set(ids) | {i + 100000 for i in planted}
    for i in planted:
        a, b = got[i], got[i + 100000]
        assert a.fp8 == b.fp8
        assert a.cluster_size == b.cluster_size >= 2
        assert a.rep_id == b.rep_id == min(i, i + 100000)
        assert a.is_dup == b.is_dup == 1
    # non-planted vectors stay singletons (the synth vectors differ)
    solo = [i for i in ids if i % 10 != 0]
    assert all(got[i].cluster_size == 1 and got[i].is_dup == 0
               for i in solo)


def test_warcinfo_join_replay(spark):
    doc_ids = [r.doc_id for r in
               spark.read.parquet(f"{SF}/documents.parquet")
               .select("doc_id").collect()]
    got = {r.doc_id: r for r in q_warc_warcinfo_join(spark, SF).collect()}
    assert set(got) == set(doc_ids)
    missing = present = 0
    for d in doc_ids:
        f = d // 20
        r = got[d]
        assert r.file_id == f
        if f % 9 == 0:
            assert (r.has_warcinfo, r.software, r.operator) == (
                0, "", "")
            missing += 1
        else:
            assert r.has_warcinfo == 1
            assert r.software == f"crawler/v{f % 3 + 1}"
            assert r.operator == f"op{f % 5}"
            present += 1
    assert missing > 0 and present > 0
