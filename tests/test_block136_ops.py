"""Block-136 operators: audio QC, WARC member index, Alt-Svc parsing."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_http_alt_svc, q_media_audio_qc,
                                   q_warc_member_index)

SF = "/root/testdata/sf0.001"


def test_audio_qc_python_replay(spark):
    doc_ids = [r.doc_id for r in
               spark.read.parquet(f"{SF}/documents.parquet")
               .select("doc_id").collect() if r.doc_id % 3 == 2]
    got = {r.doc_id: r for r in q_media_audio_qc(spark, SF).collect()}
    assert set(got) == set(doc_ids)
    for d in doc_ids:
        n = 512 + (d % 3) * 256
        xs = [((d * 11 + i * 17) % 4096) - 2048 for i in range(n)]
        r = got[d]
        assert r.n_samples == n
        assert r.n_clipped == sum(1 for x in xs if abs(x) >= 2047)
        assert r.dc_sum == sum(xs)
        assert r.peak == max(abs(x) for x in xs)
        want = int(r.n_clipped * 100 > n or abs(r.dc_sum) > 100 * n)
        assert r.reject == want
    # rails actually occur in the synth
    assert any(r.n_clipped > 0 for r in got.values())


def test_warc_member_index_replay(spark):
    doc_ids = sorted(r.doc_id for r in
                     spark.read.parquet(f"{SF}/documents.parquet")
                     .select("doc_id").collect())
    files = defaultdict(list)
    for d in doc_ids:
        files[d // 20].append(d)
    got = {r.doc_id: r for r in q_warc_member_index(spark, SF).collect()}
    assert set(got) == set(doc_ids)
    for fid, ds in files.items():
        off = 0
        total = sum(240 + 16 * (d % 11) for d in ds)
        for d in sorted(ds):
            mlen = 240 + 16 * (d % 11)
            r = got[d]
            assert (r.file_id, r.m_offset, r.mlen, r.file_bytes) == (
                fid, off, mlen, total)
            assert r.range_header == f"bytes={off}-{off + mlen - 1}"
            off += mlen
        # member ranges tile the file exactly
        assert off == total


def test_alt_svc_census_replay(spark):
    keys = [r.o_orderkey for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for k in keys:
        a = agg[f"h{k % 45}"]
        a[0] += 1
        if k % 4 == 0:
            a[1] += 1
            a[3] = max(a[3], 86400)
        elif k % 4 == 1:
            a[1] += 1
            a[3] = max(a[3], 60)
        elif k % 4 == 2:
            a[2] += 1
    got = {r.host_key: r for r in q_http_alt_svc(spark, SF).collect()}
    assert set(got) == set(agg)
    for h, (n, h3, cl, ma) in agg.items():
        r = got[h]
        assert (r.n_resources, r.n_h3, r.n_cleared, r.max_ma) == (
            n, h3, cl, ma)
        assert r.h3_ready == int(h3 * 2 > n and ma >= 3600)
    assert {r.h3_ready for r in got.values()} == {0, 1} or \
        all(r.h3_ready == 0 for r in got.values())
