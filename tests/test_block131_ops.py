"""Block-131 operators: histogram equalization, offline policy replay,
HTML table extraction."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_events_policy_replay, q_media_equalize,
                                   q_text_table_extract)

SF = "/root/testdata/sf0.001"


def test_equalize_kernel_pixel_replay_and_flat_image(spark):
    import numpy as np

    from genesis_spark.operators.multimodal import (encode_gray8,
                                                    equalize_gray8)

    # hand-built 4x4: constant image maps everything to 255
    flat = encode_gray8(4, 4, bytes([9] * 16))
    # two-level image: 12 dark, 4 bright
    two = encode_gray8(4, 4, bytes([10] * 12 + [200] * 4))
    df = spark.createDataFrame([(1, flat), (2, two)],
                               "doc_id long, media_blob binary")
    got = {r.doc_id: r for r in equalize_gray8(df).collect()}
    assert (got[1].eq_min, got[1].eq_max, got[1].eq_levels) == (
        255, 255, 1)
    # two-level: cdf(10)=12 -> 12*255//16=191; cdf(200)=16 -> 255
    assert (got[2].eq_min, got[2].eq_max, got[2].eq_levels) == (
        191, 255, 2)
    assert got[2].eq_sum == 191 * 12 + 255 * 4

    # full pixel replay against the driver row for a sample of docs
    rows = {r.doc_id: r for r in q_media_equalize(spark, SF).collect()}
    for d in list(rows)[:10]:
        w, h = 8 + d % 16, 8 + (d // 3) % 16
        px = np.array([(d * 31 + i * 7) % 256 for i in range(w * h)],
                      dtype=np.int64)
        cdf = np.cumsum(np.bincount(px, minlength=256))
        lut = cdf * 255 // px.size
        eq = lut[px]
        r = rows[d]
        assert (r.eq_sum, r.eq_min, r.eq_max, r.eq_levels) == (
            int(eq.sum()), int(eq.min()), int(eq.max()),
            len(np.unique(eq)))


def test_policy_replay_estimator(spark):
    evs = [(r.ts.hour // 6, r.event_id % 3, int(r.value > 256)) for r in
           spark.read.parquet(f"{SF}/events.parquet")
           .select("ts", "event_id", "value").collect()]
    pols = {"always0": lambda x: 0,
            "by_context": lambda x: x % 3,
            "mirror": lambda x: (x + 1) % 3}
    got = {r.policy: r for r in
           q_events_policy_replay(spark, SF).collect()}
    assert set(got) == set(pols)
    for name, fn in pols.items():
        matched = [(a, rw) for x, a, rw in evs if fn(x) == a]
        n_m = len(matched)
        n_r = sum(rw for _, rw in matched)
        r = got[name]
        assert (r.n_rounds, r.n_matched, r.n_reward) == (
            len(evs), n_m, n_r)
        assert r.value_ppm == n_r * 1000000 // max(n_m, 1)
        assert r.match_ppm == n_m * 1000000 // len(evs)
    # replay property: match rate ~1/3 per policy (logged arms uniform)
    for r in got.values():
        assert 150000 < r.match_ppm < 550000


def test_table_extract_grid_replay(spark):
    doc_ids = [r.doc_id for r in
               spark.read.parquet(f"{SF}/documents.parquet")
               .select("doc_id").collect() if r.doc_id % 4 == 1]
    got = defaultdict(dict)
    for r in q_text_table_extract(spark, SF).collect():
        got[r.doc_id][(r.row_idx, r.col_idx)] = (r.cell, r.is_header)
    assert set(got) == set(doc_ids)
    for d in doc_ids:
        n_rows = d % 3 + 2
        cells = got[d]
        # grid shape: (1 + n_rows) rows x 3 cols
        assert set(cells) == {(ri, ci)
                              for ri in range(n_rows + 1)
                              for ci in range(3)}
        assert cells[(0, 0)] == ("name", 1)
        assert cells[(0, 2)] == ("note", 1)
        for r_ in range(1, n_rows + 1):
            assert cells[(r_, 0)] == (f"item{d + r_}", 0)
            assert cells[(r_, 1)] == (str((d * 7 + r_ * 3) % 100), 0)
            assert cells[(r_, 2)] == (f"n{r_}", 0)
