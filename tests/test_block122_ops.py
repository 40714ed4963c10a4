"""Block-122 operators: LSH banding tuning curve, Holt linear
smoothing, letterbox detection."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (_HOLT_N, q_dedup_lsh_tuning,
                                   q_events_holt_linear)

SF = "/root/testdata/sf0.001"


def test_lsh_tuning_python_replay_and_shape(spark):
    rows = q_dedup_lsh_tuning(spark, SF).collect()
    assert len(rows) == 19 * 4
    got = {(r.s_pct, r.b, r.r): (r.p_ppm, r.s_star_pct) for r in rows}
    stars = {}
    for (s_pct, b, r), (p_ppm, star) in sorted(got.items()):
        x = (s_pct / 5) / 20.0
        xr = x
        e = r
        while e > 1:
            xr = xr * xr
            e //= 2
        y = 1.0 - xr
        yb = y
        e = b
        while e > 1:
            yb = yb * yb
            e //= 2
        assert p_ppm == round((1.0 - yb) * 1e6), (s_pct, b, r)
        stars.setdefault((b, r), star)
        assert star == stars[(b, r)]
    # S-curve is monotone in s for every split
    by_split = defaultdict(list)
    for (s_pct, b, r), (p_ppm, _) in sorted(got.items()):
        by_split[(b, r)].append(p_ppm)
    for ps in by_split.values():
        assert ps == sorted(ps)
    # more rows per band -> stricter threshold (higher crossover)
    assert (stars[(16, 1)] < stars[(8, 2)] < stars[(4, 4)]
            < stars[(2, 8)])


def test_holt_linear_python_replay_and_trend_sign(spark):
    ev = [(r.event_type, (r.ts.date() -
                          __import__("datetime").date(2024, 1, 1)).days)
          for r in spark.read.parquet(f"{SF}/events.parquet")
          .select("event_type", "ts").collect()]
    max_day = max(d for _, d in ev)
    counts = defaultdict(int)
    for t, d in ev:
        counts[(t, d)] += 1
    got = {r.event_type: r for r in
           q_events_holt_linear(spark, SF).collect()}
    types = {t for t, _ in ev}
    assert set(got) == types
    for t in types:
        ys = [counts.get((t, d), 0)
              for d in range(max_day - (_HOLT_N - 1), max_day + 1)]
        l, b = float(ys[0]), float(ys[1] - ys[0])
        for y in ys[1:]:
            ln = (y + l + b) / 2.0
            b = ((ln - l) + b) / 2.0
            l = ln
        r = got[t]
        assert r.level_u == round(l * 16384)
        assert r.trend_u == round(b * 16384)
        for h in (1, 2, 3):
            assert getattr(r, f"f{h}_u") == round((l + h * b) * 16384)
        # forecasts march along the trend line exactly
        assert r.f2_u - r.f1_u == r.f3_u - r.f2_u


def test_detect_letterbox_kernel_cases(spark):
    from genesis_spark.operators.multimodal import (detect_letterbox,
                                                    encode_gray8)

    w, h = 6, 10
    content = bytes((7 * i + 3) % 256 for i in range(w))

    def img(top, bot, bar_val=16):
        rows = []
        for r in range(h):
            if r < top or r >= h - bot:
                rows.append(bytes([bar_val] * w))
            else:
                rows.append(content)
        return encode_gray8(w, h, b"".join(rows))

    data = [
        (1, img(0, 0)),               # clean
        (2, img(2, 2)),               # classic letterbox
        (3, img(3, 0)),               # one-sided
        (4, img(2, 2, bar_val=200)),  # bright band: NOT letterbox
        (5, b"\x00\x01"),             # poison: skipped
    ]
    df = spark.createDataFrame(data, "doc_id long, media_blob binary")
    got = {r.doc_id: r for r in detect_letterbox(df).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert (got[1].top_bars, got[1].bottom_bars,
            got[1].letterboxed) == (0, 0, 0)
    assert (got[2].top_bars, got[2].bottom_bars,
            got[2].content_h, got[2].letterboxed) == (2, 2, 6, 1)
    assert (got[3].top_bars, got[3].bottom_bars) == (3, 0)
    assert (got[4].top_bars, got[4].bottom_bars,
            got[4].letterboxed) == (0, 0, 0)
