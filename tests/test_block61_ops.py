"""Block-61 operators: typosquat host detection, traffic seasonality
profile, soft-404 detection."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import datetime as dt

from genesis_spark.queries import (q_events_seasonality, q_host_typosquat,
                                   q_url_soft404_detect)

SF = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_typosquat_pairs_are_all_planted_squats(spark):
    rows = q_host_typosquat(spark, SF).collect()
    assert rows
    for r in rows:
        # every reported pair really is edit-distance-1 + asymmetric
        assert _lev(r["victim_host"], r["squat_host"]) == 1
        assert r["victim_urls"] >= 5 * r["squat_urls"]
        assert r["victim_host"].startswith("brand")
        assert (r["squat_host"].startswith("brnd")
                or r["squat_host"].startswith("brandd"))
        assert r["asym_ppm"] == r["victim_urls"] * 10**6 // r["squat_urls"]
    # all 10 brnd-deletion and all 10 brandd-insertion squats found,
    # each attributed to the single brand host one edit away
    squats = {r["squat_host"]: r["victim_host"] for r in rows}
    assert len(squats) == 20 == len(rows)
    for d in range(10):
        assert squats[f"brnd{d}.com"] == f"brand{d}.com"
        assert squats[f"brandd{d}.com"] == f"brand{d}.com"


def test_typosquat_excludes_brand_siblings_and_site_noise(spark):
    rows = q_host_typosquat(spark, SF).collect()
    for r in rows:
        # brand3 vs brand7 (distance 1, symmetric traffic) must not leak
        assert not r["squat_host"].startswith("brand") or \
            r["squat_host"].startswith("brandd")
        assert not r["squat_host"].startswith("site")
        assert not r["victim_host"].startswith("site")


def test_seasonality_cells_match_python_replay(spark):
    rows = q_events_seasonality(spark, SF).collect()
    assert rows
    import pyarrow.parquet as pq
    ts = pq.read_table(f"{SF}/events.parquet", columns=["ts"])["ts"]
    cells: dict[tuple[int, int], int] = {}
    for v in ts:
        t: dt.datetime = v.as_py()
        ep = int(t.replace(tzinfo=dt.timezone.utc).timestamp())
        key = ((ep // 86400 + 3) % 7, ep % 86400 // 3600)
        cells[key] = cells.get(key, 0) + 1
    total = sum(cells.values())
    got = {(r["dow"], r["hour"]): r for r in rows}
    assert set(got) == set(cells)
    dow_tot: dict[int, int] = {}
    for (d, _), n in cells.items():
        dow_tot[d] = dow_tot.get(d, 0) + n
    for key, n in cells.items():
        r = got[key]
        assert r["n_events"] == n
        assert r["share_ppm"] == n * 10**6 // total
        assert r["dow_share_ppm"] == n * 10**6 // dow_tot[key[0]]
    # exactly one peak hour per observed dow, and it is the argmax
    for d in dow_tot:
        peaks = [r for r in rows if r["dow"] == d and r["is_peak"] == 1]
        assert len(peaks) == 1
        best = max((n, -h) for (dd, h), n in cells.items() if dd == d)
        assert (peaks[0]["n_events"], -peaks[0]["hour"]) == best


def test_soft404_flags_only_planted_hosts(spark):
    rows = {r["host"]: r for r in q_url_soft404_detect(spark, SF).collect()}
    assert len(rows) == 40
    for hid in range(40):
        r = rows[f"h{hid}"]
        if hid % 7 == 0:
            assert r["soft_host"] == 1
            assert r["n_soft404"] > 0
            # soft-404 pages are the seq%5==0 non-probe rows: ~4/24
            assert 120_000 <= r["soft404_ppm"] <= 220_000
        else:
            assert r["soft_host"] == 0
            assert r["n_soft404"] == 0 and r["soft404_ppm"] == 0
