"""Block-57 operators: Kneser-Ney bigram LM, RFM segmentation, gray8
intensity histogram."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import re
from collections import Counter, defaultdict

import duckdb

from genesis_spark.queries import (q_events_rfm, q_media_color_histogram,
                                   q_text_kn_bigram)

SF = "/root/testdata/sf0.001"


def test_kn_bigram_matches_python_replay(spark):
    con = duckdb.connect()
    texts = [r[0] for r in con.execute(
        f"SELECT text FROM '{SF}/documents.parquet' "
        f"WHERE text IS NOT NULL").fetchall()]
    c12: Counter = Counter()
    for t in texts:
        ws = [w for w in re.split(r"[^a-z]+", t.lower()) if len(w) >= 2]
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1
    c1: Counter = Counter()
    n1p_w1: Counter = Counter()
    n1p_w2: Counter = Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        n1p_w1[a] += 1
        n1p_w2[b] += 1
    tt = len(c12)
    scored = []
    for (a, b), c in c12.items():
        if c < 2:
            continue
        ppm = ((4 * c - 3) * 1_000_000) // (4 * c1[a]) + \
              (3 * n1p_w1[a] * n1p_w2[b] * 1_000_000) // (4 * c1[a] * tt)
        scored.append((a, b, c, ppm))
    scored.sort(key=lambda t: (-t[3], t[0], t[1]))
    expect = [(a, b, c, p, r + 1)
              for r, (a, b, c, p) in enumerate(scored[:50])]
    got = sorted(((r["w1"], r["w2"], r["c12"], r["kn_ppm"], r["rank"])
                  for r in q_text_kn_bigram(spark, SF).collect()),
                 key=lambda t: t[4])
    assert got == expect
    # a smoothed conditional probability never exceeds 1
    assert all(p <= 1_000_000 for *_, p, _ in got)
    # the discount means even a deterministic bigram scores below 1
    assert all(p < 1_000_000 for *_, p, _ in got)


def _ntile5(ordered_ids):
    n = len(ordered_ids)
    out = {}
    base, extra = divmod(n, 5)
    i = 0
    for tile in range(1, 6):
        size = base + (1 if tile <= extra else 0)
        for _ in range(size):
            out[ordered_ids[i]] = tile
            i += 1
    return out


def test_rfm_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, CAST(ts AS DATE), CAST(round(value*100) AS "
        f"BIGINT) FROM '{SF}/events.parquet' "
        f"WHERE event_type = 'purchase'").fetchall()
    gmax = max(r[1] for r in rows)
    agg = defaultdict(lambda: [None, 0, 0])
    for uid, d, cents in rows:
        a = agg[uid]
        a[0] = d if a[0] is None or d > a[0] else a[0]
        a[1] += 1
        a[2] += cents
    users = {u: ((gmax - a[0]).days, a[1], a[2])
             for u, a in agg.items()}
    r_map = _ntile5(sorted(users, key=lambda u: (-users[u][0], u)))
    f_map = _ntile5(sorted(users, key=lambda u: (users[u][1], u)))
    m_map = _ntile5(sorted(users, key=lambda u: (users[u][2], u)))
    got = {r["user_id"]: r for r in q_events_rfm(spark, SF).collect()}
    assert set(got) == set(users)
    for u, (rec, freq, mon) in users.items():
        g = got[u]
        assert (g["recency_d"], g["frequency"],
                g["monetary_cents"]) == (rec, freq, mon)
        assert (g["r_score"], g["f_score"], g["m_score"]) == (
            r_map[u], f_map[u], m_map[u])
        assert g["segment"] == r_map[u] * 100 + f_map[u] * 10 + m_map[u]


def test_gray8_histogram_replay_and_shape(spark):
    got = defaultdict(dict)
    for r in q_media_color_histogram(spark, SF).collect():
        got[r["doc_id"]][r["bin"]] = (r["n_px"], r["ppm"])
    # every image emits exactly the 16-bin grid, zero bins included
    assert all(sorted(bins) == list(range(16)) for bins in got.values())
    for doc_id in [0, 1, 7, 123]:
        w, h = 8 + doc_id % 16, 8 + (doc_id // 3) % 16
        counts = Counter(((doc_id * 31 + i * 7) % 256) // 16
                         for i in range(w * h))
        for b in range(16):
            n = counts.get(b, 0)
            assert got[doc_id][b] == (n, n * 1_000_000 // (w * h))
        assert sum(n for n, _ in got[doc_id].values()) == w * h
