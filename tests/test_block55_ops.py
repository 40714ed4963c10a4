"""Block-55 operators: Heaps'-law fit, journey trigrams, scheme
consolidation."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math
import re
from collections import Counter

import duckdb

from genesis_spark.queries import (q_events_path_trigrams,
                                   q_text_heaps_fit,
                                   q_url_scheme_consolidate)

SF = "/root/testdata/sf0.001"


def test_heaps_fit_matches_python_replay(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' "
        f"ORDER BY doc_id").fetchall()
    seen: set[str] = set()
    pts = []
    nn = vv = 0
    for _, text in docs:
        ws = [w for w in re.split(r"[^a-z]+", (text or "").lower())
              if len(w) >= 2]
        if not ws:
            continue
        nn += len(ws)
        for w in ws:
            if w not in seen:
                seen.add(w)
                vv += 1
        if nn >= 10 and vv >= 1:
            pts.append((nn, vv))
    n = len(pts)
    sx = sum(round(math.log(a) * 1e6) for a, _ in pts) / 1e6
    sy = sum(round(math.log(b) * 1e6) for _, b in pts) / 1e6
    sxy = sum(round(math.log(a) * math.log(b) * 1e6)
              for a, b in pts) / 1e6
    sxx = sum(round(math.log(a) ** 2 * 1e6) for a, _ in pts) / 1e6
    syy = sum(round(math.log(b) ** 2 * 1e6) for _, b in pts) / 1e6
    cov, vx, vy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    row = q_text_heaps_fit(spark, SF).collect()[0]
    assert row["n"] == n
    assert row["beta"] == round(cov / vx, 4)
    assert row["ln_k"] == round((sy - (cov / vx) * sx) / n, 4)
    assert row["r2"] == round(cov * cov / (vx * vy), 4)
    # the synthetic corpus draws from a small FIXED vocabulary, so
    # V(N) saturates almost immediately — exactly the template-text
    # signature this diagnostic exists to flag: near-zero growth
    # exponent and a poor straight-line fit in log-log space
    assert 0.0 <= row["beta"] < 0.3
    assert 0.0 <= row["r2"] < 0.5
    # vocabulary saturation: the corpus's distinct types stop growing
    assert vv < nn / 50


def test_path_trigrams_match_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_type FROM '{SF}/events.parquet' "
        f"ORDER BY user_id, ts, event_id").fetchall()
    by_user: dict[int, list[str]] = {}
    for uid, et in rows:
        by_user.setdefault(uid, []).append(et)
    c: Counter = Counter()
    for seq in by_user.values():
        for i in range(len(seq) - 2):
            c[f"{seq[i]}>{seq[i + 1]}>{seq[i + 2]}"] += 1
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = sorted(q_events_path_trigrams(spark, SF).collect(),
                 key=lambda r: r["rank"])
    assert [(r["path"], r["n_paths"]) for r in got] == expect
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_scheme_consolidate_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, o_custkey FROM '{SF}/orders.parquet'"
    ).fetchall()
    pages: dict[tuple, set] = {}
    for k, c in rows:
        pages.setdefault((f"h{c % 20}", f"/p{k % 30}"), set()).add(
            "https" if (k // 30) % 2 == 0 else "http")
    per_host: dict[str, list[int]] = {}
    for (host, _), schemes in pages.items():
        agg = per_host.setdefault(host, [0, 0, 0, 0])
        agg[0] += 1
        if schemes == {"http", "https"}:
            agg[1] += 1
        elif schemes == {"http"}:
            agg[2] += 1
        else:
            agg[3] += 1
    got = {r["host"]: r for r in
           q_url_scheme_consolidate(spark, SF).collect()}
    assert set(got) == set(per_host)
    for host, (np_, nd, nhttp, nhttps) in per_host.items():
        r = got[host]
        assert (r["n_paths"], r["n_dual"], r["n_http_only"],
                r["n_https_only"]) == (np_, nd, nhttp, nhttps)
        assert r["dual_ppm"] == nd * 1_000_000 // max(np_, 1)
    # the k//30 split over a shared path space must plant dual pages
    assert any(r["n_dual"] > 0 for r in got.values())
