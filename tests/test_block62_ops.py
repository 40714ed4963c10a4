"""Block-62 operators: security-header posture grades, language-variant
URL families, Gini traffic concentration."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_events_gini, q_http_security_headers,
                                   q_url_lang_variant)

SF = "/root/testdata/sf0.001"


def test_security_header_grades_follow_planted_tiers(spark):
    rows = {r["host"]: r for r in
            q_http_security_headers(spark, SF).collect()}
    assert len(rows) == 30
    for hid in range(30):
        r, tier = rows[f"h{hid}"], hid % 5
        if tier == 0:        # full posture on every response
            assert r["grade"] == "A" and r["n_deployed"] == 4
            assert r["hsts_ppm"] == r["csp_ppm"] == 1_000_000
        elif tier == 1:      # HSTS + XCTO only
            assert r["grade"] == "C" and r["n_deployed"] == 2
            assert r["hsts_ppm"] == r["xcto_ppm"] == 1_000_000
            assert r["csp_ppm"] == r["xfo_ppm"] == 0
        elif tier == 2:      # CSP only
            assert r["grade"] == "D" and r["n_deployed"] == 1
            assert r["csp_ppm"] == 1_000_000 and r["hsts_ppm"] == 0
        elif tier == 3:      # nothing
            assert r["grade"] == "F" and r["n_deployed"] == 0
        else:                # mixed: headers on ~half the responses
            assert 300_000 <= r["hsts_ppm"] <= 700_000
            # the >= 50% majority cut decides deployment
            expect = 4 if r["hsts_ppm"] >= 500_000 else 0
            assert r["n_deployed"] == expect


def test_lang_variant_families_consolidate(spark):
    rows = q_url_lang_variant(spark, SF).collect()
    assert rows
    by_key = {(r["host"], r["stem"]): r for r in rows}
    for r in rows:
        assert r["stem"].startswith("/p")
        assert r["n_variants"] == r["n_langs"] + r["has_default"]
        assert r["dup_urls"] == r["n_variants"] - 1
        # langs string is the sorted distinct set
        langs = [x for x in r["langs"].split(",") if x]
        assert langs == sorted(set(langs))
        assert set(langs) <= {"de", "en", "fr"}
        assert len(langs) == r["n_langs"]
    # replay the synth family from the parquet keys: the observed
    # variant sets must match exactly, and full families must exist
    import pyarrow.parquet as pq
    keys = pq.read_table(f"{SF}/orders.parquet",
                         columns=["o_orderkey"])["o_orderkey"].to_pylist()
    fam: dict = {}
    lmap = {0: "", 1: "en", 2: "fr", 3: "de"}
    for k in keys:
        key = (f"h{k % 10}", f"/p{(k // 40) % 50}")
        fam.setdefault(key, set()).add(lmap[(k // 10) % 4])
    assert set(by_key) == set(fam)
    for key, variants in fam.items():
        r = by_key[key]
        assert r["has_default"] == int("" in variants)
        assert r["n_langs"] == len(variants - {""})
        assert r["langs"] == ",".join(sorted(variants - {""}))
    full = [r for r in rows if r["n_variants"] == 4]
    assert full and all(r["dup_urls"] == 3 and r["has_default"] == 1
                        and r["langs"] == "de,en,fr" for r in full)


def test_gini_matches_python_replay(spark):
    import pyarrow.parquet as pq
    row = q_events_gini(spark, SF).collect()[0]
    users = pq.read_table(f"{SF}/events.parquet",
                          columns=["user_id"])["user_id"].to_pylist()
    counts: dict = {}
    for u in users:
        counts[u] = counts.get(u, 0) + 1
    xs = sorted(counts.values())
    n, tot = len(xs), sum(xs)
    s_ix = sum(i * x for i, x in enumerate(xs, 1))
    assert row["n_users"] == n and row["total_events"] == tot
    assert row["gini_ppm"] == (2 * s_ix - (n + 1) * tot) * 10**6 // (n * tot)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    k = max(1, n // 10)
    top_events = sum(x for _, x in top[:k])
    assert row["top_decile_ppm"] == top_events * 10**6 // tot
    assert 0 <= row["gini_ppm"] <= 1_000_000
