"""Block-84 operators: Benford first-digit test, dialog-turn census,
URL-shortener detection."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
import math

from genesis_spark.queries import (q_events_benford, q_text_dialog_turns,
                                   q_url_shortener_detect)

SF = "/root/testdata/sf0.001"


def test_benford_chi2_golden(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("event_type", "value").collect()
    per = {}
    for r in ev:
        cents = int(round(r["value"] * 100))
        if cents <= 0:
            continue
        d = int(str(cents)[0])
        per.setdefault(r["event_type"], {})
        per[r["event_type"]][d] = per[r["event_type"]].get(d, 0) + 1
    exp_ppm = {d: round(math.log10(1 + 1 / d) * 10**6)
               for d in range(1, 10)}
    got = {r["event_type"]: r for r in q_events_benford(spark, SF).collect()}
    assert set(got) == set(per)
    for et, digits in per.items():
        tot = sum(digits.values())
        chi2 = sum((n - exp_ppm[d] * tot / 1e6) ** 2
                   / (exp_ppm[d] * tot / 1e6)
                   for d, n in digits.items())
        r = got[et]
        assert r["n_values"] == tot
        assert r["n_digits"] == len(digits)
        assert abs(r["chi2"] - round(chi2, 4)) < 2e-3
        assert r["benford_ok"] == int(r["chi2"] <= 15.507)
    # all 9 digit cells populated and the statistic is non-degenerate
    assert all(r["n_digits"] == 9 for r in got.values())
    assert all(r["chi2"] > 0 for r in got.values())


def test_dialog_turns_census_golden(spark):
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["text"] is not None}
    got = {r["doc_id"]: r for r in q_text_dialog_turns(spark, SF).collect()}
    assert set(got) == set(docs)
    for d, t in docs.items():
        w = t.split(" ")
        nt = max((len(w) + 8) // 9, 1)
        nspk = d % 2 + 2
        speakers = [i % nspk for i in range(nt)]
        toks = [len(w[i * 9:i * 9 + 9]) for i in range(nt)]
        alt = sum(a != b for a, b in zip(speakers, speakers[1:]))
        r = got[d]
        assert r["n_turns"] == nt
        assert r["n_speakers"] == len(set(speakers))
        assert r["n_tokens"] == sum(toks)
        assert r["n_alt"] == alt
        assert r["mean_turn_centitok"] == sum(toks) * 100 // nt
        want_ppm = alt * 10**6 // (nt - 1) if nt > 1 else 0
        assert r["alternation_ppm"] == want_ppm
        # round-robin speakers never repeat consecutively: perfect
        # alternation whenever there is more than one turn
        if nt > 1:
            assert r["alternation_ppm"] == 10**6


def test_shortener_detect_routes_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    per = {}
    for k in keys:
        if k % 4 == 0:
            h = "sh.rt"
        elif k % 4 == 1:
            h = "tiny.onion"
        elif k % 4 == 2:
            h = "docs.site.onion"
        else:
            h = "mix.onion"
        if k % 4 < 2:
            p = hashlib.md5(str(k).encode()).hexdigest()[:7]
        elif k % 4 == 2:
            p = f"guides/install-{k % 30}.html"
        elif k % 8 == 3:
            p = hashlib.md5(str(k).encode()).hexdigest()[:7]
        else:
            p = f"blog/post-{k % 40}"
        per.setdefault(h, []).append(p)
    import re
    got = {r["host_key"]: r for r in
           q_url_shortener_detect(spark, SF).collect()}
    assert set(got) == set(per)
    for h, paths in per.items():
        opaque = sum(bool(re.fullmatch(r"[a-z0-9]{5,10}", p))
                     and "/" not in p and "." not in p for p in paths)
        r = got[h]
        assert r["n_urls"] == len(paths)
        assert r["n_opaque"] == opaque
        assert r["path_chars"] == sum(len(p) for p in paths)
        ppm = opaque * 10**6 // len(paths)
        assert r["opaque_ppm"] == ppm
        assert r["is_shortener"] == int(ppm >= 800000 and len(paths) >= 20)
    # the router must separate the classes: both shorteners flagged,
    # the docs site and the mixed host not
    assert got["sh.rt"]["is_shortener"] == 1
    assert got["tiny.onion"]["is_shortener"] == 1
    assert got["docs.site.onion"]["is_shortener"] == 0
    assert got["mix.onion"]["is_shortener"] == 0
