"""Block-45 operators: lang confusion, WARC/CDX audit, politeness audit."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import re

import duckdb

from genesis_spark.operators.textstats import LANG_MARKERS
from genesis_spark.queries import (q_politeness_audit,
                                   q_text_lang_confusion, q_warc_cdx_audit)

SF = "/root/testdata/sf0.001"


def _detect(text):
    if re.search("[一-鿿]", text):
        return "zh"
    toks = text.lower().split(" ")
    hits = {lang: sum(1 for t in toks if t in set(m))
            for lang, m in LANG_MARKERS.items()}
    en, fr, es, de = hits["en"], hits["fr"], hits["es"], hits["de"]
    if en > 0 and en >= fr and en >= es and en >= de:
        return "en"
    if fr > 0 and fr >= es and fr >= de:
        return "fr"
    if es > 0 and es >= de:
        return "es"
    if de > 0:
        return "de"
    return "und"


def test_lang_confusion_matches_python_replay(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT lang, text FROM '{SF}/documents.parquet' "
        "WHERE text IS NOT NULL").fetchall()
    pairs = {}
    per_decl = {}
    for lang, text in docs:
        det = _detect(text)
        pairs[(lang, det)] = pairs.get((lang, det), 0) + 1
        per_decl[lang] = per_decl.get(lang, 0) + 1
    want = {k: (n, k[0] == k[1], n * 10**6 // per_decl[k[0]])
            for k, n in pairs.items()}
    got = {(r["lang_declared"], r["lang_detected"]):
           (r["n"], r["is_match"], r["share_ppm"])
           for r in q_text_lang_confusion(spark, SF).collect()}
    assert got == want
    # diagonal must dominate for at least one declared language, and the
    # matrix must contain off-diagonal mass (the word-soup corpus isn't
    # perfectly separable) — both sides of a real confusion matrix
    assert any(m for _, m, _ in got.values())
    assert any(not m for _, m, _ in got.values())


def test_warc_cdx_audit_matches_python_replay(spark):
    con = duckdb.connect()
    ids = [int(r[0]) for r in con.execute(
        f"SELECT doc_id FROM '{SF}/documents.parquet'").fetchall()]
    counts = {"indexed_ok": 0, "missing_cdx": 0, "dangling_cdx": 0,
              "offset_mismatch": 0}
    for i in ids:
        if i % 13 == 0:
            counts["missing_cdx"] += 1
        elif i % 23 == 0:
            counts["offset_mismatch"] += 1
        else:
            counts["indexed_ok"] += 1
        if i % 17 == 0:
            counts["dangling_cdx"] += 1
    want = {k: v for k, v in counts.items() if v}
    got = {r["audit_class"]: r["n"]
           for r in q_warc_cdx_audit(spark, SF).collect()}
    assert got == want
    assert set(got) == {"indexed_ok", "missing_cdx", "dangling_cdx",
                        "offset_mismatch"}


def test_politeness_audit_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, o_custkey FROM '{SF}/orders.parquet'"
    ).fetchall()
    per = {}
    for k, c in rows:
        h = c % 40
        per.setdefault(h, []).append((k % 100000 * 37, k))
    want = {}
    for h, log in per.items():
        log.sort()
        delay = (h % 5) * 250 + 500
        gaps = [b[0] - a[0] for a, b in zip(log, log[1:])]
        want[f"h{h}"] = (delay, len(log),
                         sum(1 for g in gaps if g < delay),
                         min(gaps) if gaps else None,
                         sum(1 for g in gaps if g < delay) * 10**6
                         // max(len(log) - 1, 1))
    got = {r["host_key"]: (r["delay_ms"], r["n_fetches"],
                           r["n_violations"], r["min_gap_ms"],
                           r["violation_ppm"])
           for r in q_politeness_audit(spark, SF).collect()}
    assert got == want
    # the scrambled timeline violates somewhere and complies somewhere
    assert any(v[2] > 0 for v in got.values())
    assert any(v[2] < v[1] - 1 for v in got.values())
