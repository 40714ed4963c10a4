"""Block-38 operators: quality PR eval, inverted index, WARC revisit."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib

import duckdb

from genesis_spark.queries import (q_text_inverted_index, q_text_quality_pr,
                                   q_warc_revisit)

SF = "/root/testdata/sf0.001"


def test_quality_pr_monotone_and_consistent(spark):
    rows = {r["threshold"]: r for r in q_text_quality_pr(spark, SF).collect()}
    assert sorted(rows) == [10, 30, 50, 70, 90]
    # tp + fn = total positives is threshold-invariant
    positives = {t: r["tp"] + r["fn"] for t, r in rows.items()}
    assert len(set(positives.values())) == 1
    # raising the threshold can only shrink the predicted-positive set:
    # tp and fp are non-increasing, recall non-increasing
    ts = sorted(rows)
    for lo, hi in zip(ts, ts[1:]):
        assert rows[hi]["tp"] <= rows[lo]["tp"]
        assert rows[hi]["fp"] <= rows[lo]["fp"]
        assert rows[hi]["recall_ppm"] <= rows[lo]["recall_ppm"]
    # ppm math is the exact integer form
    for r in rows.values():
        assert r["precision_ppm"] == r["tp"] * 10**6 // max(
            r["tp"] + r["fp"], 1)
        assert r["recall_ppm"] == r["tp"] * 10**6 // max(
            r["tp"] + r["fn"], 1)


def _index_python_replay(sf_dir):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "WHERE text IS NOT NULL").fetchall()
    pairs = set()
    for doc_id, text in docs:
        for term in text.lower().split(" "):
            if len(term) >= 3:
                pairs.add((term, int(doc_id)))
    df = {}
    for term, _ in pairs:
        df[term] = df.get(term, 0) + 1
    top = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    out = {}
    for term, n in top:
        plist = sorted(d for t, d in pairs if t == term)[:10]
        out[term] = (n, len(plist), ",".join(str(d) for d in plist))
    return out


def test_inverted_index_matches_python_replay(spark):
    got = {r["term"]: (r["df"], r["n_posted"], r["postings"])
           for r in q_text_inverted_index(spark, SF).collect()}
    assert got == _index_python_replay(SF)
    assert len(got) == 20
    # posting lists are ascending and capped
    for df, n_posted, postings in got.values():
        ids = [int(x) for x in postings.split(",")]
        assert ids == sorted(ids) and len(ids) == n_posted <= 10
        assert n_posted == min(df, 10)


def _revisit_python_replay(sf_dir):
    con = duckdb.connect()
    ids = [int(r[0]) for r in con.execute(
        f"SELECT doc_id FROM '{sf_dir}/documents.parquet'").fetchall()]
    out = {}
    for i in ids:
        uri = f"http://h{i % 50}.onion/p{i}"
        b1 = f"doc-{i}-body-{i % 7}"
        v2 = i % 7 + 1 if i % 3 == 0 else i % 7
        b2 = f"doc-{i}-body-{v2}"
        d1 = hashlib.md5(b1.encode()).hexdigest()
        d2 = hashlib.md5(b2.encode()).hexdigest()
        out[(uri, 1)] = (d1, "response", -1)
        if d2 == d1:
            out[(uri, 2)] = (d2, "revisit", 1)
        else:
            out[(uri, 2)] = (d2, "response", -1)
    return out


def test_warc_revisit_matches_python_replay(spark):
    got = {(r["uri"], r["crawl_round"]):
           (r["digest"], r["rec_type"], r["revisit_of"])
           for r in q_warc_revisit(spark, SF).collect()}
    want = _revisit_python_replay(SF)
    assert got == want
    # both behaviors present: unchanged pages dedup to revisit records,
    # changed pages are stored as fresh responses
    r2 = [v for (u, rd), v in got.items() if rd == 2]
    assert any(t == "revisit" for _, t, _ in r2)
    assert any(t == "response" for _, t, _ in r2)
    # every revisit points at round 1 and shares its digest with round 1
    for (uri, rd), (dg, t, ref) in got.items():
        if t == "revisit":
            assert ref == 1 and got[(uri, 1)][0] == dg
