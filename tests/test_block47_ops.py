"""Block-47 operators: RAG chunking, assortativity, temperature mix."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
import math

import duckdb

from genesis_spark.queries import (q_corpus_mix_temperature,
                                   q_graph_assortativity,
                                   q_text_rag_chunks)

SF = "/root/testdata/sf0.001"


def test_rag_chunks_matches_python_replay(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' "
        "WHERE text IS NOT NULL").fetchall()
    want = {}
    for doc_id, text in docs:
        ws = text.split(" ")
        starts = list(range(1, max(len(ws), 1) + 1, 48))
        for cid, s in enumerate(starts):
            chunk = ws[s - 1:s + 63]
            want[(doc_id, cid)] = (
                s, len(chunk),
                hashlib.md5(" ".join(chunk).encode()).hexdigest())
    got = {(r["doc_id"], r["chunk_id"]):
           (r["start_pos"], r["n_tokens"], r["chunk_md5"])
           for r in q_text_rag_chunks(spark, SF).collect()}
    assert got == want
    # overlap property: consecutive chunks share 16 tokens (stride 48 of
    # window 64) whenever the next chunk is full-size
    by_doc = {}
    for (d, cid), v in got.items():
        by_doc.setdefault(d, {})[cid] = v
    multi = [c for c in by_doc.values() if len(c) >= 2]
    assert multi
    for c in multi:
        for cid in range(len(c) - 1):
            assert c[cid + 1][0] - c[cid][0] == 48
            # a non-final chunk reaches past the next start, i.e. >= 49
            # tokens (overlap = n_tokens - 48); it is the full 64 only
            # when the doc has >= start+63 tokens left
            assert c[cid][1] >= 49
    assert any(v[1] == 64 for c in multi for v in c.values())


def test_assortativity_matches_python_replay(spark):
    con = duckdb.connect()
    pairs = con.execute(
        f"SELECT o_orderkey, o_custkey FROM '{SF}/orders.parquet'"
    ).fetchall()
    edges = {(f"h{k % 50}", f"h{c % 50}") for k, c in pairs
             if k % 50 != c % 50}
    outd, ind = {}, {}
    for s, d in edges:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    xs = [(outd[s], ind[d]) for s, d in edges]
    m = len(xs)
    sx = sum(x for x, _ in xs)
    sy = sum(y for _, y in xs)
    sxy = sum(x * y for x, y in xs)
    sxx = sum(x * x for x, _ in xs)
    syy = sum(y * y for _, y in xs)
    r = ((m * sxy - sx * sy) /
         math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy)))
    row = q_graph_assortativity(spark, SF).collect()[0]
    assert (row["m"], row["sx"], row["sy"], row["sxy"], row["sxx"],
            row["syy"]) == (m, sx, sy, sxy, sxx, syy)
    assert row["r_4dp"] == math.floor(r * 1e4 + 0.5) / 1e4
    assert -1.0 <= row["r_4dp"] <= 1.0


def test_mix_temperature_matches_python_replay(spark):
    con = duckdb.connect()
    counts = dict(con.execute(
        f"SELECT lang, count(*) FROM '{SF}/documents.parquet' "
        "WHERE text IS NOT NULL GROUP BY lang").fetchall())
    n_total = sum(counts.values())
    s_q = {lang: int(math.floor(math.sqrt(n / n_total) * 1e6 + 0.5))
           for lang, n in counts.items()}
    s_total = sum(s_q.values())
    want = {}
    for lang, n in counts.items():
        nat = n * 10**6 // n_total
        t2 = s_q[lang] * 10**6 // s_total
        want[lang] = (n, nat, t2, t2 > nat)
    got = {r["lang"]: (r["n_docs"], r["natural_ppm"],
                       r["t2_weight_ppm"], r["upsampled"])
           for r in q_corpus_mix_temperature(spark, SF).collect()}
    assert got == want
    # temperature scaling flattens: the largest language is DOWN-weighted
    # and the smallest is UP-weighted (strictly, unless already uniform)
    if len(set(counts.values())) > 1:
        big = max(counts, key=lambda k: (counts[k], k))
        small = min(counts, key=lambda k: (counts[k], k))
        assert got[big][2] < got[big][1]
        assert got[small][2] > got[small][1]
    # weights sum to ~1e6 (integer floor slack bounded by #langs)
    s = sum(v[2] for v in got.values())
    assert 10**6 - len(got) <= s <= 10**6
