"""Block-40 operators: content-type routing, outlink diversity, MMR."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math

import duckdb

from genesis_spark.queries import (q_embeddings_mmr_rerank,
                                   q_host_outlink_diversity,
                                   q_http_content_type)

SF = "/root/testdata/sf0.001"


def test_content_type_parse_and_route(spark):
    got = {(r["mime"], r["charset"]): (r["route"], r["n"])
           for r in q_http_content_type(spark, SF).collect()}
    # the 5 synthesized header shapes, each parsed + routed correctly —
    # including the quoted upper-case charset and the missing charset
    assert set(got) == {("text/html", "utf-8"),
                        ("text/html", "iso-8859-1"),
                        ("application/pdf", "none"),
                        ("image/png", "none"),
                        ("text/plain", "utf-8")}
    assert got[("text/html", "utf-8")][0] == "parse"
    assert got[("text/html", "iso-8859-1")][0] == "parse"
    assert got[("text/plain", "utf-8")][0] == "parse_text"
    assert got[("image/png", "none")][0] == "media"
    assert got[("application/pdf", "none")][0] == "skip"
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM '{SF}/documents.parquet'").fetchone()[0]
    assert sum(n for _, n in got.values()) == n_docs


def test_outlink_diversity_python_replay(spark):
    con = duckdb.connect()
    pairs = con.execute(
        f"SELECT o_orderkey, o_custkey FROM '{SF}/orders.parquet'"
    ).fetchall()
    per = {}
    for k, c in pairs:
        per.setdefault(f"h{k % 50}", {}).setdefault(f"h{c % 50}", 0)
        per[f"h{k % 50}"][f"h{c % 50}"] += 1
    want = {}
    for src, by_dst in per.items():
        n = sum(by_dst.values())
        sq = sum(v * v for v in by_dst.values())
        want[src] = (n, len(by_dst), max(by_dst.values()) * 10**6 // n,
                     (n * n - sq) * 10**6 // (n * n))
    got = {r["host_key"]: (r["n_links"], r["n_targets"],
                           r["top_share_ppm"], r["simpson_ppm"])
           for r in q_host_outlink_diversity(spark, SF).collect()}
    assert got == want
    # Simpson bounds: 0 (silo) <= D < 1, and a host with one target is 0
    assert all(0 <= v[3] < 10**6 for v in got.values())


def _mmr_python_replay(sf_dir, k_cand=10, k_sel=5):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    vecs = {int(v): [float(x) for x in e] for v, e in rows}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) *
                      math.sqrt(sum(y * y for y in b)))

    out = {}
    for qid in [v for v in vecs if v < 10]:
        rel = {nid: cos(vecs[qid], vecs[nid])
               for nid in vecs if nid != qid}
        cand = sorted(rel, key=lambda n: (-rel[n], n))[:k_cand]
        sel = [min(cand, key=lambda n: (-rel[n], n))]
        while len(sel) < k_sel:
            rest = [c for c in cand if c not in sel]
            scored = {c: 2 * rel[c] - max(cos(vecs[c], vecs[s])
                                          for s in sel) for c in rest}
            sel.append(min(rest, key=lambda c: (-scored[c], c)))
        for rank, nid in enumerate(sel, start=1):
            out[(qid, rank)] = nid
    return out


import pytest


@pytest.mark.slow  # deep unrolled greedy plan + O(|Q| x |corpus|) replay
def test_mmr_matches_python_replay(spark):
    got = {(r["query_id"], r["mmr_rank"]): r["neighbor_id"]
           for r in q_embeddings_mmr_rerank(spark, SF).collect()}
    want = _mmr_python_replay(SF)
    assert got == want
    # 5 distinct picks per query; rank 1 is the plain top-1 (MMR's greedy
    # seed is pure relevance)
    by_q = {}
    for (qid, rank), nid in got.items():
        by_q.setdefault(qid, {})[rank] = nid
    assert all(sorted(v) == [1, 2, 3, 4, 5]
               and len(set(v.values())) == 5 for v in by_q.values())
    # MMR diversifies: rank 1 always equals the pure-relevance top-1
    # (greedy seed), and for at least one query some later rank deviates
    # from the pure-relevance order (else the penalty term did nothing)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    vecs = {int(v): [float(x) for x in e] for v, e in rows}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) *
                      math.sqrt(sum(y * y for y in b)))

    deviated = False
    for qid, picks in by_q.items():
        rel = {n: cos(vecs[qid], vecs[n]) for n in vecs if n != qid}
        pure = sorted(rel, key=lambda n: (-rel[n], n))[:5]
        assert picks[1] == pure[0]
        if [picks[r] for r in (2, 3, 4, 5)] != pure[1:]:
            deviated = True
    assert deviated
