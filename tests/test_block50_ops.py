"""Block-50 operators: KMV overlap, split leakage, discovery curve."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
import re

import duckdb

from genesis_spark.queries import (q_frontier_discovery_curve,
                                   q_split_leakage_audit,
                                   q_url_kmv_overlap)

SF = "/root/testdata/sf0.001"


def test_kmv_overlap_matches_python_replay(spark):
    con = duckdb.connect()
    keys = con.execute(
        f"SELECT DISTINCT o_orderkey % 1500 FROM '{SF}/orders.parquet'"
    ).fetchall()
    mem = {}
    for (u,) in keys:
        in_a, in_b = u % 3 != 0, u % 2 != 0
        if in_a or in_b:
            h = int(hashlib.md5(
                f"http://site/u{u}".encode()).hexdigest()[:15], 16)
            mem[u] = (in_a, in_b, h)
    exact_a = sum(a for a, _, _ in mem.values())
    exact_b = sum(b for _, b, _ in mem.values())
    exact_inter = sum(a and b for a, b, _ in mem.values())
    exact_union = len(mem)
    topk = sorted(mem.values(), key=lambda t: t[2])[:32]
    kth = topk[-1][2]
    n_both = sum(a and b for a, b, _ in topk)
    est_union = 31 * ((1 << 60) // kth)
    row = q_url_kmv_overlap(spark, SF).collect()[0]
    assert (row["exact_a"], row["exact_b"], row["exact_inter"],
            row["exact_union"]) == (exact_a, exact_b, exact_inter,
                                    exact_union)
    assert row["est_union"] == est_union
    assert row["est_inter"] == n_both * est_union // 32
    assert row["jaccard_est_ppm"] == n_both * 1_000_000 // 32
    assert row["jaccard_exact_ppm"] == \
        exact_inter * 1_000_000 // exact_union
    # the union estimate should land within 2x of truth even at k=32
    assert exact_union / 2 <= row["est_union"] <= exact_union * 2


def test_split_leakage_matches_python_replay(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    corpus = list(docs)
    for doc_id, text in docs:
        if doc_id % 2 == 0:
            t = text if doc_id % 5 == 0 else (
                re.sub(r" [^ ]+$", "", text) if text is not None
                else None)
            corpus.append((doc_id + 100000, t))
    corpus = [(d, t) for d, t in corpus if t is not None]

    def split_of(doc_id):
        b = int(hashlib.md5(
            f"split-v1|{doc_id}".encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 90 else ("val" if b < 95 else "test")

    clusters = {}
    for doc_id, text in corpus:
        clusters.setdefault(
            hashlib.md5(text.encode()).hexdigest(), []).append(doc_id)
    want = {s: [0, 0, 0] for s in ("train", "val", "test")}
    for members in clusters.values():
        splits = [split_of(d) for d in members]
        multi = len(members) > 1
        has_train = "train" in splits
        for s in splits:
            want[s][0] += 1
            want[s][1] += multi
            want[s][2] += multi and has_train and s != "train"
    got = {r["split"]: [r["n_docs"], r["n_in_multi_clusters"],
                        r["n_leaked_from_train"]]
           for r in q_split_leakage_audit(spark, SF).collect()}
    assert got == want
    # leakage must actually occur in the fixture
    assert got["val"][2] + got["test"][2] > 0


def test_discovery_curve_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, o_custkey FROM '{SF}/orders.parquet'"
    ).fetchall()
    first, enc = {}, {}
    for k, c in rows:
        wave, url = c % 8, (k * (c + 1)) % 2000
        enc[wave] = enc.get(wave, 0) + 1
        if url not in first or wave < first[url]:
            first[url] = wave
    disc = {}
    for w in first.values():
        disc[w] = disc.get(w, 0) + 1
    got = {r["wave"]: (r["n_encounters"], r["n_discovered"],
                       r["cum_distinct"], r["novelty_ppm"])
           for r in q_frontier_discovery_curve(spark, SF).collect()}
    cum = 0
    for w in sorted(enc):
        d = disc.get(w, 0)
        cum += d
        assert got[w] == (enc[w], d, cum,
                          d * 1_000_000 // enc[w]), w
    # novelty must decay: the last wave discovers less than the first
    waves = sorted(got)
    assert got[waves[-1]][3] < got[waves[0]][3]
