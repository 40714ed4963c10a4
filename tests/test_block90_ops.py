"""Block-90 operators: triplet-margin audit, dead-host quarantine,
greedy budgeted curation."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math

from genesis_spark.queries import (q_corpus_greedy_select,
                                   q_embeddings_triplet_audit,
                                   q_frontier_quarantine)

SF = "/root/testdata/sf0.001"


def test_triplet_audit_golden(spark):
    rows = sorted(
        [(r["vec_id"], r["label"], [float(x) for x in r["embedding"]])
         for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()])
    by_label = {}
    for vid, lab, _ in rows:
        by_label.setdefault(lab, []).append(vid)
    emb = {vid: v for vid, _, v in rows}
    lab = {vid: l for vid, l, _ in rows}

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(sum(x * y for x, y in zip(a, b)) / (na * nb), 6)

    per = {}
    ids = [vid for vid, _, _ in rows]
    for i, vid in enumerate(ids):
        mine = by_label[lab[vid]]
        j = mine.index(vid)
        pos = mine[j + 1] if j + 1 < len(mine) else mine[0]
        if pos == vid:
            continue
        if i + 1 >= len(ids):
            continue
        cand = ids[i + 1]
        if lab[cand] == lab[vid]:
            continue
        viol = int(cos(emb[vid], emb[pos])
                   < cos(emb[vid], emb[cand]) + 0.05)
        t, v = per.get(lab[vid], (0, 0))
        per[lab[vid]] = (t + 1, v + viol)
    got = {r["label"]: r for r in
           q_embeddings_triplet_audit(spark, SF).collect()}
    assert set(got) == set(per)
    for l, (t, v) in per.items():
        r = got[l]
        assert (r["n_triplets"], r["n_violations"]) == (t, v)
        assert r["violation_ppm"] == v * 10**6 // t
    # near-random fixture labels carry little metric signal: violations
    # land in the informative middle, not 0 and not 100%
    tot_t = sum(t for t, _ in per.values())
    tot_v = sum(v for _, v in per.values())
    assert 0 < tot_v < tot_t


def test_quarantine_backoff_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    per = {}
    for k in keys:
        h = f"h{k % 499}"
        fs, ls = per.get(h, (-1, 10**9))
        per[h] = (max(fs, k % 9), min(ls, 100 - k % 40 - 1))
    got = {r["host_key"]: r for r in
           q_frontier_quarantine(spark, SF).collect()}
    assert set(got) == set(per)
    for h, (fs, ls) in per.items():
        r = got[h]
        bo = 1 << min(fs, 6)
        assert (r["fail_streak"], r["last_success_round"]) == (fs, ls)
        assert r["backoff_rounds"] == bo
        assert r["next_probe_round"] == ls + bo
        assert r["is_quarantined"] == int(fs >= 3)
        assert r["probe_now"] == int(fs < 3 or ls + bo <= 100)
    # the cap holds: backoff never exceeds 64 rounds
    assert max(r["backoff_rounds"] for r in got.values()) <= 64
    # both quarantined-and-waiting and quarantined-but-due hosts exist
    qs = [r for r in got.values() if r["is_quarantined"]]
    assert any(r["probe_now"] for r in qs)


def test_greedy_select_budget_golden(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "source", "text").collect()
    rows = []
    for r in docs:
        if r["text"] is None:
            continue
        n = len(r["text"].split(" "))
        q = (r["doc_id"] * 37) % 1000 + 1
        rows.append((r["doc_id"], r["source"], n, q, q * 1000 // n))
    rows.sort(key=lambda x: (-x[4], x[0]))
    cum = 0
    sel = set()
    for did, _, n, _, _ in rows:
        cum += n
        if cum <= 20000:
            sel.add(did)
    per = {}
    for did, src, n, q, _ in rows:
        nd, ns, ts, qs, tt = per.get(src, (0, 0, 0, 0, 0))
        s = did in sel
        per[src] = (nd + 1, ns + s, ts + n * s, qs + q * s, tt + n)
    got = {r["source"]: r for r in q_corpus_greedy_select(spark, SF).collect()}
    assert set(got) == set(per)
    for src, (nd, ns, ts, qs, tt) in per.items():
        r = got[src]
        assert (r["n_docs"], r["n_selected"], r["tokens_selected"],
                r["quality_selected"], r["tokens_total"]) == \
            (nd, ns, ts, qs, tt)
        assert r["select_ppm"] == ts * 10**6 // tt
    # the budget binds: selected mass is near but never over 20k
    total_sel = sum(r["tokens_selected"] for r in got.values())
    assert 0 < total_sel <= 20000
    # curation pays: selected docs' mean quality beats the corpus mean
    qual_sel = sum(r["quality_selected"] for r in got.values())
    n_sel = sum(r["n_selected"] for r in got.values())
    all_q = [q for _, _, _, q, _ in rows]
    assert qual_sel / n_sel > sum(all_q) / len(all_q)
