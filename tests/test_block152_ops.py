"""Block-152 operators: canary scanning, Accept negotiation, temporal
group splits."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (_CANARIES, q_corpus_canary_scan,
                                   q_corpus_temporal_split,
                                   q_http_accept_negotiate)

SF = "/root/testdata/sf0.001"


def test_canary_scan_replay(spark):
    doc_ids = [r.doc_id for r in
               spark.read.parquet(f"{SF}/documents.parquet")
               .select("doc_id").collect()]
    hits = defaultdict(list)
    for d in doc_ids:
        if d % 83 == 0:
            hits[(d // 83) % 6].append(d)
    got = {r.canary_id: r for r in
           q_corpus_canary_scan(spark, SF).collect()}
    assert set(got) == set(range(6))
    for cid in range(6):
        r = got[cid]
        assert r.canary == _CANARIES[cid]
        assert r.n_docs_hit == len(hits[cid])
        assert r.first_doc == (min(hits[cid]) if hits[cid] else -1)
        assert r.contaminated == int(bool(hits[cid]))
    # the tripwire fires: at least one canary found
    assert any(r.contaminated for r in got.values())


def _negotiate(accept, offered):
    ranges = []
    for part in accept.split(","):
        part = part.strip()
        mtype = part.split(";")[0].strip()
        q = 1000
        if ";q=" in part:
            q = int(round(float(part.split(";q=")[1]) * 1000))
        ranges.append((mtype, q))

    def eff(o):
        for pred in (lambda r: r[0] == o,
                     lambda r: r[0] == o.split("/")[0] + "/*",
                     lambda r: r[0] == "*/*"):
            qs = [q for m, q in ranges if pred((m, q))]
            if qs:
                return max(qs)
        return 0

    effs = [(o, eff(o)) for o in offered]
    best = max(q for _, q in effs)
    if best <= 0:
        return "", 0, 406
    chosen = min(o for o, q in effs if q == best)
    return chosen, best, 200


def test_accept_negotiate_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    accepts = ["text/html;q=0.9, application/json",
               "application/*;q=0.5, text/html;q=0.8",
               "*/*;q=0.1", "text/plain", "text/html, */*;q=0.01"]
    got = {r.rid: r for r in q_http_accept_negotiate(spark, SF).collect()}
    statuses = set()
    for k in ks:
        offered = (["application/json", "text/html"] if k % 2 == 0
                   else ["application/xml", "text/html"])
        want = _negotiate(accepts[k % 5], offered)
        r = got[k]
        assert (r.chosen_type, r.chosen_q_milli, r.status) == want, k
        statuses.add(r.status)
    assert statuses == {200, 406}
    # specificity beats q: 'application/*;q=0.5, text/html;q=0.8'
    # against json+html must pick html at 800, not json via wildcard
    k_ex = next(k for k in ks if k % 5 == 1 and k % 2 == 0)
    assert got[k_ex].chosen_type == "text/html"
    assert got[k_ex].chosen_q_milli == 800


def test_temporal_split_replay(spark):
    doc_ids = [r.doc_id for r in
               spark.read.parquet(f"{SF}/documents.parquet")
               .select("doc_id").collect()]
    fam_min = defaultdict(lambda: 10**9)
    for d in doc_ids:
        fam_min[d % 40] = min(fam_min[d % 40], (d * 13) % 365)

    def split_of(x):
        return ("train" if x < 280 else
                "embargo" if x < 294 else "val")

    got = {r.doc_id: r for r in
           q_corpus_temporal_split(spark, SF).collect()}
    leaks = 0
    for d in doc_ids:
        date = (d * 13) % 365
        fmin = fam_min[d % 40]
        r = got[d]
        assert (r.date_index, r.family, r.fam_min_date) == (
            date, d % 40, fmin)
        assert r.split == split_of(fmin)
        assert r.would_leak == int(split_of(fmin) != split_of(date))
        leaks += r.would_leak
    # the group rule really changes assignments vs per-doc dates
    assert leaks > 0
    # family coherence: one split per family
    per_fam = defaultdict(set)
    for d in doc_ids:
        per_fam[d % 40].add(got[d].split)
    assert all(len(s) == 1 for s in per_fam.values())
