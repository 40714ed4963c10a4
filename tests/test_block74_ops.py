"""Block-74 operators: content-defined chunking, weighted fair queuing,
image entropy gate."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
from collections import defaultdict

from genesis_spark.queries import (q_dedup_cdc_chunks, q_frontier_wfq,
                                   q_media_entropy_filter)

SF = "/root/testdata/sf0.001"


def _cdc_chunks(text):
    cuts = sorted({p + 8 for p in range(max(len(text) - 8, 0) + 1)
                   if len(text) >= 8
                   and hashlib.md5(
                       text[p:p + 8].encode()).hexdigest()[0] == "0"}
                  | {len(text)})
    prev, out = 0, []
    for c in cuts:
        if c > prev:
            out.append(text[prev:c])
            prev = c
    return out


def test_cdc_boundaries_content_defined(spark):
    # the CDC property: prepending text re-chunks only the prefix —
    # the tail chunks (after the first boundary past the edit) survive
    a = "the quick brown fox jumps over the lazy dog " * 8
    b = "INSERTED PREFIX " + a
    ca, cb = _cdc_chunks(a), _cdc_chunks(b)
    assert len(ca) > 2
    # everything after the perturbed neighborhood re-aligns exactly:
    # the tail chunk SEQUENCE of b equals a's sequence minus its head
    assert cb[-(len(ca) - 1):] == ca[1:]


def test_cdc_chunks_find_twin_overlap(spark):
    rows = q_dedup_cdc_chunks(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_docs"] >= 2
        assert r["n_chunks"] >= r["n_docs"]
        assert r["chunk_len"] >= 1
    # twin corpus: shared chunks must be plentiful (every exact twin
    # shares every chunk with its original)
    assert len(rows) > 100


def test_wfq_fairness_and_recurrence(spark):
    rows = q_frontier_wfq(spark, SF).collect()
    by_host = defaultdict(list)
    for r in rows:
        by_host[r["host"]].append(r)
    # replay the sequential recurrence per host and compare
    for host, items in by_host.items():
        items.sort(key=lambda r: (r["arrival"], r["url_id"]))
        f = 0
        for it in items:
            f = max(f, it["arrival"]) + it["cost_scaled"]
            assert it["vfinish"] == f, (host, it["url_id"])
    # global slots are a permutation ordered by vfinish
    slots = sorted(rows, key=lambda r: r["slot"])
    assert [r["slot"] for r in slots] == list(range(1, len(rows) + 1))
    vf = [r["vfinish"] for r in slots]
    assert vf == sorted(vf)
    # weighted fairness: higher-weight hosts pay less virtual time per
    # unit cost, so their average vfinish growth is smaller
    per_w = defaultdict(list)
    for host, items in by_host.items():
        per_w[items[0]["weight"]].append(
            max(i["vfinish"] for i in items) / len(items))
    assert min(per_w) == 1 and max(per_w) == 3
    assert sum(per_w[3]) / len(per_w[3]) < sum(per_w[1]) / len(per_w[1])


def test_entropy_filter_plants_detected(spark):
    rows = {r["doc_id"]: r for r in
            q_media_entropy_filter(spark, SF).collect()}
    for doc_id, r in rows.items():
        if doc_id % 9 == 0:
            # constant fill: zero entropy, one bin owns everything
            assert r["entropy_e6"] == 0
            assert r["max_bin_ppm"] == 1_000_000
            assert r["keep"] == 0
        else:
            # the cyclic synth is near-uniform across bins
            assert r["entropy_e6"] > 500_000
            assert r["keep"] == 1
