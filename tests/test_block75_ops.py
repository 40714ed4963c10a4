"""Block-75 operators: three-modality interleaving, held-out LM eval,
centroid-distance OOD scoring."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math

from genesis_spark.operators import similarity as SIM
from genesis_spark.queries import (q_embeddings_ood_centroid,
                                   q_spans_multimodal3, q_text_lm_heldout)

SF = "/root/testdata/sf0.001"


def test_multimodal3_census_golden(spark):
    docs = {str(r["doc_id"]): r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["text"] is not None}
    got = {r["doc_id"]: r for r in q_spans_multimodal3(spark, SF).collect()}
    assert set(got) == set(docs)
    for d, t in docs.items():
        words = t.split(" ")
        n_ch = max((len(words) + 7) // 8, 1)
        seq, total = [], 0
        for i in range(n_ch):
            chunk = words[i * 8:i * 8 + 8]
            seq.append("section")
            total += len(chunk)
            if (i + 1) % 3 == 0:
                seq.append("image")
                total += 64
            if (i + 1) % 5 == 0:
                seq.append("audio")
                total += 128
        trans = sum(a != b for a, b in zip(seq, seq[1:]))
        r = got[d]
        assert (r["n_sections"], r["n_images"], r["n_audio"]) == \
            (seq.count("section"), seq.count("image"), seq.count("audio"))
        assert r["n_transitions"] == trans
        assert r["total_tokens"] == total


def test_lm_heldout_scores_only_heldout_split(spark):
    rows = {r["doc_id"]: r for r in q_text_lm_heldout(spark, SF).collect()}
    assert rows and all(d % 5 == 0 for d in rows)
    for r in rows.values():
        assert r["nll"] > 0
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert r["oov_ppm"] == r["n_oov"] * 10**6 // r["n_tokens"]
    # held-out docs share the synthetic vocabulary: OOV must be the
    # exception, not the rule
    tot = sum(r["n_tokens"] for r in rows.values())
    oov = sum(r["n_oov"] for r in rows.values())
    assert oov < tot // 10


def test_ood_centroid_matches_python(spark):
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in
            spark.read.parquet(f"{SF}/embeddings.parquet").collect()}
    cents = SIM.seeded_centroids(8, 64)
    got = {r["vec_id"]: r for r in
           q_embeddings_ood_centroid(spark, SF).collect()}
    assert set(got) == set(vecs)
    n_ood = 0
    for v, vec in vecs.items():
        nv = math.sqrt(sum(x * x for x in vec))
        best_c, best_s = None, None
        for c, cv in enumerate(cents):
            nc = math.sqrt(sum(x * x for x in cv))
            s = sum(a * b for a, b in zip(vec, cv)) / (nc * nv)
            if best_s is None or s > best_s + 1e-12:
                best_c, best_s = c, s
        r = got[v]
        assert r["best_cell"] == best_c
        assert abs(r["best_cos"] - round(best_s, 6)) < 2e-6
        n_ood += r["is_ood"]
    # near-random fixture vectors: both classes must be present
    assert 0 < n_ood < len(vecs)
