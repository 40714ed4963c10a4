"""Block-127 operators: srcset parsing, residual VQ, uncertainty
sampling."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (_rvq_codebooks, q_corpus_uncertainty_sample,
                                   q_embeddings_rvq, q_media_srcset_parse)

SF = "/root/testdata/sf0.001"


def test_srcset_parse_python_replay(spark):
    doc_ids = [r.doc_id for r in
               spark.read.parquet(f"{SF}/documents.parquet")
               .select("doc_id").collect() if r.doc_id % 3 == 0]
    want = {}
    for d in doc_ids:
        base = f"http://h{d % 50}.onion/i{d}"
        srcset = (f"{base}_a.jpg {(d % 4) * 160 + 320}w ,  "
                  f"{base}_b.jpg   {(d % 3) + 1}x,{base}_c.jpg")
        cands = []
        for idx, raw in enumerate(srcset.split(",")):
            c = raw.strip()
            if not c:
                continue
            toks = c.split()
            url = toks[0]
            desc = toks[1] if len(toks) > 1 else None
            if desc is None:
                kind, val = "x", 1
            elif desc.endswith("w") and desc[:-1].isdigit():
                kind, val = "w", int(desc[:-1])
            elif desc.endswith("x") and desc[:-1].isdigit():
                kind, val = "x", int(desc[:-1])
            else:
                kind, val = "invalid", None
            cands.append((idx, url, kind, val))
        best = max(cands, key=lambda t: (t[2] == "w", t[3], -t[0]))
        for idx, url, kind, val in cands:
            want[(d, idx)] = (url, kind, val,
                              int((idx, url, kind, val) == best))
    got = {(r.doc_id, r.idx): (r.url, r.kind, r.val, r.is_best)
           for r in q_media_srcset_parse(spark, SF).collect()}
    assert got == want
    # width descriptors win over density; exactly one best per doc
    per_doc = {}
    for (d, _), (_, kind, _, isb) in got.items():
        per_doc.setdefault(d, []).append((kind, isb))
    for d, lst in per_doc.items():
        assert sum(b for _, b in lst) == 1
        kinds = {k for k, _ in lst}
        assert "w" in kinds
        assert next(k for k, b in lst if b) == "w"


def test_rvq_error_ladder_and_replay(spark):
    cb1, cb2 = _rvq_codebooks()
    embs = {r.vec_id: r.embedding for r in
            spark.read.parquet(f"{SF}/embeddings.parquet")
            .select("vec_id", "embedding").limit(25).collect()}
    import math

    got = {r.vec_id: r for r in q_embeddings_rvq(spark, SF).collect()}
    assert len(got) == 500
    for vid, emb in embs.items():
        v = [int(math.floor(float(x) * 1e6)) for x in emb]
        d1 = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in cb1]
        code1 = d1.index(min(d1))
        r1 = [a - b for a, b in zip(v, cb1[code1])]
        d2 = [sum((a - b) ** 2 for a, b in zip(r1, c)) for c in cb2]
        code2 = d2.index(min(d2))
        rr = got[vid]
        assert (rr.code1, rr.code2) == (code1, code2), vid
        assert rr.err0 == sum(x * x for x in v)
        assert rr.err1 == min(d1)
        assert rr.err2 == min(d2)
    # stage 2 refines: err2 <= err1 everywhere (guaranteed by the zero
    # entry in codebook 2), strictly for some vectors. err0 is the
    # zero-quantizer baseline — untrained random codebooks need not
    # beat it (isotropic 64-dim data; trained codebooks would).
    assert all(r.err1 >= r.err2 for r in got.values())
    assert any(r.err1 > r.err2 for r in got.values())
    # codes actually spread over the books
    assert len({r.code1 for r in got.values()}) >= 2
    # stage 2 genuinely fires for some vectors (not always code2 = 0)
    assert any(r.code2 != 0 for r in got.values())


def test_uncertainty_sample_is_min_margin_set(spark):
    from genesis_spark.queries import _hashed_lr_scores

    allscores = {r.doc_id: r.score_u for r in
                 _hashed_lr_scores(spark, SF).collect()}
    picked = sorted(q_corpus_uncertainty_sample(spark, SF).collect(),
                    key=lambda r: r.rank)
    assert len(picked) == 20
    order = sorted(allscores, key=lambda d: (abs(allscores[d]), d))
    assert [r.doc_id for r in picked] == order[:20]
    for r in picked:
        assert r.margin == abs(allscores[r.doc_id])
        assert r.side == ("keep" if allscores[r.doc_id] > 0 else "drop")
    margins = [r.margin for r in picked]
    assert margins == sorted(margins)
