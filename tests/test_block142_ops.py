"""Block-142 operators: ROUGE clipped-count pairs, AI-training opt-out
gate, cross-language import census."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_code_import_census,
                                   q_corpus_optout_gate,
                                   q_text_rouge_pairs)
from tests.test_block138_ops import _py_content

SF = "/root/testdata/sf0.001"


def _rouge(ref_grams, cand_grams):
    rc, cc = Counter(ref_grams), Counter(cand_grams)
    clip = sum(min(n, cc[g]) for g, n in rc.items())
    return sum(rc.values()), clip


def test_rouge_pairs_replay(spark):
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect()}
    got = {r.doc_id: r for r in q_text_rouge_pairs(spark, SF).collect()}
    pairs = [d for d in docs if d % 2 == 0]
    for d in pairs:
        ref = [t for t in docs[d].lower().split(" ") if t]
        cand_text = (docs[d] if d % 5 == 0
                     else re.sub(r" [^ ]+$", "", docs[d]))
        cand = [t for t in cand_text.lower().split(" ") if t]
        if len(ref) < 2:
            continue
        r = got[d]
        r1_ref, r1_clip = _rouge(ref, cand)
        bi = lambda ts: [f"{a} {b}" for a, b in zip(ts, ts[1:])]
        r2_ref, r2_clip = _rouge(bi(ref), bi(cand))
        assert (r.r1_ref, r.r1_clip) == (r1_ref, r1_clip), d
        assert (r.r2_ref, r.r2_clip) == (r2_ref, r2_clip), d
        assert r.r1_recall_ppm == r1_clip * 1000000 // r1_ref
        assert r.r2_recall_ppm == r2_clip * 1000000 // r2_ref
    # identical twins calibrate at exactly 1.0 on both orders
    ident = [d for d in pairs if d % 5 == 0 and d in got]
    assert ident
    for d in ident:
        assert got[d].r1_recall_ppm == 1000000
        assert got[d].r2_recall_ppm == 1000000
    # near twins (last word dropped) score below 1.0 on R1
    near = [d for d in pairs if d % 5 != 0 and d in got]
    assert near and all(got[d].r1_recall_ppm < 1000000 for d in near)


def test_rouge_clipping_property():
    # repetition in the candidate must not inflate recall
    ref = "a b c d".split()
    cand_spam = "a a a a a a".split()
    n, clip = _rouge(ref, cand_spam)
    assert clip == 1  # only one 'a' credit despite six copies


def test_optout_gate_replay(spark):
    got = {r.doc_id: r for r in q_corpus_optout_gate(spark, SF).collect()}
    ks = sorted(got)
    for k in ks:
        r = got[k]
        m = k % 6
        assert r.hdr_noai == int(m == 0)
        assert r.hdr_noimageai == int(m == 1)
        assert r.meta_noai == int(m == 2)
        assert r.tdm_reserved == int(m == 3)
        assert r.text_excluded == int(m in (0, 2, 3))
        assert r.images_excluded == int(m in (0, 1, 2, 3))
    # the substring trap: noimageai alone never excludes text
    assert all(got[k].text_excluded == 0 for k in ks if k % 6 == 1)


def test_import_census_replay(spark):
    ks = [r.doc_id for r in
          spark.read.parquet(f"{SF}/documents.parquet")
          .select("doc_id").collect()]
    refs = Counter()
    files = defaultdict(set)
    pat = re.compile(
        r'(import |use |#include <|require\(")([a-zA-Z0-9_]+)')
    for k in ks:
        imports = ""
        if k % 4 != 0:
            for j in range(k % 4):
                m = (k * 3 + j * 5) % 25
                style = (k * 3 + j * 5) % 4
                imports += [f"import mod{m}", f"use mod{m}",
                            f"#include <mod{m}.h>",
                            f'const m{j} = require("mod{m}");'][style] \
                    + "\n"
        content = imports + _py_content(k)
        for _, mod in pat.findall(content):
            refs[mod] += 1
            files[mod].add(k)
    got = {r.module: r for r in q_code_import_census(spark, SF).collect()}
    assert set(got) == set(refs)
    assert "stdio" in got  # the organic keyword-line include counts
    ranking = sorted(refs.items(), key=lambda kv: (-kv[1], kv[0]))
    for rank, (mod, n) in enumerate(ranking, 1):
        r = got[mod]
        assert r.n_refs == n
        assert r.n_files == len(files[mod])
        assert r.rank == rank
        assert r.top10 == int(rank <= 10)
