"""Block-39 operators: tokenizer fertility, JSONL ingest, host lang mix."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import json
import re

import duckdb

from genesis_spark.queries import (q_corpus_tokenizer_fertility,
                                   q_host_lang_mix, q_jsonl_ingest)

SF = "/root/testdata/sf0.001"

_BPE = re.compile(r"[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]")


def _docs(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text, lang, n_chars FROM "
        f"'{sf_dir}/documents.parquet' WHERE text IS NOT NULL").fetchall()


def test_fertility_matches_python_replay(spark):
    agg = {}
    for _, text, lang, _ in _docs(SF):
        st = agg.setdefault(lang, [0, 0, 0, 0])
        st[0] += 1
        st[1] += len(text.split(" "))
        st[2] += len(_BPE.findall(text))
        st[3] += len(text)
    want = {lang: (d, w, t, c,
                   t * 10**6 // max(w, 1), c * 10**6 // max(t, 1))
            for lang, (d, w, t, c) in agg.items()}
    got = {r["lang"]: (r["n_docs"], r["n_words"], r["n_tokens"],
                       r["n_chars"], r["fertility_ppm"],
                       r["chars_per_token_ppm"])
           for r in q_corpus_tokenizer_fertility(spark, SF).collect()}
    assert got == want
    # fertility >= 1 token per word for any BPE-ish segmentation of
    # natural text (every word yields at least one token)
    assert all(v[4] >= 10**6 for v in got.values())


def test_jsonl_ingest_matches_python_replay(spark):
    agg = {}
    for doc_id, _, lang, n_chars in _docs(SF):
        line = f'{{"id":{doc_id},"lang":"{lang}","n":{n_chars}}}'
        if doc_id % 17 == 0:
            line = line[:-5]
        st = agg.setdefault(lang, [0, 0, 0, 0])
        st[0] += 1
        try:
            j = json.loads(line)
            st[1] += 1
            st[3] += j["n"]
        except ValueError:
            st[2] += 1
    want = {lang: tuple(v) for lang, v in agg.items()}
    got = {r["lang"]: (r["n_lines"], r["n_good"], r["n_corrupt"],
                       r["sum_n_good"])
           for r in q_jsonl_ingest(spark, SF).collect()}
    assert got == want
    # torn lines exist on the fixture and are all accounted for
    assert sum(v[2] for v in got.values()) > 0
    assert all(v[1] + v[2] == v[0] for v in got.values())


def test_host_lang_mix_matches_python_replay(spark):
    counts = {}
    for doc_id, _, lang, _ in _docs(SF):
        host = f"h{doc_id % 50}"
        counts.setdefault(host, {}).setdefault(lang, 0)
        counts[host][lang] += 1
    want = {}
    for host, by_lang in counts.items():
        n_docs = sum(by_lang.values())
        maj_lang, maj_n = sorted(by_lang.items(),
                                 key=lambda kv: (-kv[1], kv[0]))[0]
        ppm = maj_n * 10**6 // n_docs
        want[host] = (n_docs, len(by_lang), maj_lang, ppm, ppm < 800000)
    got = {r["host_key"]: (r["n_docs"], r["n_langs"], r["majority_lang"],
                           r["majority_ppm"], r["is_mixed"])
           for r in q_host_lang_mix(spark, SF).collect()}
    assert got == want
    # the doc_id % 50 hosting layout vs multi-language corpus: mixed
    # hosts must exist, and majority share is always a plurality
    assert any(v[4] for v in got.values())
    assert all(v[3] * v[1] >= 10**6 - v[1] for v in got.values())
