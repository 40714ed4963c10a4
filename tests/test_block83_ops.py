"""Block-83 operators: mobile/AMP mirror collapse, T5 span-corruption
plan, FineWeb line-quality rules."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math
import re

from genesis_spark.queries import (q_corpus_span_corruption,
                                   q_text_fineweb_rules,
                                   q_url_mobile_amp_collapse)

SF = "/root/testdata/sf0.001"


def test_amp_collapse_families_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    fams = {}
    for k in keys:
        base = f"site{k % 200}.onion/p{k % 50}"
        urls = {f"http://{base}"}
        if k % 2 == 0:
            urls.add(f"http://m.{base}")
        if k % 3 == 0:
            urls.add(f"http://amp.{base}")
        if k % 5 == 0:
            urls.add(f"http://{base}?amp=1")
        fams.setdefault(f"http://{base}", set()).update(urls)
    got = {r["family"]: r for r in
           q_url_mobile_amp_collapse(spark, SF).collect()}
    assert set(got) == set(fams)
    for fam, urls in fams.items():
        r = got[fam]
        assert r["n_variants"] == len(urls)
        assert r["n_mobile"] == sum(u.startswith("http://m.") for u in urls)
        assert r["n_amp"] == sum(u.startswith("http://amp.")
                                 or u.endswith("?amp=1") for u in urls)
        assert r["fetches_saved"] == len(urls) - 1
    # the collapse must actually save fetches somewhere (families with
    # multiple conventions exist by construction: any key % 2 == 0)
    assert sum(r["fetches_saved"] for r in got.values()) > 0


def test_span_corruption_t5_plan_golden(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "source", "text").collect()
    per = {}
    for r in docs:
        if r["text"] is None:
            continue
        n = len(r["text"].split(" "))
        noise = max(math.floor(n * 0.15 + 0.5), 1)
        spans = max(math.floor(noise / 3.0 + 0.5), 1)
        inp = n - noise + spans
        tgt = noise + spans + 1
        a = per.setdefault(r["source"], [0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += n
        a[2] += noise
        a[3] += spans
        a[4] += inp
        a[5] += tgt
    got = {r["source"]: r for r in
           q_corpus_span_corruption(spark, SF).collect()}
    assert set(got) == set(per)
    for s, (nd, tok, noi, sp, inp, tgt) in per.items():
        r = got[s]
        assert (r["n_docs"], r["tokens"], r["noise_tokens"],
                r["sentinels"], r["input_tokens"], r["target_tokens"]) \
            == (nd, tok, noi, sp, inp, tgt)
        assert r["overhead_ppm"] == (inp + tgt - tok) * 10**6 // tok
        # T5 invariant: input+target reconstruct all tokens plus
        # 2 sentinels per span plus one closing sentinel per doc
        assert inp + tgt == tok + 2 * sp + nd


def _relines(doc_id, text):
    w = text.split(" ")
    n = max((len(w) + 11) // 12, 1)
    ls = []
    for i in range(n):
        line = " ".join(w[i * 12:i * 12 + 12])
        if (i + 1) % 5 == 0:
            line = "- " + line
        if (i + 1) % 3 == 0:
            line = line + "."
        ls.append(line)
    if doc_id % 4 == 0:
        ls.append(ls[0])
    return ls


def test_fineweb_rules_golden(spark):
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["text"] is not None}
    got = {r["doc_id"]: r for r in q_text_fineweb_rules(spark, SF).collect()}
    assert set(got) == set(docs)
    verdicts = set()
    for d, t in docs.items():
        ls = _relines(d, t)
        n = len(ls)
        punct = sum(bool(re.search(r"[.!?]$", x)) for x in ls)
        bullet = sum(x.startswith("- ") for x in ls)
        short = sum(len(x.split(" ")) <= 3 for x in ls)
        dup = n - len(set(ls))
        r = got[d]
        assert r["n_lines"] == n
        assert r["punct_ppm"] == punct * 10**6 // n
        assert r["dup_ppm"] == dup * 10**6 // n
        assert r["bullet_ppm"] == bullet * 10**6 // n
        assert r["short_ppm"] == short * 10**6 // n
        want = ("low-punct" if r["punct_ppm"] < 120000
                else "dup-lines" if r["dup_ppm"] > 300000
                else "bullet-page" if r["bullet_ppm"] > 900000
                else "keep")
        assert r["verdict"] == want
        verdicts.add(r["verdict"])
    # the relining fixture must exercise both keep and at least one
    # drop class
    assert "keep" in verdicts and len(verdicts) >= 2
