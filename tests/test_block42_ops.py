"""Block-42 operators: token budget, mirror detection, code routing."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
import re

import duckdb

from genesis_spark.queries import (q_host_mirror_detect,
                                   q_spans_token_budget,
                                   q_text_code_detect)

SF = "/root/testdata/sf0.001"


def _docs(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "WHERE text IS NOT NULL").fetchall()


def test_token_budget_matches_python_replay(spark):
    want = {}
    for doc_id, text in _docs(SF):
        words = text.split(" ")
        n_chunks = max((len(words) + 7) // 8, 1)
        chunks = [" ".join(words[i * 8:i * 8 + 8])
                  for i in range(n_chunks)]
        text_tokens = sum(len(c.split(" ")) for c in chunks)
        n_media = sum(1 for j in range(n_chunks) if (j + 1) % 3 == 0)
        total = text_tokens + n_media * 256
        want[str(doc_id)] = (text_tokens, n_media * 256, total,
                             total <= 4096, (total + 4095) // 4096)
    got = {r["doc_id"]: (r["text_tokens"], r["media_tokens"],
                         r["total_tokens"], r["fits_context"],
                         r["n_splits"])
           for r in q_spans_token_budget(spark, SF).collect()}
    assert got == want
    # the 256-token image cost dominates short docs — media_tokens must
    # be a real component, not always 0
    assert any(v[1] > 0 for v in got.values())
    assert all(v[4] >= 1 for v in got.values())


def test_mirror_detect_matches_python_replay(spark):
    hostfp = {}
    for doc_id, text in _docs(SF):
        fp = hashlib.md5(text.encode()).hexdigest()
        hostfp.setdefault(doc_id % 50, set()).add(fp)
        if doc_id % 4 == 0:
            hostfp.setdefault(doc_id % 50 + 50, set()).add(fp)
    want = {}
    nums = sorted(hostfp)
    for a_i, a in enumerate(nums):
        for b in nums[a_i + 1:]:
            shared = len(hostfp[a] & hostfp[b])
            if shared:
                j = shared * 10**6 // len(hostfp[a] | hostfp[b])
                want[(f"h{a}", f"h{b}")] = (shared, j, j >= 200000)
    got = {(r["host_a"], r["host_b"]):
           (r["n_shared"], r["jaccard_ppm"], r["is_mirror"])
           for r in q_host_mirror_detect(spark, SF).collect()}
    assert got == want
    # every synthesized mirror pair (h_n, h_n+50) is detected as a mirror
    planted = [(a, b) for (a, b) in got
               if int(b[1:]) == int(a[1:]) + 50 and int(a[1:]) < 50]
    assert planted and all(got[p][2] for p in planted)


_SYM = re.compile(r"[^{}();=\[\]<>]")
_KW = re.compile(r"\b(def|return|if|else|for|while|var|let|const"
                 r"|function|import)\b")
_TAIL = (" def run(): return {x[i]; i += 1}"
         " if (a == b) { return 0; } // end")


def test_code_detect_matches_python_replay(spark):
    agg = {}
    for doc_id, text in _docs(SF):
        t = text + _TAIL if doc_id % 11 == 0 else text
        n = max(len(t), 1)
        v_sym = int(len(_SYM.sub("", t)) * 1000 / n >= 10)
        v_kw = int(len(_KW.findall(t)) >= 3)
        v_digit = int(sum(ch.isdigit() for ch in t) * 1000 / n >= 5)
        route = "code" if v_sym + v_kw + v_digit >= 2 else "prose"
        st = agg.setdefault(route, [0, 0, 0, 0])
        st[0] += 1
        st[1] += v_sym
        st[2] += v_kw
        st[3] += v_digit
    want = {k: tuple(v) for k, v in agg.items()}
    got = {r["route"]: (r["n_docs"], r["n_sym_votes"], r["n_kw_votes"],
                        r["n_digit_votes"])
           for r in q_text_code_detect(spark, SF).collect()}
    assert got == want
    # both routes materialize; the planted code docs are found
    n_planted = sum(1 for doc_id, _ in _docs(SF) if doc_id % 11 == 0)
    assert got["code"][0] >= n_planted > 0
    assert got["prose"][0] > 0
