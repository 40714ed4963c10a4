"""Block-69 operators: span-sequence fingerprint dedup, round-over-round
span diff, streaming interleaved-document reassembly."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
from collections import defaultdict

from genesis_spark.queries import (q_spans_diff,
                                   q_spans_fingerprint_dedup,
                                   q_stream_spans_ingest)
from genesis_spark.streaming.pipeline import assemble_stream

SF = "/root/testdata/sf0.001"


def _spans(text):
    """Python replay of sources/interleaved.interleaved_docs."""
    words = text.split(" ")
    chunks = [" ".join(words[i * 8:i * 8 + 8])
              for i in range(max((len(words) + 7) // 8, 1))]
    out = []
    for i, c in enumerate(chunks):
        out.append(("section", c, None))
        if (i + 1) % 3 == 0:
            out.append(("image", None, f"img/{(i + 1) // 3}"))
    return out


def _fp(text):
    ser = "".join(f"{k}|{t or ''}|{m or ''};" for k, t, m in _spans(text))
    return hashlib.md5(ser.encode()).hexdigest()


def _corpus_py(spark):
    docs = {str(r["doc_id"]): r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["text"] is not None}
    out = dict(docs)
    for d, t in docs.items():
        k = int(d)
        if k % 2 == 0:
            out[str(k + 100000)] = t if k % 5 == 0 \
                else t.rsplit(" ", 1)[0]
    return out


def test_spans_fingerprint_dedup_golden(spark):
    corpus = _corpus_py(spark)
    groups = defaultdict(list)
    for d, t in corpus.items():
        groups[_fp(t)].append(d)
    want = {fp: ",".join(sorted(ids)) for fp, ids in groups.items()
            if len(ids) > 1}
    got = {r["fp"]: r["doc_ids_csv"] for r in
           q_spans_fingerprint_dedup(spark, SF).collect()}
    assert got == want
    # exact twins are always grouped with their original
    flat = {d for csv in got.values() for d in csv.split(",")}
    for d in corpus:
        k = int(d)
        if k < 100000 and k % 10 == 0:
            assert d in flat and str(k + 100000) in flat


def test_spans_diff_golden(spark):
    docs = {str(r["doc_id"]): r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["text"] is not None}
    got = {r["doc_id"]: r for r in q_spans_diff(spark, SF).collect()}
    assert set(got) == set(docs)
    for d, t in docs.items():
        k = int(d)
        if k % 3 == 0:
            t2 = t + " extra tail"
        elif k % 3 == 1:
            t2 = t.split(" ", 1)[1] if " " in t else t
        else:
            t2 = t
        s1, s2 = _spans(t), _spans(t2)
        n = max(len(s1), len(s2))
        same = changed = added = removed = 0
        for i in range(n):
            if i >= len(s1):
                added += 1
            elif i >= len(s2):
                removed += 1
            elif s1[i] == s2[i]:
                same += 1
            else:
                changed += 1
        r = got[d]
        assert (r["n_same"], r["n_changed"], r["n_added"],
                r["n_removed"]) == (same, changed, added, removed), d
        assert r["status"] == \
            ("unchanged" if changed + added + removed == 0 else "changed")
        if k % 3 == 2:
            assert r["status"] == "unchanged"
        else:
            assert r["status"] == "changed"


def test_assemble_stream_exactly_once_per_doc(spark):
    rows = q_stream_spans_ingest(spark, SF)
    got = rows.collect()
    ids = [r["doc_id"] for r in got]
    assert len(ids) == len(set(ids))  # completeness-gated: one emission


def test_assemble_stream_straddling_batches(spark):
    import os
    import tempfile

    data = [("x", 1, "section", "bbb", None, 3),
            ("y", 0, "section", "solo", None, 1),
            ("x", 0, "section", "aaa", None, 3),
            ("x", 2, "image", None, "x/img/1", 3)]
    df = spark.createDataFrame(
        data, "doc_id string, offset int, kind string, text string, "
              "media_ref string, n_spans int")
    tmp = tempfile.mkdtemp(prefix="gs_asm_")
    src, ck = os.path.join(tmp, "src"), os.path.join(tmp, "ck")
    df.repartition(3).write.parquet(src)
    stream = (spark.readStream
              .schema("doc_id string, offset int, kind string, "
                      "text string, media_ref string, n_spans int")
              .option("maxFilesPerTrigger", 1)
              .format("parquet").load(src))
    q = (assemble_stream(stream)
         .writeStream.format("memory").queryName("asm_unit")
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    out = {r["doc_id"]: r for r in spark.table("asm_unit").collect()}
    assert set(out) == {"x", "y"}
    assert out["x"]["text_rt"] == "aaa bbb"   # offset order, media skipped
    assert out["x"]["n_media"] == 1 and out["x"]["n_spans"] == 3
    assert out["y"]["text_rt"] == "solo" and out["y"]["n_media"] == 0
