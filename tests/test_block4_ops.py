"""Unit tests for the round-3 block-4 operators: cross-doc boilerplate
removal, multimodal span packing, media dedup by context, unigram LM
scoring, int8 quantization, and the funnel/recrawl query kernels."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math

from pyspark.sql import Row, Window
from pyspark.sql import functions as F


def _span_rows(spark, docs):
    from genesis_spark.sources.interleaved import (explode_spans,
                                                   interleaved_docs)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return explode_spans(interleaved_docs(df))


# ---------------------------------------------------------------------------
# boilerplate removal
# ---------------------------------------------------------------------------

def test_drop_boilerplate_drops_shared_sections_keeps_docs(spark):
    from genesis_spark.operators.lines import drop_boilerplate
    nav = "home about contact terms privacy cart login help"  # 8 words
    docs = [
        (1, nav + " " + "alpha beta gamma delta epsilon zeta eta theta"),
        (2, nav + " " + "one two three four five six seven eight"),
        (3, "unique body text only here nothing shared words"),
        (4, nav),  # fully boilerplate -> must still emit a row
    ]
    out = {r["doc_id"]: r for r in
           drop_boilerplate(_span_rows(spark, docs), min_df=2).collect()}
    assert set(out) == {"1", "2", "3", "4"}
    assert out["1"]["n_dropped"] == 1
    assert out["1"]["text_clean"] == \
        "alpha beta gamma delta epsilon zeta eta theta"
    assert out["3"]["n_dropped"] == 0
    assert out["3"]["text_clean"].startswith("unique body")
    assert out["4"]["n_sections"] == 1
    assert out["4"]["n_dropped"] == 1
    assert out["4"]["text_clean"] == ""


def test_drop_boilerplate_min_df_threshold(spark):
    from genesis_spark.operators.lines import drop_boilerplate
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = [(1, shared), (2, shared), (3, shared)]
    # min_df=4 > actual df=3: nothing is boilerplate
    out = drop_boilerplate(_span_rows(spark, docs), min_df=4).collect()
    assert all(r["n_dropped"] == 0 for r in out)


# ---------------------------------------------------------------------------
# multimodal span packing
# ---------------------------------------------------------------------------

def test_pack_spans_matches_flat_global_window(spark):
    """The two-level (per-doc base + intra-doc) plan must equal a single
    global window ordered (doc_id, offset) per source — same invariant as
    test_pack_sharded_equals_flat, at span granularity."""
    from genesis_spark.operators.pack import pack_spans
    docs = [(i, " ".join(f"w{i}_{j}" for j in range(i % 40 + 5)))
            for i in range(1, 31)]
    rows = _span_rows(spark, docs).withColumn(
        "source", (F.col("doc_id").cast("bigint") % 3).cast("string"))
    got = pack_spans(rows, seq_len=64, media_tokens=16,
                     doc_ord=F.col("doc_id").cast("bigint"))

    is_media = F.col("media_ref").isNotNull() & (F.col("kind") != "link")
    cost = F.when(is_media, F.lit(16)).otherwise(
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")))
    w = (Window.partitionBy("source")
         .orderBy(F.col("doc_id").cast("bigint"), "offset")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ref = (rows.withColumn("cost", cost.cast("bigint"))
           .withColumn("tok_offset", F.sum("cost").over(w) - F.col("cost"))
           .select("doc_id", "offset", "kind", "cost", "tok_offset",
                   (F.col("tok_offset") / 64).cast("bigint")
                   .alias("block_first"),
                   ((F.col("tok_offset") + F.col("cost") - 1) / 64)
                   .cast("bigint").alias("block_last")))
    key = lambda r: (r["doc_id"], r["offset"])  # noqa: E731
    assert sorted(got.collect(), key=key) == sorted(ref.collect(), key=key)


def test_pack_spans_media_cost_and_block_math(spark):
    from genesis_spark.operators.pack import pack_spans
    # one doc, 4 sections of 8 words -> image after section 3
    docs = [(7, " ".join(f"t{j}" for j in range(32)))]
    rows = _span_rows(spark, docs).withColumn("source", F.lit("s"))
    out = {r["offset"]: r for r in
           pack_spans(rows, seq_len=16, media_tokens=100).collect()}
    # offsets: 0,1,2 sections; 3 image; 4 section
    assert out[3]["kind"] == "image" and out[3]["cost"] == 100
    assert out[0]["tok_offset"] == 0 and out[0]["block_first"] == 0
    assert out[3]["tok_offset"] == 24  # 3 sections x 8 words
    assert out[3]["block_first"] == 1 and out[3]["block_last"] == 7
    assert out[4]["tok_offset"] == 124


# ---------------------------------------------------------------------------
# media dedup by caption context
# ---------------------------------------------------------------------------

def test_dedup_media_by_context_clusters_and_canonical(spark):
    from genesis_spark.sources.interleaved import (dedup_media_by_context,
                                                   interleaved_docs)
    cap = "shared caption text for the site logo here"  # 8-word context
    tail = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12 x13 x14 x15 x16"
    # docs 5 and 9: first image (after 3rd section) gets context = 3rd
    # section; craft texts so that 3rd section is identical across both
    text = tail + " " + cap  # sections: tail(2x8) + cap -> image after cap
    df = spark.createDataFrame([(5, text), (9, text)],
                               "doc_id long, text string")
    out = dedup_media_by_context(
        interleaved_docs(df),
        doc_ord=F.col("doc_id").cast("bigint")).collect()
    # each doc has exactly one image (context = the shared 3rd section),
    # and the contexts are identical -> exactly ONE cluster of size 2
    assert len(out) == 1
    assert out[0]["n_copies"] == 2
    assert out[0]["canonical_doc"] == "5"  # earliest doc wins
    assert out[0]["canonical_ref"] == "5/img/1"


# ---------------------------------------------------------------------------
# unigram LM
# ---------------------------------------------------------------------------

def test_unigram_lm_score_exact_tiny_corpus(spark):
    from genesis_spark.operators.textstats import unigram_lm_score
    # corpus: "a a b" + "a c" -> total 5 tokens; p(a)=3/5, p(b)=p(c)=1/5
    df = spark.createDataFrame([(1, "a a b"), (2, "a c")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_lm_score(df).collect()}
    nll1 = -(2 * math.log(3 / 5) + math.log(1 / 5)) / 3
    nll2 = -(math.log(3 / 5) + math.log(1 / 5)) / 2
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 2
    assert abs(out[1]["nll"] - round(nll1, 4)) < 1e-9
    assert abs(out[2]["nll"] - round(nll2, 4)) < 1e-9


# ---------------------------------------------------------------------------
# int8 quantization
# ---------------------------------------------------------------------------

def test_quantize_int8_exact_codes(spark):
    from genesis_spark.operators.similarity import quantize_int8
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.0, 10.0, 5.0]),
         Row(vec_id=2, embedding=[4.0, 10.0, 5.0]),
         Row(vec_id=3, embedding=[2.0, 10.0, 5.0])])
    # dim0: mn=0 mx=4 -> codes floor(x*255/4)-128; dim1/dim2 constant -> -128
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    c = lambda x: math.floor(x * 255.0 / 4.0) - 128  # noqa: E731
    assert out[1]["code_sum"] == c(0.0) - 128 - 128
    assert out[2]["code_sum"] == c(4.0) - 128 - 128
    assert out[3]["code_sum"] == c(2.0) - 128 - 128
    assert out[2]["code_max"] == 127  # x=mx maps to exactly 127
    assert out[1]["code_min"] == -128 and out[1]["n_dims"] == 3


def test_quantize_stats_per_dim(spark):
    from genesis_spark.operators.similarity import quantize_stats
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, -2.0]),
         Row(vec_id=2, embedding=[3.0, 7.0])])
    st = {r["pos"]: (r["mn"], r["mx"]) for r in quantize_stats(df).collect()}
    assert st == {0: (1.0, 3.0), 1: (-2.0, 7.0)}


# ---------------------------------------------------------------------------
# funnel semantics (strictly-after ordering)
# ---------------------------------------------------------------------------

def test_events_funnel_strictly_after(spark, tmp_path):
    import pandas as pd

    from genesis_spark.queries import q_events_funnel
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: full funnel in order
        (1, 1, "signup", t0), (2, 1, "purchase", t0 + pd.Timedelta("1h")),
        (3, 1, "error", t0 + pd.Timedelta("2h")),
        # user 2: purchase BEFORE signup -> stage stops at 1
        (4, 2, "purchase", t0), (5, 2, "signup", t0 + pd.Timedelta("1h")),
        # user 3: signup + purchase, error before purchase -> stage 2
        (6, 3, "signup", t0), (7, 3, "error", t0 + pd.Timedelta("30min")),
        (8, 3, "purchase", t0 + pd.Timedelta("1h")),
        # user 4: never signed up -> absent
        (9, 4, "purchase", t0),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type",
                                      "ts"])
    pdf["value"] = 0.0
    pdf["props"] = "{}"
    sf = str(tmp_path / "sf")
    spark.createDataFrame(pdf).write.parquet(f"{sf}/events.parquet")
    out = {r["user_id"]: r["stage"]
           for r in q_events_funnel(spark, sf).collect()}
    assert out == {1: 3, 2: 1, 3: 2}


# ---------------------------------------------------------------------------
# plan hygiene: the new queries stay JVM-side
# ---------------------------------------------------------------------------

def test_block4_queries_no_python_in_plan(spark):
    from genesis_spark import queries as Q
    sf = "/root/testdata/sf0.001"
    for name in ["spans_boilerplate", "spans_pack_multimodal",
                 "spans_media_dedup", "text_unigram_lm",
                 "embeddings_quantize", "frontier_recrawl", "events_funnel"]:
        plan = Q.QUERIES[name](spark, sf)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


# ---------------------------------------------------------------------------
# product quantization: codes + ADC search vs a pure-Python oracle
# ---------------------------------------------------------------------------

def _py_pq_codes(vec, cents, sub_dim):
    """Independent reimplementation with the same fold order as the Spark
    expressions (sequential i-ascending dot, argmin first-min)."""
    codes = []
    for j, codebook in enumerate(cents):
        sub = vec[j * sub_dim:(j + 1) * sub_dim]
        dists = []
        for c in codebook:
            cnorm2 = float(sum(x * x for x in c))
            dot = 0.0
            for x, y in zip(sub, c):
                dot = dot + float(x) * y
            dists.append(cnorm2 - 2.0 * dot)
        codes.append(dists.index(min(dists)))
    return codes


def test_pq_encode_matches_python_oracle(spark):
    from genesis_spark.operators.similarity import pq_centroids, pq_encode
    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .filter(F.col("vec_id") < 20))
    cents = pq_centroids(8, 16, 8)
    got = {r["vec_id"]: (list(r["codes"]), r["pq_code"])
           for r in pq_encode(emb, m=8, k=16, dim=64).collect()}
    raw = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    for vid, vec in raw.items():
        codes = _py_pq_codes(vec, cents, 8)
        assert got[vid][0] == codes, vid
        assert got[vid][1] == sum(c * 16 ** j for j, c in enumerate(codes))


def test_pq_adc_topk_matches_python_oracle(spark):
    from genesis_spark.operators.similarity import pq_adc_topk, pq_centroids
    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .filter(F.col("vec_id") < 60))
    q = emb.filter(F.col("vec_id") < 3)
    got = [(r["query_id"], r["rank"], r["neighbor_id"])
           for r in pq_adc_topk(emb, q, k_top=5).collect()]

    cents = pq_centroids(8, 16, 8)
    raw = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    codes = {v: _py_pq_codes(vec, cents, 8) for v, vec in raw.items()}
    expect = []
    for qid in (0, 1, 2):
        luts = []
        for j, codebook in enumerate(cents):
            sub = raw[qid][j * 8:(j + 1) * 8]
            row = []
            for c in codebook:
                cnorm2 = float(sum(x * x for x in c))
                dot = 0.0
                for x, y in zip(sub, c):
                    dot = dot + float(x) * y
                row.append(cnorm2 - 2.0 * dot)
            luts.append(row)
        scored = []
        for nid, cs in codes.items():
            if nid == qid:
                continue
            adc = 0.0
            for j, c in enumerate(cs):
                adc = adc + luts[j][c]
            scored.append((round(adc, 6), nid))
        scored.sort()
        expect += [(qid, rk + 1, nid)
                   for rk, (_, nid) in enumerate(scored[:5])]
    assert sorted(got) == sorted(expect)


def test_pq_adc_plan_is_broadcast_no_python(spark):
    from genesis_spark.operators.similarity import pq_adc_topk
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = pq_adc_topk(emb, emb.filter(F.col("vec_id") < 3), k_top=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# streaming sessionize: state must carry sessions across micro-batches
# ---------------------------------------------------------------------------

def test_sessionize_stream_state_spans_batches(spark, tmp_path):
    import os

    import pandas as pd

    from genesis_spark.streaming.pipeline import sessionize_stream

    t0 = pd.Timestamp("2024-01-01")
    h = pd.Timedelta("1h")
    # batch 1: user 1 events at 0h,1h (one session)
    # batch 2: user 1 at 2h (same session — state must remember 1h),
    #          then at 10h (> 6h gap -> session 2)
    b1 = pd.DataFrame({"user_id": [1, 1], "ts": [t0, t0 + h]})
    b2 = pd.DataFrame({"user_id": [1, 1], "ts": [t0 + 2 * h, t0 + 10 * h]})
    src = tmp_path / "ev"
    os.makedirs(src)
    for i, pdf in enumerate([b1, b2], 1):
        p = str(src / f"b{i}.parquet")
        pdf.to_parquet(p, coerce_timestamps="us",
                       allow_truncated_timestamps=True)
        os.utime(p, (1000 + i, 1000 + i))
    stream = (spark.readStream.schema("user_id bigint, ts timestamp_ntz")
              .option("maxFilesPerTrigger", 1).format("parquet")
              .load(str(src)))
    q = (sessionize_stream(stream).writeStream.format("memory")
         .queryName("sess_span_test")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted((r["ts"], r["session_n"])
                 for r in spark.table("sess_span_test").collect())
    assert [s for _, s in got] == [1, 1, 1, 2]


# ---------------------------------------------------------------------------
# gray8 resize kernel
# ---------------------------------------------------------------------------

def test_resize_media_nearest_neighbor_exact(spark):
    from genesis_spark.operators.multimodal import encode_gray8, resize_media
    # 2x2 source [[10, 20], [30, 40]] -> 4x4 NN: iy/ix = [0,0,1,1]
    blob = encode_gray8(2, 2, bytes([10, 20, 30, 40]))
    df = spark.createDataFrame([(1, blob), (2, None)],
                               "doc_id long, media_blob binary")
    out = resize_media(df, target_w=4, target_h=4).collect()
    assert len(out) == 1  # None blob skipped
    r = out[0]
    # each source pixel appears 4x: sum = 4 * (10+20+30+40)
    assert (r["src_w"], r["src_h"]) == (2, 2)
    assert r["out_sum"] == 4 * 100
    assert r["out_min"] == 10 and r["out_max"] == 40


def test_gray8_roundtrip_and_truncation_raises(spark):
    import pytest as _pt

    from genesis_spark.operators.multimodal import (decode_gray8,
                                                    gray8_by_doc_id)
    w, h, arr = decode_gray8(gray8_by_doc_id(7))
    assert (w, h) == (8 + 7 % 16, 8 + (7 // 3) % 16)
    assert int(arr[0, 1]) == (7 * 31 + 7) % 256
    with _pt.raises(ValueError):
        decode_gray8(gray8_by_doc_id(7)[:-1])
