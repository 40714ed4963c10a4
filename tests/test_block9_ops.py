"""Unit tests for the round-3 block-9 operators: IVF+PQ composed ANN,
shingle containment pairs, uniform video frame sampling, and the
n-gram-profile language-ID plumbing."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import struct

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ivfpq_topk
# ---------------------------------------------------------------------------

def _emb(spark, n=40, dim=64):
    import hashlib
    rows = []
    for i in range(n):
        v = [int(hashlib.md5(f"e|{i}|{j}".encode()).hexdigest()[:8], 16)
             / float(1 << 31) - 1.0 for j in range(dim)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivfpq_rank_structure_and_recall_floor(spark):
    """Every query gets exactly k ranked neighbors (dense 1..k, no self),
    and IVFPQ recall@5 vs exact brute force clears a floor on the
    pseudo-random fixture (probing 3/8 cells + 4-bit codes is lossy by
    design, not broken)."""
    from genesis_spark.operators import similarity as SIM
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    got = SIM.ivfpq_topk(emb, q, k_top=5, n_centroids=8, n_probe=3,
                         m=8, k=16, dim=64).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
        assert r["neighbor_id"] != r["query_id"]
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rows in by_q.values():
        assert sorted(r["rank"] for r in rows) == [1, 2, 3, 4, 5]
    exact = SIM.cosine_topk(emb, q, k=5).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    got_set = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(exact_set & got_set) / len(exact_set)
    assert recall >= 0.3, recall


def test_ivfpq_requires_dim_divisible_and_checks_vec_len(spark):
    import pytest

    from genesis_spark.operators import similarity as SIM
    emb = _emb(spark, n=8)
    with pytest.raises(ValueError):
        SIM.ivfpq_topk(emb, emb, dim=62, m=8)
    bad = spark.createDataFrame([(99, [0.1, 0.2])],
                                "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="vector length"):
        SIM.ivfpq_topk(bad, bad.limit(1), dim=64, m=8).collect()


def test_ivfpq_candidates_subset_of_probed_cells(spark):
    """An IVFPQ neighbor must live in one of the query's probed cells —
    the candidate-generation contract that makes the scan touch
    n_probe/n_centroids of the data."""
    from pyspark.sql import functions as FF

    from genesis_spark.operators import similarity as SIM
    emb = _emb(spark)
    cents = SIM.seeded_centroids(8, 64)
    cells = {r["vec_id"]: r["cell"] for r in emb.select(
        "vec_id", SIM.assign_cell_expr(
            FF.col("embedding"), cents).alias("cell")).collect()}
    probes = {r["vec_id"]: r["p"] for r in emb.filter(FF.col("vec_id") < 5)
              .select("vec_id", SIM.probe_cells_expr(
                  FF.col("embedding"), cents, 3).alias("p")).collect()}
    got = SIM.ivfpq_topk(emb, emb.filter(FF.col("vec_id") < 5),
                         k_top=5, dim=64).collect()
    for r in got:
        assert cells[r["neighbor_id"]] in probes[r["query_id"]]


# ---------------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------------

def test_containment_asymmetric_quote_inclusion(spark):
    """A short doc fully quoted inside a long one: containment(short in
    long) = 1.0 even though Jaccard is far below threshold — the exact
    case the asymmetric measure exists for."""
    from genesis_spark.operators.dedup import (containment_pairs,
                                               ngram_jaccard_pairs)
    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame([(1, short), (2, long_)],
                                 "doc_id long, text string")
    got = {(r["doc_id"], r["contained_in"]): r["containment"]
           for r in containment_pairs(docs, threshold=0.8).collect()}
    assert got == {(1, 2): 1.0}
    assert ngram_jaccard_pairs(docs, threshold=0.8).count() == 0


def test_containment_max_df_cap_applies_before_sizes(spark):
    """A boilerplate shingle over the df cap is removed from every set
    BEFORE the denominator — mirroring the documented Jaccard-cap
    semantics (containment is over the filtered sets)."""
    from genesis_spark.operators.dedup import containment_pairs
    # shingle 'x y z' appears in all 4 docs -> df 4 > cap 3
    docs = spark.createDataFrame(
        [(1, "x y z a b c"), (2, "x y z a b c"),
         (3, "x y z q r s"), (4, "x y z t u v")],
        "doc_id long, text string")
    got = {(r["doc_id"], r["contained_in"]): r["containment"]
           for r in containment_pairs(docs, threshold=0.9,
                                      max_df=3).collect()}
    # after dropping the hot shingles ('x y z','y z a','z a b' are shared
    # by 1&2 only at df 2, kept) docs 1 and 2 remain identical sets
    assert got[(1, 2)] == 1.0 and got[(2, 1)] == 1.0
    assert (3, 4) not in got


# ---------------------------------------------------------------------------
# video frame sampling
# ---------------------------------------------------------------------------

def test_video_roundtrip_and_uniform_indices(spark):
    from genesis_spark.operators import multimodal as MM
    blob = MM.video_by_doc_id(5)          # n_frames = 4 + 5 % 9 = 9
    n, fb = struct.unpack(">II", blob[:8])
    assert (n, fb) == (9, 64)
    df = spark.createDataFrame([(5, bytearray(blob))],
                               "doc_id long, media_blob binary")
    rows = {r["frame_idx"]: r for r in
            MM.sample_frames_video(df, target=4).collect()}
    # floor(t*9/4) for t=0..3 -> 0, 2, 4, 6
    assert sorted(rows) == [0, 2, 4, 6]
    for f, r in rows.items():
        expect = sum((5 * 7 + f * 13 + i * 3) % 256 for i in range(64))
        assert r["frame_sum"] == expect and r["n_frames"] == 9


def test_video_sampler_poison_guard_and_short_clip(spark):
    """Malformed blobs are skipped, a clip shorter than target yields its
    distinct frames once each."""
    from genesis_spark.operators import multimodal as MM
    two = MM.encode_video_raw(2, 4, bytes(range(8)))
    df = spark.createDataFrame(
        [(1, bytearray(two)), (2, bytearray(b"\x00\x01")),
         (3, None), (4, bytearray(b"\x00" * 8))],   # 0 frames
        "doc_id long, media_blob binary")
    rows = MM.sample_frames_video(df, target=4).collect()
    assert {r["doc_id"] for r in rows} == {1}
    # floor(t*2/4) for t=0..3 -> 0,0,1,1 -> distinct {0,1}
    assert sorted(r["frame_idx"] for r in rows) == [0, 1]
    sums = {r["frame_idx"]: r["frame_sum"] for r in rows}
    assert sums == {0: 0 + 1 + 2 + 3, 1: 4 + 5 + 6 + 7}


# ---------------------------------------------------------------------------
# n-gram language-ID plumbing
# ---------------------------------------------------------------------------

def test_langid_ngram_profiles_classify_held_out_docs(spark):
    """Trigram profiles trained on the labeled slice classify held-out
    docs of the same languages; a doc sharing no trigram with any profile
    is 'und'."""
    from genesis_spark import queries as Q
    import duckdb
    import os
    import tempfile

    rows = []
    for i in range(12):
        if i % 2 == 0:
            rows.append((i, "en", "the cat and the dog run over the hill "
                                  "and the fox jumps the fence"))
        else:
            rows.append((i, "fr", "le chat et le chien courent sur la "
                                  "colline et le renard saute"))
    rows.append((99, "en", "zzzz"))       # no 3-gram overlap with profiles
    with tempfile.TemporaryDirectory() as td:
        import pandas as pd
        pd.DataFrame(rows, columns=["doc_id", "lang", "text"]) \
            .assign(source="t", n_chars=0) \
            .to_parquet(os.path.join(td, "documents.parquet"))
        got = {r["doc_id"]: r["lang_pred"]
               for r in Q.q_text_langid_ngram(spark, td).collect()}
    for i in range(12):
        assert got[i] == ("en" if i % 2 == 0 else "fr"), (i, got[i])
    assert got[99] == "und"


# ---------------------------------------------------------------------------
# count_stream (stateful heavy hitters)
# ---------------------------------------------------------------------------

def test_count_stream_cumulative_across_microbatches(spark, tmp_path):
    """applyInPandasWithState per-host counter: counts ACCUMULATE across
    micro-batches (one file per trigger), each batch emits the updated
    cumulative value, and max-per-host over emissions equals the exact
    total — the monotone-recovery property the stream_topk oracle row
    relies on."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from genesis_spark.streaming.pipeline import count_stream

    src = tmp_path / "links"
    src.mkdir()
    b1 = ["h0"] * 3 + ["h1"] * 1
    b2 = ["h0"] * 2 + ["h2"] * 4
    for name, rows in (("b1", b1), ("b2", b2)):
        pq.write_table(pa.table({"host_key": pa.array(rows)}),
                       str(src / f"{name}.parquet"))
    links = (spark.readStream.schema("host_key string")
             .option("maxFilesPerTrigger", 1).format("parquet")
             .load(str(src)))
    q = (count_stream(links).writeStream.format("memory")
         .queryName("cnt_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = [(r.host_key, r.n_cum) for r in
           spark.sql("SELECT * FROM cnt_out").collect()]
    # h0 emits twice (3 then cumulative 5) if the files split batches;
    # regardless of batching, per-host max == exact totals
    finals = {}
    for h, n in got:
        finals[h] = max(finals.get(h, 0), n)
    assert finals == {"h0": 5, "h1": 1, "h2": 4}
    # cumulative monotone: h0's emissions strictly increase
    h0 = sorted(n for h, n in got if h == "h0")
    assert h0 == sorted(set(h0))


# ---------------------------------------------------------------------------
# WARC source (block 11)
# ---------------------------------------------------------------------------

def test_warc_roundtrip_multirecord_and_truncation():
    from genesis_spark.sources.warc import encode_warc, parse_warc
    recs = [("warcinfo", None, "2026-01-01T00:00:00Z", b"software: t"),
            ("request", "http://h.onion/p", "2026-01-01T00:00:01Z", b"GET"),
            ("response", "http://h.onion/p", "2026-01-01T00:00:02Z",
             "héllo\r\n\r\nbody".encode())]   # payload contains CRLFCRLF
    blob = encode_warc(recs)
    out = list(parse_warc(blob))
    assert [(r[0], r[1]) for r in out] == [
        ("warcinfo", None), ("request", "http://h.onion/p"),
        ("response", "http://h.onion/p")]
    # Content-Length framing (not delimiter scanning) preserves a payload
    # that embeds the header terminator
    assert out[2][3].decode() == "héllo\r\n\r\nbody"
    # truncated trailing record stops cleanly, keeps the prefix
    assert len(list(parse_warc(blob[:-6]))) == 2
    # garbage header -> zero records, no raise
    assert list(parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")) == []


def test_read_warc_explodes_files_and_skips_null_blobs(spark):
    from genesis_spark.sources.warc import encode_warc, read_warc
    b1 = encode_warc([("response", "http://a.onion/", "d", b"one"),
                      ("response", "http://b.onion/", "d", b"two")])
    df = spark.createDataFrame(
        [(1, bytearray(b1)), (2, None)],
        "file_id long, warc_blob binary")
    rows = read_warc(df).collect()
    assert [(r["file_id"], r["rec_no"], r["target_uri"], r["payload_text"])
            for r in sorted(rows, key=lambda r: r["rec_no"])] == [
        (1, 0, "http://a.onion/", "one"), (1, 1, "http://b.onion/", "two")]


def test_warc_negative_content_length_terminates():
    """Regression (review finding): a record claiming a negative
    Content-Length must stop the scan, not loop forever re-yielding the
    same record."""
    from genesis_spark.sources.warc import parse_warc
    bad = b"WARC/1.0\r\nContent-Length: -33\r\n\r\n"
    assert list(parse_warc(bad)) == []
    # and a valid record BEFORE the malformed one is still returned
    from genesis_spark.sources.warc import encode_warc
    good = encode_warc([("response", "http://a.onion/", "d", b"ok")])
    assert len(list(parse_warc(good + bad))) == 1
