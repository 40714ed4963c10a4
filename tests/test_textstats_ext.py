"""Unit tests for the round-3 training-pipeline text operators
(repetition metrics, C4 line cleaning, PII redaction) and the
interleaved-span round-trip / media-context operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from genesis_spark.operators import textstats as TS
from genesis_spark.sources.interleaved import (explode_spans,
                                               interleaved_docs,
                                               media_with_context,
                                               reconstruct_docs)


# ---------------------------------------------------------------------------
# repetition metrics
# ---------------------------------------------------------------------------

def test_repetition_flags_degenerate_doc(spark):
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam spam"),
         (2, "the quick brown fox jumps over the lazy dog tonight")],
        ["doc_id", "text"])
    rows = {r.doc_id: r for r in TS.repetition_stats(docs).collect()}
    # doc 1: 5 words, 1 distinct -> dup 0.8; all 4 bigrams identical -> 1.0
    assert rows[1].dup_word_frac == 0.8
    assert rows[1].top_bigram_frac == 1.0
    assert rows[1].repetitive
    # doc 2: 10 words, 9 distinct ('the' twice) -> dup 0.1; bigrams unique
    assert rows[2].dup_word_frac == 0.1
    assert abs(rows[2].top_bigram_frac - round(1 / 9, 4)) < 1e-9
    assert not rows[2].repetitive


def test_repetition_single_word_doc(spark):
    docs = spark.createDataFrame([(1, "word")], ["doc_id", "text"])
    r = TS.repetition_stats(docs).collect()[0]
    assert r.n_words == 1 and r.top_bigram_frac == 0.0
    assert r.dup_word_frac == 0.0 and not r.repetitive


# ---------------------------------------------------------------------------
# C4 line cleaning
# ---------------------------------------------------------------------------

def test_c4_keeps_punctuated_long_lines_only(spark):
    # lines are 6-word chunks; craft 3 chunks:
    #   chunk0: 6 words ending '.'  -> kept
    #   chunk1: 6 words, no punct   -> dropped
    #   chunk2: 2-word tail with '.' -> dropped (min_words)
    text = ("one two three four five six. "
            "seven eight nine ten eleven twelve "
            "tail end.")
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = TS.c4_line_clean(docs).collect()[0]
    assert r.n_lines == 3 and r.n_kept == 1
    assert r.clean_text == "one two three four five six."


def test_c4_drops_brace_lines_and_lorem_docs(spark):
    brace = "{var} a b c d e. alpha beta gamma delta eps zeta."
    lorem = "a b c d e f. lorem ipsum x y z w."
    docs = spark.createDataFrame(
        [(1, brace), (2, lorem)], ["doc_id", "text"])
    rows = {r.doc_id: r for r in TS.c4_line_clean(docs).collect()}
    assert 2 not in rows                       # lorem doc dropped wholesale
    assert rows[1].n_kept == 1                 # brace line filtered
    assert "{" not in rows[1].clean_text


def test_c4_all_lines_dropped_doc_excluded(spark):
    docs = spark.createDataFrame([(1, "no punct here at all ok")],
                                 ["doc_id", "text"])
    assert TS.c4_line_clean(docs).count() == 0


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

def test_pii_redaction_counts_and_markers(spark):
    docs = spark.createDataFrame(
        [(1, "write to alice.smith+x@mail.example.org or +44 207 9460"),
         (2, "no pii here")],
        ["doc_id", "text"])
    ex = TS.redact_pii_exprs(F.col("text"))
    rows = {r.doc_id: r for r in docs.select(
        "doc_id", ex["redacted"].alias("redacted"),
        ex["n_emails"].alias("n_emails"),
        ex["n_phones"].alias("n_phones")).collect()}
    assert rows[1].n_emails == 1 and rows[1].n_phones == 1
    assert "<EMAIL>" in rows[1].redacted and "<PHONE>" in rows[1].redacted
    assert "alice" not in rows[1].redacted and "207" not in rows[1].redacted
    assert rows[2].redacted == "no pii here"
    assert rows[2].n_emails == 0 and rows[2].n_phones == 0


def test_pii_redaction_overlap_phone_wins(spark):
    """Phone-first ordering: when a phone's tail doubles as an email's
    local part, the phone is redacted (digits gone) and the '>' of the
    marker stops the email regex from eating it; the dangling '@domain'
    carries no PII digits. Counts reflect the original text."""
    docs = spark.createDataFrame([(1, "+1 234 5678@x.io")],
                                 ["doc_id", "text"])
    ex = TS.redact_pii_exprs(F.col("text"))
    r = docs.select(ex["redacted"].alias("redacted"),
                    ex["n_emails"].alias("n"),
                    ex["n_phones"].alias("p")).collect()[0]
    assert r.redacted == "<PHONE>@x.io"
    assert r.p == 1 and r.n == 1


def test_pii_redaction_multiple_matches(spark):
    docs = spark.createDataFrame(
        [(1, "a@b.io then c@d.io and +1 555 0100 also +33 612 3456")],
        ["doc_id", "text"])
    ex = TS.redact_pii_exprs(F.col("text"))
    r = docs.select(ex["redacted"].alias("redacted"),
                    ex["n_emails"].alias("n"),
                    ex["n_phones"].alias("p")).collect()[0]
    assert r.n == 2 and r.p == 2
    assert r.redacted == ("<EMAIL> then <EMAIL> and <PHONE> also <PHONE>")


# ---------------------------------------------------------------------------
# interleaved round-trip + media context
# ---------------------------------------------------------------------------

def test_reconstruct_roundtrip_and_manifest(spark):
    words = " ".join(f"w{i}" for i in range(60))   # 8 chunks, 2 images
    docs = spark.createDataFrame([(7, words)], ["doc_id", "text"])
    r = reconstruct_docs(interleaved_docs(docs)).collect()[0]
    assert r.text_rt == words
    assert r.n_sections == 8 and r.n_media == 2
    assert r.media_refs == ["7/img/1", "7/img/2"]


def test_media_context_is_nearest_preceding_section(spark):
    words = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame([(7, words)], ["doc_id", "text"])
    il = interleaved_docs(docs)
    ctx = {r.media_ref: r for r in media_with_context(il).collect()}
    spans = {r.offset: r for r in explode_spans(il).collect()}
    # each image's context is the section text immediately before it
    for ref, row in ctx.items():
        prev = spans[row.offset - 1]
        assert prev.kind == "section" and row.context == prev.text


def test_media_context_null_before_any_section(spark):
    rows = [("d", [{"kind": "image", "text": None,
                    "media_ref": "d/img/1", "offset": 0},
                   {"kind": "section", "text": "hello world",
                    "media_ref": None, "offset": 1},
                   {"kind": "image", "text": None,
                    "media_ref": "d/img/2", "offset": 2}])]
    df = spark.createDataFrame(
        rows, "doc_id string, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    got = {r.media_ref: r.context for r in media_with_context(df).collect()}
    assert got["d/img/1"] is None
    assert got["d/img/2"] == "hello world"


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def test_pack_blocks_offsets_and_blocks(spark):
    from genesis_spark.operators.pack import pack_blocks
    docs = spark.createDataFrame(
        [(1, "s", "a b c"), (2, "s", "d e"), (3, "s", "f g h i"),
         (10, "t", "x y z w")],
        ["doc_id", "source", "text"])
    rows = {r.doc_id: r for r in pack_blocks(docs, seq_len=4).collect()}
    # source s: doc1 off 0 (3 tok), doc2 off 3 (2 tok), doc3 off 5 (4 tok)
    assert rows[1].tok_offset == 0 and rows[1].block_first == 0 \
        and rows[1].block_last == 0
    assert rows[2].tok_offset == 3 and rows[2].block_first == 0 \
        and rows[2].block_last == 1          # spans the 4-token boundary
    assert rows[3].tok_offset == 5 and rows[3].block_first == 1 \
        and rows[3].block_last == 2
    # source t packs independently from offset 0
    assert rows[10].tok_offset == 0


def test_pack_sharded_equals_flat(spark):
    """The hierarchical scale path (range shards + prefix broadcast) must
    agree bit-for-bit with the flat one-window-per-source plan."""
    from genesis_spark.operators.pack import pack_blocks
    rows = [(i, f"src{i % 3}", " ".join("w" * 1 for _ in range(1 + i % 7)))
            for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    flat = {(r.doc_id): r for r in
            pack_blocks(docs, seq_len=16).collect()}
    for width in (1, 7, 64, 1000):
        sharded = pack_blocks(docs, seq_len=16, shard_width=width).collect()
        assert len(sharded) == len(flat)
        for r in sharded:
            f = flat[r.doc_id]
            assert (r.tok_offset, r.block_first, r.block_last) == \
                (f.tok_offset, f.block_first, f.block_last), (width, r)


def test_reconstruct_and_context_over_real_parse_output(spark):
    """The span operators must work on REAL parse_pages output (title/
    heading/text/section kinds, link spans excluded from both text and
    media) — not only the synthesized section/image table."""
    from genesis_spark.functions.parse import parse_pages
    html = ("<html><head><title>My Onion Page</title></head><body>"
            "<h1>market service data heading words here</h1>"
            "<p>the fast key order sort table scan merge part window "
            "small hash scan join order batch stream value</p>"
            "<img src='/img/a.png'>"
            "<p>spark group query row data slow small filter customer "
            "line the batch value merge line table data here</p>"
            "<a href='http://h1.onion/next'>next</a>"
            "</body></html>")
    pages = spark.createDataFrame(
        [("http://h1.onion/p", html)], ["url", "html"])
    parsed = parse_pages(pages).select(
        F.col("url").alias("doc_id"), "spans")
    spans = parsed.collect()[0].spans
    kinds = [s.kind for s in spans]
    assert "link" in kinds and "image" in kinds   # both non-text present

    r = reconstruct_docs(parsed).collect()[0]
    # text_rt = all text spans in document order, no media/link residue
    texts = [s.text for s in spans if s.media_ref is None]
    assert r.text_rt == " ".join(texts)
    assert r.n_sections == len(texts)
    # the link is NOT media; the image is
    assert all("/next" not in m for m in r.media_refs)
    assert any(m.endswith("/img/a.png") for m in r.media_refs)
    assert r.n_media == len(r.media_refs)

    ctx = media_with_context(parsed).collect()
    refs = {c.media_ref for c in ctx}
    assert all("/next" not in m for m in refs)    # link rows excluded
    img = [c for c in ctx if c.media_ref.endswith("/img/a.png")][0]
    # context = nearest preceding text span
    prev_texts = [s.text for s in spans
                  if s.media_ref is None and s.offset < img.offset]
    assert img.context == prev_texts[-1]
