"""Deterministic synthesis of the interleaved text+media document table.

The engine's canonical input (north rule / input_hint) is an Iceberg-style
table of interleaved documents::

    (doc_id: string,
     spans:  array<struct<kind:string, text:string,
                          media_ref:string, offset:int>>)

which is exactly the shape ``functions.parse.parse_pages`` emits for crawled
HTML (reference parity: the reference parser's span stream,
``/root/reference/app/raw/parsers/shared/main_content_parser.py`` — title /
section / image / link events in document order). Real crawls produce it
from pages; tests and benchmarks need the SAME shape synthesized
deterministically from the driver's ``documents`` parquet with no external
data and no randomness, so the synthesis must be expressible both in Spark
(pure codegen — no UDF) and in ANSI SQL for the DuckDB oracle.

Synthesis rule (pure function of (doc_id, text)):

* split ``text`` on single spaces; group into chunks of ``words_per_span``
  words → one ``section`` span per chunk, in order;
* after every ``media_every``-th section, insert one ``image`` span whose
  ``media_ref`` is ``{doc_id}/img/{k}`` (k = 1-based media ordinal) —
  the interleaving;
* ``offset`` is the 0-based position in the final interleaved sequence.

Everything runs JVM-side (split / transform / flatten / slice in
whole-stage codegen); there is no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interleaved_docs(docs: DataFrame, words_per_span: int = 8,
                     media_every: int = 3) -> DataFrame:
    """Synthesize the interleaved span table from a ``(doc_id, text)``
    DataFrame. Returns ``(doc_id, spans)`` in the input_hint schema; span
    structs carry (kind, text, media_ref, offset) in that field order."""
    w, m = words_per_span, media_every
    words = F.split(F.col("text"), " ")
    n_chunks = F.greatest(
        (F.ceil(F.size(words) / F.lit(w))).cast("int"), F.lit(1))

    def section(c):
        return F.struct(F.lit("section").alias("kind"), c.alias("text"),
                        F.lit(None).cast("string").alias("media_ref"))

    def image(i):
        ref = F.concat(F.col("doc_id").cast("string"), F.lit("/img/"),
                       F.floor((i + 1) / F.lit(m)).cast("int").cast("string"))
        return F.struct(F.lit("image").alias("kind"),
                        F.lit(None).cast("string").alias("text"),
                        ref.alias("media_ref"))

    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * w + 1, w), " "))
    interleaved = F.flatten(F.transform(
        chunks,
        lambda c, i: F.when((i + 1) % m == 0,
                            F.array(section(c), image(i)))
                      .otherwise(F.array(section(c)))))
    spans = F.transform(
        interleaved,
        lambda s, i: F.struct(s["kind"].alias("kind"),
                              s["text"].alias("text"),
                              s["media_ref"].alias("media_ref"),
                              i.cast("int").alias("offset")))
    return (docs.filter(F.col("text").isNotNull())
            .select(F.col("doc_id").cast("string").alias("doc_id"),
                    spans.alias("spans")))


def _is_text(s):
    # schemas.SPAN contract: text spans (title|heading|text|section) carry
    # media_ref = NULL; media and link spans carry text = NULL.
    return s["media_ref"].isNull()


def _is_media(s):
    # link spans also carry a media_ref (the resolved URL) but are not
    # media — exclude them from manifests and caption pairing.
    return s["media_ref"].isNotNull() & (s["kind"] != "link")


def reconstruct_docs(df: DataFrame) -> DataFrame:
    """Inverse of the interleave: rebuild each document's text from its
    text spans (array order IS offset order — ``F.filter`` preserves it)
    and collect the ``media_ref`` manifest from its media spans. Span
    classes follow the schemas.SPAN nullability contract, so title/
    heading/text spans from real parse output reconstruct too, and link
    spans are neither text nor media.

    Returns ``(doc_id, text_rt, media_refs, n_sections, n_media)``. The
    round-trip invariant — ``text_rt`` equals the source text the table was
    interleaved from — is what makes the span table a lossless storage
    format for interleaved text+media documents (north-rule payload). Pure
    codegen: filter/transform/array_join, no shuffle, no UDF."""
    secs = F.filter("spans", _is_text)
    media = F.filter("spans", _is_media)
    return df.select(
        "doc_id",
        F.array_join(F.transform(secs, lambda s: s["text"]), " ")
         .alias("text_rt"),
        F.transform(media, lambda s: s["media_ref"]).alias("media_refs"),
        F.size(secs).alias("n_sections"),
        F.size(media).alias("n_media"))


def media_with_context(df: DataFrame) -> DataFrame:
    """Image-caption pairing over the interleaved table: for every media
    span, the text of the nearest PRECEDING text span (the caption
    candidate a multimodal training pipeline pairs with the image). Link
    spans are neither media nor context (schemas.SPAN kinds).

    Shape: explode to per-span rows, then one window per doc —
    ``last(text, ignorenulls=True)`` ordered by offset gives each row the
    latest text-span content at-or-before it (media/link spans carry text
    = NULL so they never become context); media rows then carry their
    context. One shuffle on doc_id; at 100 TB the partition key is the
    document, so context never crosses executors and skew is bounded by
    max spans-per-doc, not corpus size."""
    from pyspark.sql import Window
    w = (Window.partitionBy("doc_id").orderBy("offset")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    rows = explode_spans(df)
    return (rows
            .withColumn("context", F.last("text", ignorenulls=True).over(w))
            .filter(F.col("media_ref").isNotNull()
                    & (F.col("kind") != "link"))
            .select("doc_id", "offset", "media_ref", "context"))


def dedup_media_by_context(df: DataFrame, doc_ord=None) -> DataFrame:
    """Cross-document media dedup keyed by caption context — the
    multimodal analogue of exact text dedup: two images that appear under
    the same caption text (the nearest preceding section span) are treated
    as the same asset (site-wide logos, shared illustrations), and one
    canonical copy is kept per context cluster.

    Returns one row per distinct context cluster: ``(content_key,
    n_copies, canonical_doc, canonical_offset, canonical_ref)`` — the
    canonical copy is the earliest by (doc_id, offset), deterministic.

    Plan: the ``media_with_context`` window pass (one shuffle on doc_id),
    then one groupBy on the 32-byte ``md5(context)`` digest — the wide
    caption text never shuffles; min-of-struct gives the canonical pick
    and plans as a map-side-combinable agg, so the shuffle after partial
    aggregation carries one row per (partition, key).

    ``doc_ord`` orders documents for the canonical pick; default is the
    doc_id itself (deterministic for any id type). Pass e.g.
    ``F.col("doc_id").cast("bigint")`` for numeric order when ids are
    numeric strings."""
    if doc_ord is None:
        doc_ord = F.col("doc_id")
    ctx = media_with_context(df)
    keyed = ctx.select(
        F.md5(F.coalesce("context", F.lit(""))).alias("content_key"),
        F.struct(doc_ord.alias("ord"),
                 F.col("doc_id").alias("d"),
                 F.col("offset").alias("o"),
                 F.col("media_ref").alias("r")).alias("pick"))
    agg = (keyed.groupBy("content_key")
           .agg(F.count("*").alias("n_copies"),
                F.min("pick").alias("c")))
    return agg.select(
        "content_key", "n_copies",
        F.col("c.d").alias("canonical_doc"),
        F.col("c.o").alias("canonical_offset"),
        F.col("c.r").alias("canonical_ref"))


def explode_spans(df: DataFrame) -> DataFrame:
    """Per-span rows ``(doc_id, offset, kind, text, media_ref)`` from the
    interleaved table — the row form the span-sequence-equality checks hash.
    ``explode_outer`` preserves array order within each doc; the _outer
    variant (identical here: spans is never empty) keeps Catalyst's
    InferFiltersFromGenerate from injecting a ``size(spans) > 0`` filter
    that would re-evaluate the whole span-construction expression."""
    return (df.select("doc_id", F.explode_outer("spans").alias("s"))
            .select("doc_id",
                    F.col("s.offset").alias("offset"),
                    F.col("s.kind").alias("kind"),
                    F.col("s.text").alias("text"),
                    F.col("s.media_ref").alias("media_ref")))
