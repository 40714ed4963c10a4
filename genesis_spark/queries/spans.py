"""Registry family: Interleaved text+media spans (split from the monolithic queries.py)."""

from __future__ import annotations

from genesis_spark.queries._shared import *  # noqa: F401,F403



# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def q_spans_interleave(spark, sf_dir):
    """The input_hint table itself: synthesize the interleaved text+media
    span table deterministically from ``documents`` and emit the exploded
    span sequence — the driver's value hash over (doc_id, offset, kind,
    text, media_ref) IS a span-sequence-equality check per doc_id."""
    from genesis_spark.sources.interleaved import (explode_spans,
                                                   interleaved_docs)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return explode_spans(interleaved_docs(docs))


ORACLE_SPANS_INTERLEAVE = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS words
  FROM documents WHERE text IS NOT NULL
), ch AS (
  SELECT doc_id, list_transform(
      range(0, greatest(CAST(ceil(len(words) / 8.0) AS INT), 1)),
      i -> array_to_string(words[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')
  ) AS chunks FROM base
), il AS (
  SELECT doc_id, flatten(list_transform(chunks, (c, j) ->
      CASE WHEN j % 3 = 0 THEN
        [{'kind': 'section', 'text': c, 'media_ref': CAST(NULL AS VARCHAR)},
         {'kind': 'image', 'text': CAST(NULL AS VARCHAR),
          'media_ref': doc_id || '/img/' || CAST(j // 3 AS VARCHAR)}]
      ELSE
        [{'kind': 'section', 'text': c, 'media_ref': CAST(NULL AS VARCHAR)}]
      END)) AS spans
  FROM ch
), ex AS (
  SELECT doc_id, unnest(spans) AS s,
         generate_subscripts(spans, 1) - 1 AS off
  FROM il
)
SELECT doc_id, CAST(off AS INT) AS offset, s.kind AS kind,
       s.text AS text, s.media_ref AS media_ref
FROM ex
"""


def q_spans_reconstruct(spark, sf_dir):
    """Round-trip over the interleaved table: rebuild each doc's text from
    its section spans, collect the media manifest, and verify losslessness
    against the source — the invariant that makes the span table a storage
    format, not a view. Pure codegen + one broadcast-able join back."""
    from genesis_spark.sources.interleaved import (interleaved_docs,
                                                   reconstruct_docs)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    rt = reconstruct_docs(interleaved_docs(docs))
    src = docs.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("text").alias("src_text"))
    return (rt.join(src, "doc_id")
            .select("doc_id", "n_sections", "n_media",
                    (F.col("text_rt") == F.col("src_text"))
                    .alias("roundtrip_ok"),
                    F.array_join("media_refs", ",").alias("media_csv")))


ORACLE_SPANS_RECONSTRUCT = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
         string_split(text, ' ') AS words
  FROM documents WHERE text IS NOT NULL
), ch AS (
  SELECT doc_id, text, list_transform(
      range(0, greatest(CAST(ceil(len(words) / 8.0) AS INT), 1)),
      i -> array_to_string(words[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')
  ) AS chunks FROM base
)
SELECT doc_id,
       CAST(len(chunks) AS INT) AS n_sections,
       CAST(len(chunks) // 3 AS INT) AS n_media,
       array_to_string(chunks, ' ') = text AS roundtrip_ok,
       coalesce(array_to_string(list_transform(range(1, len(chunks) // 3 + 1),
                                               k -> doc_id || '/img/' ||
                                                    CAST(k AS VARCHAR)), ','),
                '') AS media_csv
FROM ch
"""


def q_spans_media_context(spark, sf_dir):
    """Image-caption pairing: every media span with the text of its nearest
    preceding section span (the caption candidate a multimodal training
    pipeline attaches to the image). One window pass per doc."""
    from genesis_spark.sources.interleaved import (interleaved_docs,
                                                   media_with_context)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return media_with_context(interleaved_docs(docs))


ORACLE_SPANS_MEDIA_CONTEXT = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS words
  FROM documents WHERE text IS NOT NULL
), ch AS (
  SELECT doc_id, list_transform(
      range(0, greatest(CAST(ceil(len(words) / 8.0) AS INT), 1)),
      i -> array_to_string(words[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')
  ) AS chunks FROM base
), il AS (
  SELECT doc_id, flatten(list_transform(chunks, (c, j) ->
      CASE WHEN j % 3 = 0 THEN
        [{'kind': 'section', 'text': c, 'media_ref': CAST(NULL AS VARCHAR)},
         {'kind': 'image', 'text': CAST(NULL AS VARCHAR),
          'media_ref': doc_id || '/img/' || CAST(j // 3 AS VARCHAR)}]
      ELSE
        [{'kind': 'section', 'text': c, 'media_ref': CAST(NULL AS VARCHAR)}]
      END)) AS spans
  FROM ch
), ex AS (
  SELECT doc_id, unnest(spans) AS s,
         generate_subscripts(spans, 1) - 1 AS off
  FROM il
), ctx AS (
  SELECT doc_id, CAST(off AS INT) AS offset, s.kind AS kind,
         s.media_ref AS media_ref,
         last_value(s.text IGNORE NULLS) OVER (
           PARTITION BY doc_id ORDER BY off
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS context
  FROM ex
)
SELECT doc_id, "offset", media_ref, context
FROM ctx WHERE kind <> 'section'
"""


def q_spans_boilerplate(spark, sf_dir):
    """CCNet/RefinedWeb-style cross-document boilerplate removal over the
    interleaved span table: a section text recurring in >= 2 distinct docs
    is site boilerplate and is dropped from every doc; docs are rebuilt
    from surviving sections. df-count keyed on md5 digests (wide text
    never shuffles), boilerplate set broadcast (high-df tail is tiny),
    flag-then-aggregate so fully-boilerplate docs still emit a row."""
    from genesis_spark.operators.lines import drop_boilerplate
    from genesis_spark.sources.interleaved import (explode_spans,
                                                   interleaved_docs)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    rows = explode_spans(interleaved_docs(docs))
    return drop_boilerplate(rows, min_df=2)


ORACLE_SPANS_BOILERPLATE = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS words
  FROM documents WHERE text IS NOT NULL
), ch AS (
  SELECT doc_id, list_transform(
      range(0, greatest(CAST(ceil(len(words) / 8.0) AS INT), 1)),
      i -> array_to_string(words[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')
  ) AS chunks FROM base
), sec AS (
  SELECT doc_id, unnest(chunks) AS chunk,
         generate_subscripts(chunks, 1) - 1 AS off
  FROM ch
), bp AS (
  SELECT chunk FROM sec GROUP BY chunk HAVING count(DISTINCT doc_id) >= 2
), fl AS (
  SELECT s.doc_id, s.chunk, s.off, b.chunk IS NOT NULL AS is_bp
  FROM sec s LEFT JOIN bp b ON s.chunk = b.chunk
)
SELECT doc_id, count(*) AS n_sections,
       CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       coalesce(array_to_string(
         list(chunk ORDER BY off) FILTER (WHERE NOT is_bp), ' '), '')
         AS text_clean
FROM fl GROUP BY doc_id
"""


def q_spans_pack_multimodal(spark, sf_dir):
    """Multimodal sequence packing over the interleaved table: spans of a
    source stream concatenated in (doc_id, offset) order and cut into
    512-token blocks, text spans costing their token count and each image
    span a fixed 64-token placeholder (the Flamingo/MM1 packing recipe).
    Two-level prefix scan — per-doc sums, tiny doc-level prefix window,
    broadcast base offsets, intra-doc window — so no window partition ever
    exceeds one document's spans (operators.pack.pack_spans)."""
    from genesis_spark.operators.pack import pack_spans
    from genesis_spark.sources.interleaved import (explode_spans,
                                                   interleaved_docs)
    d = _t(spark, sf_dir, "documents")
    rows = (explode_spans(interleaved_docs(d.select("doc_id", "text")))
            .join(d.select(F.col("doc_id").cast("string").alias("doc_id"),
                           "source"), "doc_id"))
    return pack_spans(rows, seq_len=512, media_tokens=64,
                      doc_ord=F.col("doc_id").cast("bigint"))


ORACLE_SPANS_PACK_MULTIMODAL = f"""
WITH {_SPANS_EX_SQL},
cost AS (
  SELECT e.doc_id, e.off, e.s.kind AS kind,
         CAST(CASE WHEN e.s.media_ref IS NOT NULL THEN 64
              ELSE len(string_split(e.s.text, ' ')) END AS BIGINT) AS cost,
         d.source AS source
  FROM ex e JOIN documents d ON e.doc_id = CAST(d.doc_id AS VARCHAR)
), o AS (
  SELECT *, CAST(sum(cost) OVER (
      PARTITION BY source
      ORDER BY CAST(doc_id AS BIGINT), off
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cost AS BIGINT)
    AS tok_offset
  FROM cost
)
SELECT doc_id, CAST(off AS INT) AS offset, kind, cost, tok_offset,
       tok_offset // 512 AS block_first,
       (tok_offset + cost - 1) // 512 AS block_last
FROM o
"""


def q_spans_media_dedup(spark, sf_dir):
    """Cross-document media dedup keyed by caption context (nearest
    preceding section text): the multimodal analogue of exact dedup —
    site-wide repeated assets collapse to one canonical copy per context
    cluster, earliest (doc_id, offset) wins. Wide captions reduced to md5
    digests before the groupBy; min-of-struct canonical pick is map-side
    combinable (sources.interleaved.dedup_media_by_context)."""
    from genesis_spark.sources.interleaved import (dedup_media_by_context,
                                                   interleaved_docs)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup_media_by_context(
        interleaved_docs(docs), doc_ord=F.col("doc_id").cast("bigint"))


ORACLE_SPANS_MEDIA_DEDUP = f"""
WITH {_SPANS_EX_SQL},
ctx AS (
  SELECT doc_id, CAST(off AS INT) AS offset, s.kind AS kind,
         s.media_ref AS media_ref,
         last_value(s.text IGNORE NULLS) OVER (
           PARTITION BY doc_id ORDER BY off
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS context
  FROM ex
), med AS (
  SELECT md5(coalesce(context, '')) AS content_key,
         CAST(doc_id AS BIGINT) AS d, "offset" AS o, media_ref AS r
  FROM ctx WHERE media_ref IS NOT NULL AND kind <> 'link'
), rk AS (
  SELECT *, row_number() OVER (PARTITION BY content_key ORDER BY d, o) AS rn,
         count(*) OVER (PARTITION BY content_key) AS n
  FROM med
)
SELECT content_key, n AS n_copies, CAST(d AS VARCHAR) AS canonical_doc,
       o AS canonical_offset, r AS canonical_ref
FROM rk WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# block 12: composed multimodal corpus pipeline, IDN host normalization
# ---------------------------------------------------------------------------

def q_spans_pipeline(spark, sf_dir):
    """The END-TO-END multimodal corpus pipeline as ONE oracle row — the
    interleaved-payload analogue of corpus_clean_full: interleave ->
    cross-doc boilerplate section removal (broadcast anti-join on the
    high-df key set) -> cross-doc media dedup (canonical copy per
    caption-context cluster only) -> multimodal sequence packing of the
    SURVIVING spans into 512-token blocks (two-level prefix, doc-bounded
    windows). Every stage is oracle-verified standalone
    (spans_boilerplate / spans_media_dedup / spans_pack_multimodal);
    this row verifies the COMPOSITION — boilerplate drops shift every
    downstream token offset, so a single misplaced span breaks the
    value hash."""
    from genesis_spark.operators.lines import section_doc_freq
    from genesis_spark.operators.pack import pack_spans
    from genesis_spark.sources.interleaved import (dedup_media_by_context,
                                                   explode_spans,
                                                   interleaved_docs)
    d = _t(spark, sf_dir, "documents")
    inter = interleaved_docs(d.select("doc_id", "text"))
    rows = explode_spans(inter)
    bp = section_doc_freq(rows, min_df=2).select("tkey")
    sec_kept = (rows.filter(F.col("media_ref").isNull()
                            & F.col("text").isNotNull())
                .withColumn("tkey", F.md5("text"))
                .join(F.broadcast(bp), "tkey", "left_anti")
                .drop("tkey"))
    canon = (dedup_media_by_context(
                 inter, doc_ord=F.col("doc_id").cast("bigint"))
             .select(F.col("canonical_doc").alias("doc_id"),
                     F.col("canonical_offset").alias("offset")))
    med_kept = (rows.filter(F.col("media_ref").isNotNull()
                            & (F.col("kind") != "link"))
                .join(canon, ["doc_id", "offset"]))
    survivors = sec_kept.unionByName(med_kept)
    rows2 = survivors.join(
        d.select(F.col("doc_id").cast("string").alias("doc_id"), "source"),
        "doc_id")
    return pack_spans(rows2, seq_len=512, media_tokens=64,
                      doc_ord=F.col("doc_id").cast("bigint"))


ORACLE_SPANS_PIPELINE = f"""
WITH {_SPANS_EX_SQL},
sec AS (
  SELECT doc_id, off, s.kind AS kind, s.text AS text
  FROM ex WHERE s.media_ref IS NULL AND s.text IS NOT NULL),
bp AS (SELECT text FROM sec GROUP BY text
       HAVING count(DISTINCT doc_id) >= 2),
sec_kept AS (
  SELECT doc_id, off, kind, text, CAST(NULL AS VARCHAR) AS media_ref
  FROM sec WHERE text NOT IN (SELECT text FROM bp)),
ctx AS (
  SELECT doc_id, off, s.kind AS kind, s.media_ref AS media_ref,
         last_value(s.text IGNORE NULLS) OVER (
           PARTITION BY doc_id ORDER BY off
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS context
  FROM ex),
med AS (
  SELECT md5(coalesce(context, '')) AS content_key,
         CAST(doc_id AS BIGINT) AS dord, doc_id, off
  FROM ctx WHERE media_ref IS NOT NULL AND kind <> 'link'),
canon AS (
  SELECT doc_id, off FROM (
    SELECT doc_id, off,
           row_number() OVER (PARTITION BY content_key
                              ORDER BY dord, off) AS rn
    FROM med) WHERE rn = 1),
med_kept AS (
  SELECT e.doc_id, e.off, e.s.kind AS kind, CAST(NULL AS VARCHAR) AS text,
         e.s.media_ref AS media_ref
  FROM ex e JOIN canon c ON c.doc_id = e.doc_id AND c.off = e.off),
surv AS (
  SELECT * FROM sec_kept UNION ALL SELECT * FROM med_kept),
cost AS (
  SELECT sv.doc_id, sv.off, sv.kind,
         CAST(CASE WHEN sv.media_ref IS NOT NULL THEN 64
              ELSE len(string_split(sv.text, ' ')) END AS BIGINT) AS cost,
         d.source AS source
  FROM surv sv JOIN documents d ON sv.doc_id = CAST(d.doc_id AS VARCHAR)),
o AS (
  SELECT *, CAST(sum(cost) OVER (
      PARTITION BY source
      ORDER BY CAST(doc_id AS BIGINT), off
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cost AS BIGINT)
    AS tok_offset
  FROM cost)
SELECT doc_id, CAST(off AS INT) AS offset, kind, cost, tok_offset,
       tok_offset // 512 AS block_first,
       (tok_offset + cost - 1) // 512 AS block_last
FROM o
"""


def q_spans_stats(spark, sf_dir):
    """Per-document modality-mix census over the interleaved span table
    (the input_hint shape) — what a multimodal mixture/packing stage
    reads before weighting text-vs-media tokens: span counts by class,
    kind-transition count (how INTERLEAVED the doc actually is, not just
    how much media it carries — a doc with all images appended at the end
    has the same n_media but 1 transition), text chars, and integer media
    density per 100k chars.

    Plan/scale: entirely per-row array codegen (filter / aggregate /
    element_at lambdas over the spans array) — ZERO shuffle at any scale;
    the census is map-side and column-pruned to (doc_id, text)."""
    from genesis_spark.sources.interleaved import interleaved_docs
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    n = F.size("spans")
    stats = interleaved_docs(docs).select(
        "doc_id",
        n.cast("int").alias("n_spans"),
        F.size(F.expr("filter(spans, s -> s.media_ref IS NULL)"))
        .cast("int").alias("n_text"),
        F.size(F.expr("filter(spans, s -> s.media_ref IS NOT NULL "
                      "AND s.kind <> 'link')")).cast("int").alias("n_media"),
        F.when(n >= 2, F.size(F.expr(
            "filter(sequence(1, size(spans) - 1), "
            "i -> element_at(spans, i).kind "
            "<> element_at(spans, i + 1).kind)")))
        .otherwise(F.lit(0)).cast("int").alias("n_transitions"),
        F.expr("aggregate(filter(spans, s -> s.media_ref IS NULL), "
               "CAST(0 AS BIGINT), (acc, s) -> acc + length(s.text))")
        .cast("long").alias("text_chars"))
    return stats.withColumn(
        "media_per_100k",
        F.expr("CAST(n_media AS BIGINT) * 100000 "
               "DIV greatest(text_chars, CAST(1 AS BIGINT))").cast("long"))


ORACLE_SPANS_STATS = f"""
WITH {_SPANS_EX_SQL},
st AS (
  SELECT doc_id,
         CAST(len(spans) AS INT) AS n_spans,
         CAST(len(list_filter(spans, s -> s.media_ref IS NULL)) AS INT)
           AS n_text,
         CAST(len(list_filter(spans, s -> s.media_ref IS NOT NULL
                              AND s.kind <> 'link')) AS INT) AS n_media,
         CAST(CASE WHEN len(spans) >= 2 THEN
                len(list_filter(range(1, len(spans)),
                    i -> spans[CAST(i AS INT)].kind
                         <> spans[CAST(i + 1 AS INT)].kind))
              ELSE 0 END AS INT) AS n_transitions,
         CAST(coalesce(list_sum(list_transform(
                list_filter(spans, s -> s.media_ref IS NULL),
                s -> len(s.text))), 0) AS BIGINT) AS text_chars
  FROM il)
SELECT doc_id, n_spans, n_text, n_media, n_transitions, text_chars,
       CAST(n_media * 100000 // greatest(text_chars, 1) AS BIGINT)
         AS media_per_100k
FROM st
"""


def q_spans_caption_pairs(spark, sf_dir):
    """Image-caption candidate mining over the interleaved span table —
    how multimodal training pairs (image, surrounding text) are lifted
    out of interleaved documents (the LAION/alt-text recipe, but from
    document STRUCTURE: the nearest text spans around each image, with
    their span distances, so a downstream filter can keep dist-1
    captions and drop far-context pairs): for every media span, the
    nearest preceding and nearest following text span and both span
    distances (NULL when the image opens/closes the document).

    Plan/scale: per-row array codegen (aggregate lambdas over the spans
    array) + one explode — ZERO shuffle at any scale; cost is O(spans^2)
    per doc in the worst case, bounded by the span count of a single
    document, never by the corpus."""
    from genesis_spark.sources.interleaved import interleaved_docs
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    il = interleaved_docs(docs)
    pairs = il.select(
        "doc_id", "spans",
        F.explode(F.expr(
            "transform("
            "  filter(sequence(1, size(spans)),"
            "         i -> element_at(spans, i).media_ref IS NOT NULL"
            "              AND element_at(spans, i).kind <> 'link'),"
            "  i -> struct("
            "    i AS img_idx,"
            "    aggregate(sequence(1, size(spans)), 0,"
            "      (acc, j) -> IF(j < i AND element_at(spans, j).media_ref"
            "                     IS NULL, j, acc)) AS prev_idx,"
            "    aggregate(sequence(1, size(spans)), 0,"
            "      (acc, j) -> IF(acc = 0 AND j > i AND"
            "                     element_at(spans, j).media_ref IS NULL,"
            "                     j, acc)) AS next_idx))"
        )).alias("p"))
    # boundary images (no text before/after) use sentinels '' / -1 instead
    # of NULL — the registry convention for nullable output columns (the
    # driver compare sorts mixed-type cells)
    return pairs.select(
        "doc_id",
        F.expr("element_at(spans, p.img_idx).media_ref").alias("media_ref"),
        F.expr("CASE WHEN p.prev_idx > 0 THEN"
               " element_at(spans, p.prev_idx).text ELSE '' END")
        .alias("caption_prev"),
        F.expr("CASE WHEN p.next_idx > 0 THEN"
               " element_at(spans, p.next_idx).text ELSE '' END")
        .alias("caption_next"),
        F.expr("CASE WHEN p.prev_idx > 0 THEN p.img_idx - p.prev_idx "
               "ELSE -1 END")
        .cast("int").alias("prev_dist"),
        F.expr("CASE WHEN p.next_idx > 0 THEN p.next_idx - p.img_idx "
               "ELSE -1 END")
        .cast("int").alias("next_dist"))


ORACLE_SPANS_CAPTION_PAIRS = f"""
WITH {_SPANS_EX_SQL},
imgs AS (
  SELECT doc_id, off, s.media_ref AS media_ref FROM ex
  WHERE s.media_ref IS NOT NULL AND s.kind <> 'link'),
texts AS (
  SELECT doc_id, off, s.text AS text FROM ex WHERE s.media_ref IS NULL),
prevs AS (
  SELECT i.doc_id, i.off, max(t.off) AS prev_off
  FROM imgs i LEFT JOIN texts t
    ON t.doc_id = i.doc_id AND t.off < i.off
  GROUP BY i.doc_id, i.off),
nexts AS (
  SELECT i.doc_id, i.off, min(t.off) AS next_off
  FROM imgs i LEFT JOIN texts t
    ON t.doc_id = i.doc_id AND t.off > i.off
  GROUP BY i.doc_id, i.off)
SELECT i.doc_id, i.media_ref,
       coalesce(tp.text, '') AS caption_prev,
       coalesce(tn.text, '') AS caption_next,
       CAST(coalesce(i.off - p.prev_off, -1) AS INT) AS prev_dist,
       CAST(coalesce(n.next_off - i.off, -1) AS INT) AS next_dist
FROM imgs i
JOIN prevs p ON p.doc_id = i.doc_id AND p.off = i.off
JOIN nexts n ON n.doc_id = i.doc_id AND n.off = i.off
LEFT JOIN texts tp ON tp.doc_id = i.doc_id AND tp.off = p.prev_off
LEFT JOIN texts tn ON tn.doc_id = i.doc_id AND tn.off = n.next_off
"""


def q_spans_token_budget(spark, sf_dir):
    """Multimodal context budgeting over the interleaved span table —
    the packing arithmetic a vision-language training pipeline runs
    before sequence assembly (each image costs a FIXED patch budget; a
    doc that exceeds the context must split): per doc, text tokens
    (whitespace), media spans x 256 patch tokens, total, whether it fits
    a 4096-token context, and the exact split count ceil(total/4096).

    Plan/scale: zero-shuffle array codegen per row (the spans census
    shape); the downstream packer (corpus_pack) consumes these
    numbers."""
    from genesis_spark.sources.interleaved import interleaved_docs
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    il = interleaved_docs(docs)
    text_tokens = F.expr(
        "aggregate(filter(spans, s -> s.media_ref IS NULL), "
        "CAST(0 AS BIGINT), "
        "(acc, s) -> acc + size(split(s.text, ' ')))")
    n_media = F.size(F.expr(
        "filter(spans, s -> s.media_ref IS NOT NULL "
        "AND s.kind <> 'link')"))
    budgeted = il.select(
        "doc_id",
        text_tokens.alias("text_tokens"),
        (n_media.cast("long") * 256).alias("media_tokens"))
    return budgeted.select(
        "doc_id", "text_tokens", "media_tokens",
        (F.col("text_tokens") + F.col("media_tokens")).cast("long")
        .alias("total_tokens"),
        ((F.col("text_tokens") + F.col("media_tokens")) <= 4096)
        .alias("fits_context"),
        F.expr("CAST((text_tokens + media_tokens + 4095) DIV 4096 "
               "AS BIGINT)").alias("n_splits"))


ORACLE_SPANS_TOKEN_BUDGET = f"""
WITH {_SPANS_EX_SQL},
budgeted AS (
  SELECT doc_id,
         CAST(coalesce(list_sum(list_transform(
                list_filter(spans, s -> s.media_ref IS NULL),
                s -> len(string_split(s.text, ' ')))), 0) AS BIGINT)
           AS text_tokens,
         CAST(len(list_filter(spans, s -> s.media_ref IS NOT NULL
                              AND s.kind <> 'link')) * 256 AS BIGINT)
           AS media_tokens
  FROM il)
SELECT doc_id, text_tokens, media_tokens,
       CAST(text_tokens + media_tokens AS BIGINT) AS total_tokens,
       (text_tokens + media_tokens) <= 4096 AS fits_context,
       CAST((text_tokens + media_tokens + 4095) // 4096 AS BIGINT)
         AS n_splits
FROM budgeted
"""


def q_spans_ref_integrity(spark, sf_dir):
    """Media referential-integrity audit over the interleaved span table
    — the table-maintenance check a lakehouse runs between the span rows
    and the media-blob table (a span pointing at a missing blob breaks
    training reads; an unreferenced blob is storage leak + compaction
    debt): per doc, span-side media refs, DANGLING refs (no media row —
    every (doc_id + ordinal) % 7 == 0 blob is deterministically absent)
    and ORPHAN media rows (no referencing span — every doc_id % 9 == 0
    doc carries one extra blob).

    Plan/scale: both sides derive per-row (zero shuffle), then two
    anti-join-shaped left joins keyed on the ref string and one agg —
    the exact shape of an Iceberg orphan-file sweep."""
    from genesis_spark.sources.interleaved import interleaved_docs
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    il = interleaved_docs(docs)
    refs = il.select(
        "doc_id",
        F.explode(F.expr("transform(filter(spans, "
                         "s -> s.media_ref IS NOT NULL), "
                         "s -> s.media_ref)")).alias("media_ref"))
    base = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr("greatest(CAST(ceil(size(split(text, ' ')) / 8.0) AS INT)"
               ", 1)").alias("n_chunks"))
    m = F.expr("n_chunks DIV 3")
    media = (base.withColumn("m", m)
             .select("doc_id", F.explode(F.expr(
                 "IF(m >= 1, sequence(1, m), array())")).alias("ord"))
             .filter((F.expr("CAST(doc_id AS BIGINT)") + F.col("ord"))
                     % 7 != 0)
             .select("doc_id",
                     F.concat("doc_id", F.lit("/img/"),
                              F.col("ord").cast("string"))
                     .alias("media_ref")))
    orphans = (base.filter(F.expr("CAST(doc_id AS BIGINT)") % 9 == 0)
               .select("doc_id",
                       F.concat("doc_id", F.lit("/img/"),
                                (F.expr("n_chunks DIV 3") + 1)
                                .cast("string")).alias("media_ref")))
    media_all = media.unionByName(orphans)
    dangling = (refs.join(media_all, ["doc_id", "media_ref"], "left_anti")
                .groupBy("doc_id")
                .agg(F.count("*").cast("long").alias("n_dangling")))
    orphan_ct = (media_all.join(refs, ["doc_id", "media_ref"],
                                "left_anti")
                 .groupBy("doc_id")
                 .agg(F.count("*").cast("long").alias("n_orphans")))
    per_doc = refs.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_refs"))
    return (per_doc
            .join(dangling, "doc_id", "left")
            .join(orphan_ct, "doc_id", "left")
            .select("doc_id", "n_refs",
                    F.coalesce("n_dangling", F.lit(0)).cast("long")
                    .alias("n_dangling"),
                    F.coalesce("n_orphans", F.lit(0)).cast("long")
                    .alias("n_orphans")))


ORACLE_SPANS_REF_INTEGRITY = f"""
WITH {_SPANS_EX_SQL},
refs AS (
  SELECT doc_id, s.media_ref AS media_ref FROM ex
  WHERE s.media_ref IS NOT NULL),
base2 AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, doc_id AS doc_num,
         greatest(CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INT),
                  1) AS n_chunks
  FROM documents WHERE text IS NOT NULL),
media AS (
  SELECT doc_id, doc_id || '/img/' || CAST(ord AS VARCHAR) AS media_ref
  FROM (SELECT doc_id, doc_num,
               unnest(range(1, n_chunks // 3 + 1)) AS ord
        FROM base2)
  WHERE (doc_num + ord) % 7 <> 0
  UNION ALL
  SELECT doc_id,
         doc_id || '/img/' || CAST(n_chunks // 3 + 1 AS VARCHAR)
  FROM base2 WHERE doc_num % 9 = 0),
dangling AS (
  SELECT r.doc_id, CAST(count(*) AS BIGINT) AS n_dangling
  FROM refs r LEFT JOIN media m
    ON m.doc_id = r.doc_id AND m.media_ref = r.media_ref
  WHERE m.media_ref IS NULL GROUP BY r.doc_id),
orphan_ct AS (
  SELECT m.doc_id, CAST(count(*) AS BIGINT) AS n_orphans
  FROM media m LEFT JOIN refs r
    ON r.doc_id = m.doc_id AND r.media_ref = m.media_ref
  WHERE r.media_ref IS NULL GROUP BY m.doc_id),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_refs
  FROM refs GROUP BY doc_id)
SELECT p.doc_id, p.n_refs,
       CAST(coalesce(d.n_dangling, 0) AS BIGINT) AS n_dangling,
       CAST(coalesce(o.n_orphans, 0) AS BIGINT) AS n_orphans
FROM per_doc p
LEFT JOIN dangling d ON d.doc_id = p.doc_id
LEFT JOIN orphan_ct o ON o.doc_id = p.doc_id
"""


def q_spans_fingerprint_dedup(spark, sf_dir):
    """Exact interleaved-document dedup on SPAN-SEQUENCE fingerprints —
    the multimodal twin of dedup_exact: two docs are duplicates iff
    their (kind, text, media ordinal) sequences match element-for-
    element in offset order. The media_ref's doc-identity prefix is
    stripped before hashing (refs embed doc_id; CONTENT equality must
    not depend on identity), so the twin-injected corpus yields real
    duplicate groups. One md5 per doc — the wide span payload never
    shuffles; the groupBy carries 16 bytes/doc.

    Exactness: the serialization uses explicit field separators and
    coalesced NULLs identically on both engines; groups report sorted
    doc_id CSVs (the dedup_exact convention)."""
    from genesis_spark.sources.interleaved import interleaved_docs

    docs = interleaved_docs(_corpus(spark, sf_dir))
    ser = F.md5(F.array_join(F.transform(
        "spans",
        lambda s: F.concat(
            s["kind"], F.lit("|"), F.coalesce(s["text"], F.lit("")),
            F.lit("|"),
            F.coalesce(F.regexp_replace(s["media_ref"], "^[^/]*/", ""),
                       F.lit("")),
            F.lit(";"))), ""))
    fp = docs.select("doc_id", ser.alias("fp"))
    return (fp.groupBy("fp")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.array_join(F.array_sort(F.collect_list("doc_id")), ",")
                 .alias("doc_ids_csv"))
            .filter(F.col("n_docs") > 1))

ORACLE_SPANS_FINGERPRINT_DEDUP = f"""
WITH {_CORPUS_SQL},
{_SPANS_EX_CORPUS_SQL},
ser AS (
  SELECT doc_id,
         md5(string_agg(
           s.kind || '|' || coalesce(s.text, '') || '|'
           || coalesce(regexp_replace(s.media_ref, '^[^/]*/', ''), '')
           || ';', '' ORDER BY off)) AS fp
  FROM ex GROUP BY doc_id)
SELECT fp, CAST(count(*) AS BIGINT) AS n_docs,
       string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids_csv
FROM ser GROUP BY fp HAVING count(*) > 1
"""


def q_spans_diff(spark, sf_dir):
    """Round-over-round SPAN-level change extraction — the incremental-
    corpus-update primitive for the interleaved payload: re-crawl the
    same docs (round 2 mutates a third of them with an appended tail,
    drops the first word of another third — shifting every chunk — and
    leaves the rest byte-identical), then diff the two span tables at
    (doc_id, offset) via ONE full-outer join with null-safe struct
    comparison. Per-doc change census (same/changed/added/removed) is
    what the recrawl scheduler banks and the corpus updater uses to
    re-process only changed docs.

    Plan/scale: the join is (doc_id, offset)-equi on identically
    partitioned sides; the census is map-side combinable. Hashes of
    span text never leave the join — at 10^10 docs swap text equality
    for digest equality, same plan."""
    from genesis_spark.sources.interleaved import (explode_spans,
                                                   interleaved_docs)

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    k = F.col("doc_id")
    text2 = (F.when(k % 3 == 0, F.concat("text", F.lit(" extra tail")))
             .when(k % 3 == 1, F.regexp_replace("text", "^[^ ]+ ", ""))
             .otherwise(F.col("text")))
    r1 = explode_spans(interleaved_docs(d))
    r2 = explode_spans(interleaved_docs(d.select("doc_id",
                                                 text2.alias("text"))))
    a = r1.select("doc_id", "offset", F.col("kind").alias("k1"),
                  F.col("text").alias("t1"),
                  F.col("media_ref").alias("m1"))
    b = r2.select("doc_id", "offset", F.col("kind").alias("k2"),
                  F.col("text").alias("t2"),
                  F.col("media_ref").alias("m2"))
    j = a.join(b, ["doc_id", "offset"], "full_outer")
    cls = (F.when(F.col("k1").isNull(), "added")
           .when(F.col("k2").isNull(), "removed")
           .when(F.col("k1").eqNullSafe(F.col("k2"))
                 & F.col("t1").eqNullSafe(F.col("t2"))
                 & F.col("m1").eqNullSafe(F.col("m2")), "same")
           .otherwise("changed"))
    per_doc = (j.select("doc_id", cls.alias("cls"))
               .groupBy("doc_id")
               .agg(F.sum((F.col("cls") == "same").cast("int"))
                    .cast("long").alias("n_same"),
                    F.sum((F.col("cls") == "changed").cast("int"))
                    .cast("long").alias("n_changed"),
                    F.sum((F.col("cls") == "added").cast("int"))
                    .cast("long").alias("n_added"),
                    F.sum((F.col("cls") == "removed").cast("int"))
                    .cast("long").alias("n_removed")))
    return per_doc.withColumn(
        "status",
        F.when((F.col("n_changed") + F.col("n_added")
                + F.col("n_removed")) == 0, "unchanged")
        .otherwise("changed"))


ORACLE_SPANS_DIFF = f"""
WITH {_SPANS_EX_SQL},
d2 AS (
  SELECT doc_id,
         CASE WHEN CAST(doc_id AS BIGINT) % 3 = 0
                THEN text || ' extra tail'
              WHEN CAST(doc_id AS BIGINT) % 3 = 1
                THEN regexp_replace(text, '^[^ ]+ ', '')
              ELSE text END AS text
  FROM documents WHERE text IS NOT NULL),
base2 AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS words
  FROM d2
), ch2 AS (
  SELECT doc_id, list_transform(
      range(0, greatest(CAST(ceil(len(words) / 8.0) AS INT), 1)),
      i -> array_to_string(words[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')
  ) AS chunks FROM base2
), il2 AS (
  SELECT doc_id, flatten(list_transform(chunks, (c, j) ->
      CASE WHEN j % 3 = 0 THEN
        [{{'kind': 'section', 'text': c, 'media_ref': CAST(NULL AS VARCHAR)}},
         {{'kind': 'image', 'text': CAST(NULL AS VARCHAR),
          'media_ref': doc_id || '/img/' || CAST(j // 3 AS VARCHAR)}}]
      ELSE
        [{{'kind': 'section', 'text': c, 'media_ref': CAST(NULL AS VARCHAR)}}]
      END)) AS spans
  FROM ch2
), ex2 AS (
  SELECT doc_id, unnest(spans) AS s,
         generate_subscripts(spans, 1) - 1 AS off
  FROM il2
),
j AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.s.kind IS NOT DISTINCT FROM b.s.kind
               AND a.s.text IS NOT DISTINCT FROM b.s.text
               AND a.s.media_ref IS NOT DISTINCT FROM b.s.media_ref
                THEN 'same'
              ELSE 'changed' END AS cls
  FROM ex a FULL OUTER JOIN ex2 b
    ON a.doc_id = b.doc_id AND a.off = b.off),
pd AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN cls = 'same' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_same,
         CAST(sum(CASE WHEN cls = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_changed,
         CAST(sum(CASE WHEN cls = 'added' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_added,
         CAST(sum(CASE WHEN cls = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed
  FROM j GROUP BY doc_id)
SELECT doc_id, n_same, n_changed, n_added, n_removed,
       CASE WHEN n_changed + n_added + n_removed = 0 THEN 'unchanged'
            ELSE 'changed' END AS status
FROM pd
"""


def q_spans_multimodal3(spark, sf_dir):
    """THREE-modality interleaving — the span payload generalized past
    text+image: audio spans join the sequence (after every 5th chunk,
    beside the image-every-3rd rule), and the census reports per-doc
    modality counts, kind TRANSITIONS (the interleaving structure
    itself), and the context-window token bill under per-kind costs
    (section = its token count, image = 64, audio = 128 — the
    multimodal budgeting constants spans_token_budget established).
    Proves the (kind, text, media_ref, offset) schema carries any
    modality mix without change — the axes-A+B payload claim.

    Plan/scale: synthesis and census are codegen (flatten/transform +
    one posexplode + one per-doc window for transitions); pixels/PCM
    never appear — media spans are refs, the modality kernels
    (media_*) own the bytes."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select(F.col("doc_id").cast("string").alias("doc_id"), "text"))
    words = F.split(F.col("text"), " ")
    n_chunks = F.greatest(
        (F.ceil(F.size(words) / F.lit(8))).cast("int"), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * 8 + 1, 8), " "))

    def sec(c):
        return F.struct(F.lit("section").alias("kind"),
                        F.size(F.split(c, " ")).cast("long").alias("cost"))

    img = F.struct(F.lit("image").alias("kind"),
                   F.lit(64).cast("long").alias("cost"))
    aud = F.struct(F.lit("audio").alias("kind"),
                   F.lit(128).cast("long").alias("cost"))
    spans = F.flatten(F.transform(
        chunks,
        lambda c, i: F.when((i + 1) % 15 == 0,
                            F.array(sec(c), img, aud))
        .when((i + 1) % 3 == 0, F.array(sec(c), img))
        .when((i + 1) % 5 == 0, F.array(sec(c), aud))
        .otherwise(F.array(sec(c)))))
    ex = d.select("doc_id", F.posexplode(spans).alias("off", "s"))
    w = Window.partitionBy("doc_id").orderBy("off")
    flagged = ex.withColumn(
        "trans",
        (F.col("s.kind") != F.lag("s.kind").over(w)).cast("int"))
    return (flagged.groupBy("doc_id")
            .agg(F.sum((F.col("s.kind") == "section").cast("int"))
                 .cast("long").alias("n_sections"),
                 F.sum((F.col("s.kind") == "image").cast("int"))
                 .cast("long").alias("n_images"),
                 F.sum((F.col("s.kind") == "audio").cast("int"))
                 .cast("long").alias("n_audio"),
                 F.sum(F.coalesce("trans", F.lit(0))).cast("long")
                 .alias("n_transitions"),
                 F.sum("s.cost").cast("long").alias("total_tokens")))


ORACLE_SPANS_MULTIMODAL3 = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS words
  FROM documents WHERE text IS NOT NULL
), ch AS (
  SELECT doc_id, list_transform(
      range(0, greatest(CAST(ceil(len(words) / 8.0) AS INT), 1)),
      i -> array_to_string(words[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')
  ) AS chunks FROM base
), il AS (
  SELECT doc_id, flatten(list_transform(chunks, (c, j) ->
      CASE WHEN j % 15 = 0 THEN
        [{'kind': 'section',
          'cost': CAST(len(string_split(c, ' ')) AS BIGINT)},
         {'kind': 'image', 'cost': CAST(64 AS BIGINT)},
         {'kind': 'audio', 'cost': CAST(128 AS BIGINT)}]
      WHEN j % 3 = 0 THEN
        [{'kind': 'section',
          'cost': CAST(len(string_split(c, ' ')) AS BIGINT)},
         {'kind': 'image', 'cost': CAST(64 AS BIGINT)}]
      WHEN j % 5 = 0 THEN
        [{'kind': 'section',
          'cost': CAST(len(string_split(c, ' ')) AS BIGINT)},
         {'kind': 'audio', 'cost': CAST(128 AS BIGINT)}]
      ELSE
        [{'kind': 'section',
          'cost': CAST(len(string_split(c, ' ')) AS BIGINT)}]
      END)) AS spans
  FROM ch
), ex AS (
  SELECT doc_id, unnest(spans) AS s,
         generate_subscripts(spans, 1) - 1 AS off
  FROM il
), fl AS (
  SELECT doc_id, s.kind AS kind, s.cost AS cost,
         CASE WHEN s.kind <> lag(s.kind) OVER (PARTITION BY doc_id
                                               ORDER BY off)
              THEN 1 ELSE 0 END AS trans
  FROM ex)
SELECT doc_id,
       CAST(sum(CASE WHEN kind = 'section' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sections,
       CAST(sum(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_images,
       CAST(sum(CASE WHEN kind = 'audio' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_audio,
       CAST(sum(coalesce(trans, 0)) AS BIGINT) AS n_transitions,
       CAST(sum(cost) AS BIGINT) AS total_tokens
FROM fl GROUP BY doc_id
"""


def q_spans_alt_text_audit(spark, sf_dir):
    """Image CAPTION-coverage audit over the interleaved span
    table — a multimodal training pair is only as good as its
    text side (LAION-style pipelines drop images without usable
    captions), and spans_caption_pairs MINES the pairs; this row
    AUDITS coverage: an image span counts as captioned when an
    adjacent text span (offset +-1) carries >= 20 chars. Per doc:
    images, captioned images, coverage ppm, and the audit class
    (no_media / full / partial / bare).

    Plan/scale: per-row array lambdas with CASE-guarded
    element_at (ANSI-safe bounds) — zero shuffle."""
    from genesis_spark.sources.interleaved import interleaved_docs
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    il = interleaved_docs(docs)
    is_img = "s.media_ref IS NOT NULL AND s.kind <> 'link'"
    prev_ok = ("CASE WHEN s.offset >= 1 THEN "
               "element_at(spans, s.offset).media_ref IS NULL AND "
               "length(element_at(spans, s.offset).text) >= 20 "
               "ELSE false END")
    next_ok = ("CASE WHEN s.offset + 2 <= size(spans) THEN "
               "element_at(spans, s.offset + 2).media_ref IS NULL AND "
               "length(element_at(spans, s.offset + 2).text) >= 20 "
               "ELSE false END")
    out = il.select(
        "doc_id",
        F.size(F.expr(f"filter(spans, s -> {is_img})"))
        .cast("long").alias("n_images"),
        F.size(F.expr(f"filter(spans, s -> ({is_img}) AND "
                      f"(({prev_ok}) OR ({next_ok})))"))
        .cast("long").alias("n_captioned"))
    cov = F.when(F.col("n_images") > 0,
                 F.expr("n_captioned * 1000000 DIV n_images")) \
        .otherwise(F.lit(0)).cast("long")
    cls = (F.when(F.col("n_images") == 0, F.lit("no_media"))
           .when(F.col("n_captioned") == F.col("n_images"),
                 F.lit("full"))
           .when(F.col("n_captioned") > 0, F.lit("partial"))
           .otherwise(F.lit("bare")))
    return (out.withColumn("coverage_ppm", cov)
            .withColumn("audit_class", cls))


ORACLE_SPANS_ALT_TEXT_AUDIT = f"""
WITH {_SPANS_EX_SQL},
aud AS (
  SELECT doc_id,
         CAST(len(list_filter(spans, s -> s.media_ref IS NOT NULL
              AND s.kind <> 'link')) AS BIGINT) AS n_images,
         CAST(len(list_filter(range(1, len(spans) + 1), i ->
           spans[CAST(i AS INT)].media_ref IS NOT NULL
           AND spans[CAST(i AS INT)].kind <> 'link' AND (
             (CASE WHEN i >= 2 THEN
                spans[CAST(i - 1 AS INT)].media_ref IS NULL AND
                len(spans[CAST(i - 1 AS INT)].text) >= 20
              ELSE false END)
             OR
             (CASE WHEN i + 1 <= len(spans) THEN
                spans[CAST(i + 1 AS INT)].media_ref IS NULL
                AND len(spans[CAST(i + 1 AS INT)].text) >= 20
              ELSE false END)))) AS BIGINT) AS n_captioned
  FROM il)
SELECT doc_id, n_images, n_captioned,
       CAST(CASE WHEN n_images > 0
                 THEN n_captioned * 1000000 // n_images
                 ELSE 0 END AS BIGINT) AS coverage_ppm,
       CASE WHEN n_images = 0 THEN 'no_media'
            WHEN n_captioned = n_images THEN 'full'
            WHEN n_captioned > 0 THEN 'partial'
            ELSE 'bare' END AS audit_class
FROM aud
"""


def q_spans_offset_repair(spark, sf_dir):
    """Span-offset integrity audit over the interleaved table — the
    write-path invariant of the input_hint schema made checkable
    (every doc's offsets must be the dense sequence 0..n-1 in span
    order; a merge of two partial parses, or a retried writer,
    produces exactly the duplicate/gap/out-of-order corruptions
    planted here): per doc, duplicate-offset count, gap count
    (sorted successor difference > 1), order flag (offsets already
    sorted), misplaced count vs the dense renumber — and the repair
    verdict a compactor acts on.

    Corruption plant: offset = pos+3 where (doc_id + pos) % 7 = 0
    (one bump creates a gap AND usually a duplicate AND an
    inversion), applied HERE on top of the shared well-formed
    interleave — the source fixture stays clean for every other
    spans row.

    Plan/scale: array codegen only (transform/array_sort/filter) —
    zero shuffles; the audit fuses into any scan of the table."""
    from genesis_spark.sources.interleaved import interleaved_docs
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    il = interleaved_docs(docs)
    offs = F.expr(
        "transform(spans, (s, i) -> CASE WHEN (doc_id + i) % 7 = 0 "
        "THEN cast(i + 3 as int) ELSE cast(i as int) END)")
    base = il.select(F.col("doc_id").cast("long").alias("doc_id"),
                     offs.alias("offs"))
    base = base.withColumn("sortd", F.expr("array_sort(offs)"))
    n = F.size("offs")
    return base.select(
        "doc_id",
        n.cast("int").alias("n_spans"),
        (n - F.size(F.expr("array_distinct(offs)"))).cast("int")
        .alias("n_dups"),
        F.when(n >= 2, F.size(F.expr(
            "filter(sequence(1, size(sortd) - 1), "
            "i -> element_at(sortd, i + 1) - element_at(sortd, i)"
            " > 1)"))).otherwise(F.lit(0)).cast("int").alias("n_gaps"),
        (F.col("offs") == F.col("sortd")).cast("int").alias("in_order"),
        F.expr("size(filter(sequence(1, size(sortd)), "
               "i -> element_at(sortd, i) <> i - 1))").cast("int")
        .alias("n_misplaced"),
    ).withColumn(
        "needs_repair",
        ((F.col("n_dups") > 0) | (F.col("n_gaps") > 0)
         | (F.col("in_order") == 0) | (F.col("n_misplaced") > 0))
        .cast("int"))


ORACLE_SPANS_OFFSET_REPAIR = f"""
WITH {_SPANS_EX_SQL},
corr AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_transform(spans, (s, i) ->
           CASE WHEN (CAST(doc_id AS BIGINT) + (i - 1)) % 7 = 0
                THEN (i - 1) + 3 ELSE i - 1 END) AS offs
  FROM il),
srt AS (
  SELECT doc_id, offs, list_sort(offs) AS sortd FROM corr),
audit AS (
  SELECT doc_id,
         CAST(len(offs) AS INT) AS n_spans,
         CAST(len(offs) - len(list_distinct(offs)) AS INT) AS n_dups,
         CAST(CASE WHEN len(offs) >= 2 THEN
             len(list_filter(range(1, len(sortd)),
                 i -> sortd[CAST(i + 1 AS INT)]
                      - sortd[CAST(i AS INT)] > 1))
           ELSE 0 END AS INT) AS n_gaps,
         CAST(offs = sortd AS INT) AS in_order,
         CAST(len(list_filter(range(1, len(sortd) + 1),
              i -> sortd[CAST(i AS INT)] <> i - 1)) AS INT)
           AS n_misplaced
  FROM srt)
SELECT doc_id, n_spans, n_dups, n_gaps, in_order, n_misplaced,
       CAST(CASE WHEN n_dups > 0 OR n_gaps > 0 OR in_order = 0
                  OR n_misplaced > 0 THEN 1 ELSE 0 END AS INT)
         AS needs_repair
FROM audit
"""
