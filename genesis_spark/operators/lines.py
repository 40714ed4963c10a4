"""Cross-document line/section-level dedup (boilerplate removal).

The CCNet / RefinedWeb preprocessing step the reference pipeline lacks a
distributed equivalent for: a line (here: a ``section`` span of the
interleaved table) that recurs verbatim across many documents is site
boilerplate (nav bars, cookie banners, footers) and is dropped from every
document, while the document itself survives with its remaining spans.

Plan shape (100 TB):

* stage 1 — document frequency per distinct section text. The wide text
  never shuffles: rows are keyed by ``xxhash64``-style ``md5`` digests
  first, and the (digest, doc_id) pairs are distinct-ed map-side before
  the count (`countDistinct` plans as partial dedup + final count).
* stage 2 — the boilerplate key set is, by construction, the high-df tail
  (only keys with df >= min_df survive), which is orders of magnitude
  smaller than the corpus — it broadcasts. Each span row gets an ``is_bp``
  flag from a broadcast LEFT join; no second shuffle of the corpus.
* stage 3 — per-document rebuild: one groupBy(doc_id) collecting the
  surviving (offset, text) structs, sorted by offset (collect_list order
  is nondeterministic; ``sort_array`` on the struct restores span order).

Documents whose every section is boilerplate still emit a row (empty
``text_clean``) — the flag-then-aggregate shape, not an anti-join, so the
output row set is exactly the input document set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def section_doc_freq(rows: DataFrame, min_df: int = 2) -> DataFrame:
    """Distinct-document frequency per section text, boilerplate keys only.

    ``rows`` is the exploded span-row form ``(doc_id, offset, kind, text,
    media_ref)`` (sources.interleaved.explode_spans). Returns ``(tkey,
    df)`` where ``tkey = md5(text)`` and ``df >= min_df``."""
    sec = rows.filter(F.col("media_ref").isNull() & F.col("text").isNotNull())
    return (sec.select(F.md5("text").alias("tkey"), "doc_id")
            .groupBy("tkey")
            .agg(F.countDistinct("doc_id").alias("df"))
            .filter(F.col("df") >= min_df))


def drop_boilerplate(rows: DataFrame, min_df: int = 2) -> DataFrame:
    """Remove cross-document boilerplate sections and rebuild each doc.

    Returns ``(doc_id, n_sections, n_dropped, text_clean)`` — one row per
    input document, ``text_clean`` the space-joined surviving sections in
    span (offset) order."""
    sec = rows.filter(F.col("media_ref").isNull() & F.col("text").isNotNull())
    bp = section_doc_freq(rows, min_df=min_df).select("tkey")
    flagged = (sec.withColumn("tkey", F.md5("text"))
               .join(F.broadcast(bp.withColumn("_bp", F.lit(True))),
                     "tkey", "left")
               .withColumn("is_bp", F.coalesce(F.col("_bp"), F.lit(False))))
    kept_struct = F.when(~F.col("is_bp"),
                         F.struct(F.col("offset"), F.col("text")))
    agg = (flagged.groupBy("doc_id")
           .agg(F.count("*").alias("n_sections"),
                F.sum(F.col("is_bp").cast("int")).alias("n_dropped"),
                F.sort_array(F.collect_list(kept_struct)).alias("_kept")))
    return agg.select(
        "doc_id", "n_sections", "n_dropped",
        F.array_join(F.transform("_kept", lambda s: s["text"]), " ")
         .alias("text_clean"))
