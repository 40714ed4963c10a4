"""Sequence packing (GPT-style concat-and-chunk training prep).

Within each source stream, documents are concatenated in doc_id order and
cut into fixed ``seq_len``-token blocks; each doc reports its starting
token offset and the block range it spans.

Two physically different plans, one result:

* ``shard_width=None`` — ONE window per source. Correct, and fine while a
  source fits a task; at 100 TB a 5 TB source becomes a single window
  partition = one straggler task.
* ``shard_width=K`` — the scale path: documents are range-sharded
  deterministically (``shard = doc_id // K``, so shards are contiguous in
  pack order), stage 1 computes per-(source, shard) token sums (a
  map-side-combinable agg), stage 2 prefix-sums those on the TINY
  (sources x shards) table (one window over O(|sources|*|shards|) rows),
  stage 3 broadcast-joins each shard's base offset back and runs the
  window WITHIN (source, shard) — partitions are bounded by K documents
  regardless of corpus size. This is the classic two-level scan
  (per-partition sums + small prefix + local offsets).

Both paths are deterministic (no sampling-based range partitioning), so
they agree bit-for-bit — ``test_pack_sharded_equals_flat`` asserts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_tokens(docs: DataFrame) -> DataFrame:
    return (docs.filter(F.col("text").isNotNull())
            .select("doc_id", "source",
                    F.size(F.split("text", " ")).alias("n_tokens")))


def _finish(d: DataFrame, seq_len: int) -> DataFrame:
    return d.select(
        "doc_id", "source", "n_tokens", "tok_offset",
        (F.col("tok_offset") / seq_len).cast("bigint").alias("block_first"),
        ((F.col("tok_offset") + F.col("n_tokens") - 1) / seq_len)
        .cast("bigint").alias("block_last"))


def pack_blocks(docs: DataFrame, seq_len: int = 2048,
                shard_width: int | None = None) -> DataFrame:
    """(doc_id, source, n_tokens, tok_offset, block_first, block_last).

    ``docs`` needs (doc_id, source, text). See module docstring for the
    flat-vs-sharded plan choice."""
    d = _with_tokens(docs)
    if shard_width is None:
        w = (Window.partitionBy("source").orderBy("doc_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        off = (F.sum("n_tokens").over(w) - F.col("n_tokens"))
        return _finish(d.select("doc_id", "source", "n_tokens",
                                off.alias("tok_offset")), seq_len)

    d = d.withColumn("_shard", (F.col("doc_id") / shard_width)
                     .cast("bigint"))
    # stage 1: per-shard totals (tiny)
    sums = (d.groupBy("source", "_shard")
            .agg(F.sum("n_tokens").alias("_shard_tokens")))
    # stage 2: exclusive prefix over shards, per source — O(shards) rows
    pw = (Window.partitionBy("source").orderBy("_shard")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    base = sums.select(
        "source", "_shard",
        (F.sum("_shard_tokens").over(pw) - F.col("_shard_tokens"))
        .alias("_base"))
    # stage 3: local window within the bounded (source, shard) partition
    lw = (Window.partitionBy("source", "_shard").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = (F.sum("n_tokens").over(lw) - F.col("n_tokens"))
    out = (d.join(F.broadcast(base), ["source", "_shard"])
           .select("doc_id", "source", "n_tokens",
                   (local + F.col("_base")).alias("tok_offset")))
    return _finish(out, seq_len)


def pack_spans(rows: DataFrame, seq_len: int = 2048,
               media_tokens: int = 64,
               doc_ord: Column | None = None) -> DataFrame:
    """Multimodal sequence packing over the interleaved span table — the
    Flamingo/MM1-style training prep where text spans cost their token
    count and each media span costs a fixed placeholder budget
    (``media_tokens`` image tokens).

    ``rows`` is the exploded span-row form ``(doc_id, offset, kind, text,
    media_ref, source)`` — spans of one source stream are concatenated in
    (doc_id, offset) order and cut into ``seq_len``-token blocks. Returns
    per-span ``(doc_id, offset, kind, cost, tok_offset, block_first,
    block_last)``.

    Plan is the two-level prefix scan from ``pack_blocks``'s sharded path,
    with the document as the natural shard: stage 1 sums span costs per
    doc (map-side combinable), stage 2 prefix-sums the per-doc totals in a
    window over the doc-level table (corpus/10^3 smaller than the span
    table), stage 3 broadcast-joins each doc's base offset back and runs
    the intra-doc window partitioned by (source, doc_id) — every window
    partition is bounded by spans-per-doc, never by corpus size, and a
    doc_id reused across sources never mixes streams. Link spans (text AND
    media_ref null on the text side / non-media) cost is their text token
    count or the media budget by the schemas.SPAN nullability contract:
    media = non-link rows with a media_ref.

    ``doc_ord`` is the document pack-order expression within a source
    stream; default is the doc_id itself (deterministic for any id type —
    string keys sort lexicographically). Pass e.g.
    ``F.col("doc_id").cast("bigint")`` for numeric order over numeric
    string ids."""
    if doc_ord is None:
        doc_ord = F.col("doc_id")
    is_media = F.col("media_ref").isNotNull() & (F.col("kind") != "link")
    cost = F.when(is_media, F.lit(media_tokens)).otherwise(
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")))
    d = rows.select("source", "doc_id", "offset", "kind",
                    cost.cast("bigint").alias("cost"),
                    doc_ord.alias("_doc_ord"))
    # stage 1: per-doc cost totals (tiny relative to span rows)
    sums = (d.groupBy("source", "doc_id", "_doc_ord")
            .agg(F.sum("cost").alias("_doc_cost")))
    # stage 2: exclusive prefix over docs within the source stream
    pw = (Window.partitionBy("source").orderBy("_doc_ord")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    base = sums.select(
        "source", "doc_id",
        (F.sum("_doc_cost").over(pw) - F.col("_doc_cost")).alias("_base"))
    # stage 3: intra-doc prefix, bounded by spans-per-doc
    lw = (Window.partitionBy("source", "doc_id").orderBy("offset")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = F.sum("cost").over(lw) - F.col("cost")
    out = (d.join(F.broadcast(base), ["source", "doc_id"])
           .select("doc_id", "offset", "kind", "cost",
                   (local + F.col("_base")).alias("tok_offset")))
    return out.select(
        "doc_id", "offset", "kind", "cost", "tok_offset",
        (F.col("tok_offset") / seq_len).cast("bigint").alias("block_first"),
        ((F.col("tok_offset") + F.col("cost") - 1) / seq_len)
        .cast("bigint").alias("block_last"))
