"""Document deduplication operators for training-data pipelines.

Four families, all engine-portable (the hash primitives are md5-hex based so
DuckDB oracles can replay them bit-for-bit — no engine-specific hash()):

  exact          hash-groupBy keep-first (reference D1's exactness, scaled)
  minhash-LSH    word-shingles -> 16-slot minhash signature -> 4 bands ->
                 band-bucket equi-joins -> jaccard estimate
  simhash        16-bit sign-aggregated word-hash fingerprint -> bucket
  ngram-jaccard  exact jaccard via shingle explode + equi-join + count ratio

Every stage is shuffle-conscious: candidate pairs come from band/bucket
equi-joins (never cross joins), and pair dedup uses union-of-joins +
distinct. All expressions are JVM-side (whole-stage codegen); no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS


def shingles_expr(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles; a short text yields itself as one shingle."""
    words = F.split(text, " ")
    idx = F.sequence(F.lit(0), F.size(words) - n)
    gram = F.transform(
        idx, lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + k + 1) for k in range(n)]))
    return F.when(F.size(words) >= n, gram).otherwise(F.array(text))


def _mh_slot(i: int) -> Column:
    # portable minhash: lexicographic min of seed-prefixed md5-hex prefixes
    return F.min(F.substring(
        F.md5(F.concat_ws("|", F.lit(str(i)), F.col("shingle"))), 1, 16)
    ).alias(f"mh{i}")


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n_gram: int = 3) -> DataFrame:
    """One row per doc: mh0..mh15 + band keys b0..b3."""
    sh = docs.select(id_col, F.explode(
        shingles_expr(F.col(text_col), n_gram)).alias("shingle"))
    sig = sh.groupBy(id_col).agg(*[_mh_slot(i) for i in range(N_MINHASH)])
    for b in range(N_BANDS):
        cols = [f"mh{b * ROWS_PER_BAND + j}" for j in range(ROWS_PER_BAND)]
        sig = sig.withColumn(f"b{b}", F.concat(*cols))
    return sig


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      threshold: float = 0.5) -> DataFrame:
    """Candidate pairs sharing >=1 LSH band, scored by estimated jaccard
    (#matching minhash slots / 16). Returns (doc_a, doc_b, est_jaccard)."""
    # persist the signatures: the subplan below reuses them 6 times (4 band
    # joins + 2 estimate join-backs); without the cache Catalyst/AQE carries
    # 6 inlined copies of the 16-aggregate plan and driver-side re-planning
    # dominates wall time
    sig = minhash_signatures(docs, id_col, text_col).persist()
    # candidate ids via per-band equi-joins (2-col shuffles), distinct, then
    # one join back to the signatures for the estimate
    cand = None
    for band in range(N_BANDS):
        left = sig.select(F.col(id_col).alias("doc_a"),
                          F.col(f"b{band}").alias("_bk"))
        right = sig.select(F.col(id_col).alias("doc_b"),
                           F.col(f"b{band}").alias("_bk"))
        p = (left.join(right, "_bk")
             .filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b"))
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()
    sa = sig.select(F.col(id_col).alias("doc_a"),
                    *[F.col(f"mh{i}").alias(f"a{i}") for i in range(N_MINHASH)])
    sb = sig.select(F.col(id_col).alias("doc_b"),
                    *[F.col(f"mh{i}").alias(f"b{i}") for i in range(N_MINHASH)])
    matches = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
                  for i in range(N_MINHASH))
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("est_jaccard",
                        F.round(matches / F.lit(float(N_MINHASH)), 4))
            .filter(F.col("est_jaccard") >= threshold)
            .select("doc_a", "doc_b", "est_jaccard"))


def minhash_star_pairs(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       threshold: float = 0.5) -> DataFrame:
    """STAR-collapsed form of ``minhash_lsh_pairs`` — completes the
    round-5 star trilogy (phash, simhash, minhash). Safe here because
    the pair score is the SIGNATURE estimate (#matching slots / 16), a
    pure function of the two 16-slot signatures: members of an
    identical-signature group estimate 1.0 against each other (their
    clique edges always exist), and any cross-group edge depends only
    on the signatures, so representative edges span exactly the
    components the clique pair set spans. Identical signatures collapse
    to their min-id representative (one ``exact`` edge per member,
    est_jaccard 1.0 — linear in duplicates), then the 4-band equi-join
    + estimate threshold runs over DISTINCT signatures only (``near``
    edges between representatives). Emits
    (doc_a, doc_b, est_jaccard, kind)."""
    sig = minhash_signatures(docs, id_col, text_col).persist()
    mh = [f"mh{i}" for i in range(N_MINHASH)]
    bcols = [f"b{b}" for b in range(N_BANDS)]
    reps = (sig.groupBy(*mh, *bcols)
            .agg(F.min(id_col).alias("_rep")))
    exact = (sig.join(reps.select(*mh, "_rep"), mh)
             .filter(F.col(id_col) != F.col("_rep"))
             .select(F.col("_rep").alias("doc_a"),
                     F.col(id_col).alias("doc_b"),
                     F.lit(1.0).alias("est_jaccard"),
                     F.lit("exact").alias("kind")))
    cand = None
    for band in range(N_BANDS):
        left = reps.select(F.col("_rep").alias("doc_a"),
                           F.col(f"b{band}").alias("_bk"))
        right = reps.select(F.col("_rep").alias("doc_b"),
                            F.col(f"b{band}").alias("_bk"))
        p = (left.join(right, "_bk")
             .filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b"))
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()
    sa = reps.select(F.col("_rep").alias("doc_a"),
                     *[F.col(f"mh{i}").alias(f"a{i}")
                       for i in range(N_MINHASH)])
    sb = reps.select(F.col("_rep").alias("doc_b"),
                     *[F.col(f"mh{i}").alias(f"b{i}")
                       for i in range(N_MINHASH)])
    matches = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
                  for i in range(N_MINHASH))
    near = (cand.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("est_jaccard",
                        F.round(matches / F.lit(float(N_MINHASH)), 4))
            .filter(F.col("est_jaccard") >= threshold)
            .select("doc_a", "doc_b", "est_jaccard",
                    F.lit("near").alias("kind")))
    return exact.unionByName(near)


def _bit_votes(b: int, h: str = "_h") -> Column:
    # +1/-1 vote for bit b of the word hash; summed per doc in ONE groupBy
    # pass (explode + grouped conditional sums — the single-traversal shape;
    # the previous impl ran one F.aggregate array traversal PER BIT and cost
    # 45% of the whole bench suite)
    return F.sum(
        F.when(F.shiftright(F.col(h), b).bitwiseAND(F.lit(1)) == 1, 1)
        .otherwise(-1)).alias(f"s{b}")


def _bits_from_votes(bits: range, votes) -> Column:
    """Assemble a fingerprint int from sign-of-vote columns: bit i of the
    result is set iff votes[bits[i]] > 0."""
    out = F.lit(0)
    for i, b in enumerate(bits):
        out = out + F.when(votes(b) > 0, 1 << i).otherwise(0)
    return out


def simhash_buckets(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Docs grouped by identical 16-bit simhash: (simhash, n_docs, doc_ids
    sorted). Buckets with n_docs > 1 are near-duplicate candidates.

    Plan shape: explode words -> one 16-bit md5 hash per word -> ONE groupBy
    with 16 conditional sums -> sign assembly. Single pass over the data,
    all JVM-side. (16-bit buckets are a small-corpus demo; the scale path
    is ``simhash64_pairs`` — 65k buckets collapse at 10^9 docs.)"""
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("_w"))
    hashes = words.select(
        id_col,
        F.conv(F.substring(F.md5("_w"), 1, 4), 16, 10).cast("int").alias("_h"))
    votes = hashes.groupBy(id_col).agg(*[_bit_votes(b) for b in range(16)])
    sh = votes.select(
        F.col(id_col),
        _bits_from_votes(range(16), lambda b: F.col(f"s{b}")).alias("simhash"))
    return (sh.groupBy("simhash")
            .agg(F.count("*").alias("n_docs"),
                 F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
            .filter(F.col("n_docs") > 1))


N_SIMHASH_BITS = 64
N_SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = N_SIMHASH_BITS // N_SIMHASH_BANDS


def simhash64_signatures(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """One row per doc: seg0..seg3, the 64-bit SimHash split into 4 16-bit
    band segments (seg_k holds fingerprint bits 16k..16k+15). Keeping the
    fingerprint as 4 small ints avoids BIGINT sign games and makes the band
    keys directly joinable. Word hash = md5 first 16 hex = 64 bits, read as
    two 32-bit halves (each fits a BIGINT without sign issues)."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("_w"))
    hashes = words.select(
        id_col,
        F.conv(F.substring(F.md5("_w"), 1, 8), 16, 10)
        .cast("long").alias("_hi"),
        F.conv(F.substring(F.md5("_w"), 9, 8), 16, 10)
        .cast("long").alias("_lo"))
    votes = hashes.groupBy(id_col).agg(
        *[_bit_votes(b, "_lo") for b in range(32)],
        *[F.sum(F.when(F.shiftright(F.col("_hi"), b)
                       .bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1))
          .alias(f"s{32 + b}") for b in range(32)])
    segs = [
        _bits_from_votes(range(k * SIMHASH_BAND_BITS,
                               (k + 1) * SIMHASH_BAND_BITS),
                         lambda b: F.col(f"s{b}")).alias(f"seg{k}")
        for k in range(N_SIMHASH_BANDS)]
    return votes.select(F.col(id_col), *segs)


def simhash64_pairs(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash with banded LSH: candidates share at
    least one of 4 16-bit segments (pigeonhole: any pair within hamming
    distance 3 MUST share a segment; max_hamming=8 keeps looser near-dups
    that happen to collide on a band). Emits (doc_a, doc_b, hamming) — pair
    output, never bucket membership arrays, so no per-bucket collect_list to
    OOM on at 10^9+ docs. Candidate generation is 4 two-column equi-joins."""
    # One row per (doc, band) with the FULL 4-segment signature carried
    # along, then a single self-equi-join on (band, segment): candidate
    # generation and hamming rescoring happen in one join, no join-backs.
    # The signature subplan is referenced exactly twice (self-join sides)
    # instead of six times — no persist, so nothing leaks cached blocks
    # across bench/test invocations (round-2 advice); at 10^9+ docs
    # materialize signatures to a table first and pass them in.
    sig = simhash64_signatures(docs, id_col, text_col)
    segs = [f"seg{k}" for k in range(N_SIMHASH_BANDS)]
    bands = sig.select(
        F.col(id_col), *segs,
        F.posexplode(F.array(*[F.col(s) for s in segs]))
        .alias("_band", "_bk"))
    left = bands.select(F.col(id_col).alias("doc_a"), "_band", "_bk",
                        *[F.col(s).alias(f"a{k}")
                          for k, s in enumerate(segs)])
    right = bands.select(F.col(id_col).alias("doc_b"), "_band", "_bk",
                         *[F.col(s).alias(f"b{k}")
                           for k, s in enumerate(segs)])
    hamming = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}")))
        for k in range(N_SIMHASH_BANDS))
    return (left.join(right, ["_band", "_bk"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


def simhash64_star_pairs(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         max_hamming: int = 8) -> DataFrame:
    """STAR-collapsed form of ``simhash64_pairs`` for corpora with heavy
    exact duplication — the round-5 sf10 soak measured the clique form
    at 423M pairs / 21 GB spill on a 100-way-duplicated corpus, because
    identical texts hash to identical fingerprints and the pair output
    is quadratic in that cluster size. Here identical 64-bit signatures
    collapse to their min-id representative first (one ``exact`` star
    edge per member — linear; hamming within an identical-signature
    cluster is 0, so connectivity is unchanged), and the 4-band
    equi-join runs over DISTINCT signatures only (``near`` edges,
    1..max_hamming between representatives). Emits
    (doc_a, doc_b, hamming, kind); feed straight into the hash-to-min
    CC — components equal the clique form's exactly."""
    sig = simhash64_signatures(docs, id_col, text_col)
    segs = [f"seg{k}" for k in range(N_SIMHASH_BANDS)]
    reps = sig.groupBy(*segs).agg(F.min(id_col).alias("_rep"))
    exact = (sig.join(reps, segs)
             .filter(F.col(id_col) != F.col("_rep"))
             .select(F.col("_rep").alias("doc_a"),
                     F.col(id_col).alias("doc_b"),
                     F.lit(0).cast("int").alias("hamming"),
                     F.lit("exact").alias("kind")))
    bands = reps.select(
        "_rep", *segs,
        F.posexplode(F.array(*[F.col(s) for s in segs]))
        .alias("_band", "_bk"))
    left = bands.select(F.col("_rep").alias("doc_a"), "_band", "_bk",
                        *[F.col(s).alias(f"a{k}")
                          for k, s in enumerate(segs)])
    right = bands.select(F.col("_rep").alias("doc_b"), "_band", "_bk",
                         *[F.col(s).alias(f"b{k}")
                           for k, s in enumerate(segs)])
    hamming = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}")))
        for k in range(N_SIMHASH_BANDS))
    near = (left.join(right, ["_band", "_bk"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b",
                    hamming.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct()
            .withColumn("kind", F.lit("near")))
    return exact.unionByName(near)


def _shingle_sets(docs: DataFrame, id_col: str, text_col: str,
                  n_gram: int, max_df: int | None) -> DataFrame:
    """Shared shingle-set prep for the set-similarity pair operators:
    distinct (d, shingle) rows, with the ``max_df`` hot-shingle cap
    applied BEFORE sizes/joins (bounds per-key join fan-out at max_df^2;
    mirror the identical cap in any oracle). Returned frame is persisted
    — each caller reuses it 3x (sizes + both self-join sides); the cache
    is caller-managed (session-scoped), same policy as
    ``minhash_lsh_pairs``'s signature cache."""
    sh = docs.select(
        F.col(id_col).alias("d"),
        F.explode(shingles_expr(F.col(text_col), n_gram)).alias("shingle")
    ).distinct()
    if max_df is not None:
        keep = (sh.groupBy("shingle")
                .agg(F.count("*").alias("_df"))
                .filter(F.col("_df") <= max_df)
                .select("shingle"))
        sh = sh.join(keep, "shingle")
    return sh.persist()


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n_gram: int = 3,
                        threshold: float = 0.8,
                        max_df: int | None = None) -> DataFrame:
    """Exact jaccard over distinct shingle sets, computed by explode +
    self-equi-join on shingle + count ratio (scalable set intersection —
    no cross join).

    ``max_df`` is the hot-shingle guard: a shingle occurring in more than
    max_df documents is dropped from every document's shingle set BEFORE
    sizes and the self-join, bounding the per-key join fan-out at max_df^2
    (without it a boilerplate shingle shared by 10^6 docs would attempt a
    10^12-row join group). Jaccard is then exact over the FILTERED sets —
    mirror the same cap in any oracle."""
    sh = _shingle_sets(docs, id_col, text_col, n_gram, max_df)
    sizes = sh.groupBy("d").agg(F.count("*").alias("n_shingles"))
    common = (sh.alias("x").join(sh.alias("y"),
                                 (F.col("x.shingle") == F.col("y.shingle")) &
                                 (F.col("x.d") < F.col("y.d")))
              .groupBy(F.col("x.d").alias("doc_a"), F.col("y.d").alias("doc_b"))
              .agg(F.count("*").alias("n_common")))
    na = sizes.select(F.col("d").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    nb = sizes.select(F.col("d").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (common.join(na, "doc_a").join(nb, "doc_b")
            .withColumn("jaccard", F.round(
                F.col("n_common") /
                (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep the lowest id per identical text (md5 pre-hash so the wide text
    column never shuffles; hash collisions resolved by grouping on the hash
    AND the text)."""
    return (docs
            .withColumn("_h", F.md5(F.col(text_col)))
            .groupBy("_h", text_col)
            .agg(F.min(id_col).alias(id_col),
                 F.count("*").alias("n_copies"))
            .select(id_col, "n_copies"))


def duplicated_spans(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 40,
                     stride: int = 1) -> DataFrame:
    """ExactSubstr-style duplicated-span detection (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): a char
    span is duplicated if it occurs >= 2 times anywhere in the corpus
    (cross-doc or repeated within one doc). The suffix-array construction
    of the paper is single-machine; the distributed re-expression is
    k-char-gram hashing:

      1. explode every char position p in [0, len-k] (step ``stride``)
         and hash the k-gram text[p:p+k] with md5 (engine-portable);
      2. grams whose global count >= 2 mark their positions duplicated;
      3. per doc, merge overlapping/adjacent marked intervals
         [p, p+k) into maximal spans (gaps-and-islands window).

    Output: one row per maximal duplicated span
    (id, span_start, span_end, span_len), span_end exclusive, 0-based.

    Scale: step 1 is O(total corpus chars / stride) rows of (id, pos,
    16-byte md5 prefix) — at 100 TB set ``stride`` 8-16 (detection
    granularity coarsens to ~stride chars at span edges; recall for spans
    >= k + stride is unaffected because some aligned gram still lands
    inside) and raise k to ~50 per the paper. Step 2 is a COUNT window
    partitioned on the gram hash — ONE shuffle of the gram rows and one
    pass, instead of the groupBy + semi-join shape that shuffles the
    grams twice AND re-computes the explode+md5 subtree for the probe
    side (measured 3.6x slower at sf0.1). Gram-hash cardinality is
    near-unique so the window partitions stay tiny; a corpus with a
    single gram repeated ~10^6+ times would hot-spot one task, in which
    case revert to groupBy(count) + broadcast semi-join of the (small)
    duplicated-hash set. Step 3 is one per-doc window — no joins wider
    than the duplicated positions themselves. Hash is a md5 prefix
    (64 bits) purely for DuckDB parity; at 10^12 grams switch to
    xxhash64 and accept the sketch-level false-positive rate.
    """
    pos = (docs
           .filter(F.length(text_col) >= k)
           .select(F.col(id_col), F.col(text_col),
                   F.explode(F.sequence(
                       F.lit(0), F.length(text_col) - k,
                       F.lit(stride))).alias("pos"))
           .select(id_col, "pos",
                   F.substring(F.md5(F.substring(
                       F.col(text_col), F.col("pos") + 1, k)), 1, 16)
                   .alias("_h")))
    hits = (pos
            .withColumn("_n", F.count("*").over(Window.partitionBy("_h")))
            .filter(F.col("_n") >= 2).select(id_col, "pos"))
    w = (Window.partitionBy(id_col).orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, -1))
    isl = (hits
           .withColumn("_brk", F.when(
               F.col("pos") > F.coalesce(F.max(F.col("pos") + k).over(w),
                                         F.lit(-1)), 1).otherwise(0))
           .withColumn("_island", F.sum("_brk").over(
               Window.partitionBy(id_col).orderBy("pos")
               .rowsBetween(Window.unboundedPreceding, 0))))
    return (isl.groupBy(id_col, "_island")
            .agg(F.min("pos").cast("long").alias("span_start"),
                 (F.max("pos") + k).cast("long").alias("span_end"))
            .select(F.col(id_col),
                    "span_start", "span_end",
                    (F.col("span_end") - F.col("span_start"))
                    .alias("span_len")))


def tfidf_cosine_pairs(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", threshold: float = 0.6,
                       max_df: int = 1000, n_total: int | None = None
                       ) -> DataFrame:
    """Sparse TF-IDF cosine near-dup pairs via an INVERTED-INDEX join —
    the scale pattern for pairwise text similarity when documents are
    bags of words rather than dense embeddings:

      1. tf per (doc, term) (one groupBy), df per term (one groupBy);
      2. weight w = tf * ln(N/df); per-doc norm = sqrt(sum w^2);
      3. candidate pairs ONLY through shared terms: self-equi-join of
         the (term, doc, w) posting list on term with doc_a < doc_b,
         dot = sum(w_a * w_b) — never an all-pairs cross join;
      4. cosine = dot / (norm_a * norm_b), rounded to 4 dp (engine
         float-summation-order guard), thresholded.

    Terms with df > ``max_df`` are dropped from the posting lists before
    the join (the ngram_jaccard max_df guard): a stop-word-grade term
    would contribute ~df^2 candidate pairs and ~zero idf weight; the cap
    bounds per-term join fan-out at max_df^2 while barely moving the
    scores. Norms are computed AFTER the cap so dropped terms don't
    contribute phantom magnitude (both engines agree).

    Tokenization matches text_tfidf_topk: lowercase split on
    [^a-z0-9]+, length >= 3.
    """
    toks = (docs
            .select(F.col(id_col),
                    F.explode(F.split(F.lower(F.col(text_col)),
                                      "[^a-z0-9]+")).alias("term"))
            .filter(F.length("term") >= 3))
    if n_total is None:
        n_total = docs.count()
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = (tf.groupBy("term").agg(F.count("*").alias("df"))
           .filter(F.col("df") <= max_df))
    w = (tf.join(df_, "term")
         .select(F.col(id_col), "term",
                 (F.col("tf") *
                  F.log(F.lit(float(n_total)) / F.col("df"))).alias("w")))
    w = w.persist()
    norms = (w.groupBy(id_col)
             .agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")))
    wa = w.select(F.col(id_col).alias("doc_a"), "term",
                  F.col("w").alias("wa"))
    wb = w.select(F.col(id_col).alias("doc_b"), "term",
                  F.col("w").alias("wb"))
    dots = (wa.join(wb, "term")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot")))
    na = norms.select(F.col(id_col).alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col(id_col).alias("doc_b"), F.col("nrm").alias("nb"))
    out = (dots.join(na, "doc_a").join(nb, "doc_b")
           .withColumn("cosine", F.round(
               F.col("dot") / (F.col("na") * F.col("nb")), 4))
           .filter(F.col("cosine") >= threshold)
           .select("doc_a", "doc_b", "cosine"))
    out = out.localCheckpoint()   # materialize before releasing the cache
    w.unpersist()
    return out


def minhash_incremental_pairs(old_docs: DataFrame, new_docs: DataFrame,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              threshold: float = 0.5) -> DataFrame:
    """Incremental-ingest dedup: which NEW documents near-duplicate the
    EXISTING corpus — the shape of a continuously-fed training pipeline,
    where re-pairing the whole corpus per batch (O(corpus) signatures +
    O(corpus^2 / buckets) joins) is unaffordable. Band equi-joins run
    ONLY new x old: per ingest batch the cost is O(batch) signature
    builds + banded joins against the standing signature index (at scale
    the old side is a persisted, bucketed-by-band-key table appended
    once per batch — never recomputed).

    Returns (old_id, new_id, est_jaccard >= threshold). Same signature
    scheme as ``minhash_lsh_pairs``, so a pair's estimate here equals
    what the full-corpus pass would produce (signatures are per-doc)."""
    sig_old = minhash_signatures(old_docs, id_col, text_col).persist()
    sig_new = minhash_signatures(new_docs, id_col, text_col).persist()
    cand = None
    for band in range(N_BANDS):
        left = sig_old.select(F.col(id_col).alias("old_id"),
                              F.col(f"b{band}").alias("_bk"))
        right = sig_new.select(F.col(id_col).alias("new_id"),
                               F.col(f"b{band}").alias("_bk"))
        p = left.join(right, "_bk").select("old_id", "new_id")
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()
    sa = sig_old.select(F.col(id_col).alias("old_id"),
                        *[F.col(f"mh{i}").alias(f"a{i}")
                          for i in range(N_MINHASH)])
    sb = sig_new.select(F.col(id_col).alias("new_id"),
                        *[F.col(f"mh{i}").alias(f"b{i}")
                          for i in range(N_MINHASH)])
    matches = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
                  for i in range(N_MINHASH))
    out = (cand.join(sa, "old_id").join(sb, "new_id")
           .withColumn("est_jaccard",
                       F.round(matches / F.lit(float(N_MINHASH)), 4))
           .filter(F.col("est_jaccard") >= threshold)
           .select("old_id", "new_id", "est_jaccard"))
    out = out.localCheckpoint()
    sig_old.unpersist()
    sig_new.unpersist()
    return out


def containment_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n_gram: int = 3,
                      threshold: float = 0.8,
                      max_df: int | None = None) -> DataFrame:
    """Shingle CONTAINMENT pairs — Broder's asymmetric c(A,B) =
    |A inter B| / |A|: detects a short document quoted wholesale inside a
    longer one, which symmetric Jaccard dilutes below threshold. Same
    bucketed shape as ``ngram_jaccard_pairs`` (distinct shingle sets,
    ``max_df`` hot-shingle cap bounding per-key join fan-out, ONE
    self-equi-join) but emits ORDERED pairs (doc_id, contained_in)
    normalized by the LEFT side's set size; threshold applies to the
    4dp-rounded value so the decision is engine-portable."""
    sh = _shingle_sets(docs, id_col, text_col, n_gram, max_df)
    sizes = sh.groupBy("d").agg(F.count("*").alias("n_shingles"))
    common = (sh.alias("x").join(sh.alias("y"),
                                 (F.col("x.shingle") == F.col("y.shingle")) &
                                 (F.col("x.d") != F.col("y.d")))
              .groupBy(F.col("x.d").alias("doc_id"),
                       F.col("y.d").alias("contained_in"))
              .agg(F.count("*").alias("n_common")))
    na = sizes.select(F.col("d").alias("doc_id"),
                      F.col("n_shingles").alias("n_a"))
    return (common.join(na, "doc_id")
            .withColumn("containment",
                        F.round(F.col("n_common") / F.col("n_a"), 4))
            .filter(F.col("containment") >= threshold)
            .select("doc_id", "contained_in", "containment"))


#: SpotSigs anchor stopwords (fixed literal set — both engines and the
#: oracle bake the same list).
SPOTSIG_ANCHORS = ("the", "a", "of", "to", "is")
SPOTSIG_CHAIN = 2


def spotsig_expr(text: Column) -> Column:
    """SpotSigs signature set (Theobald, Siddharth & Paepcke, SIGIR
    2008): at every stopword ANCHOR position, chain the next
    ``SPOTSIG_CHAIN`` non-stopword tokens — near-duplicate news/boiler
    pages keep their spot signatures even when ads and navigation
    differ, which plain shingles can't ignore. Pure array codegen:
    tokenize, find anchor positions, skip stopwords forward, join the
    chain; anchors too close to the end (short chain) emit nothing."""
    anchors = F.array(*[F.lit(a) for a in SPOTSIG_ANCHORS])
    toks = F.filter(F.split(F.lower(text), "[^a-z0-9]+"),
                    lambda t: F.length(t) >= 1)
    pos = F.filter(F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))),
                   lambda i: F.array_contains(anchors,
                                              F.element_at(toks, i)))
    def chain(i):
        rest = F.slice(toks, i + 1, F.greatest(F.size(toks), F.lit(1)))
        nonstop = F.filter(rest,
                           lambda t: ~F.array_contains(anchors, t))
        return F.slice(nonstop, 1, SPOTSIG_CHAIN)

    sigs = F.transform(
        pos, lambda i: F.when(
            F.size(chain(i)) == SPOTSIG_CHAIN,
            F.concat_ws(":", F.concat(F.array(F.element_at(toks, i)),
                                      chain(i)))))
    return F.filter(sigs, lambda s: s.isNotNull())


def spotsigs_pairs(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", threshold: float = 0.4,
                   max_df: int | None = None) -> DataFrame:
    """Near-dup pairs by exact Jaccard over SpotSigs signature sets —
    the same bucketed self-equi-join shape as ``ngram_jaccard_pairs``
    (distinct sig sets, optional hot-sig df cap, intersection by ONE
    equi-join on the signature, |A∪B| closed from sizes); threshold on
    the 4dp-rounded score for engine portability."""
    sh = docs.select(
        F.col(id_col).alias("d"),
        F.explode(spotsig_expr(F.col(text_col))).alias("sig")
    ).distinct()
    if max_df is not None:
        keep = (sh.groupBy("sig").agg(F.count("*").alias("_df"))
                .filter(F.col("_df") <= max_df).select("sig"))
        sh = sh.join(keep, "sig")
    # no persist: the caller owns caching (the returned plan reuses sh
    # three times; at fixture scale recompute is cheaper than the
    # cache-leak hazard ADVICE r2 flagged on simhash64)
    sizes = sh.groupBy("d").agg(F.count("*").alias("sz"))
    inter = (sh.alias("x")
             .join(sh.alias("y"),
                   (F.col("x.sig") == F.col("y.sig"))
                   & (F.col("x.d") < F.col("y.d")))
             .groupBy(F.col("x.d").alias("a"), F.col("y.d").alias("b"))
             .agg(F.count("*").alias("inter")))
    out = (inter
           .join(sizes.select(F.col("d").alias("a"),
                              F.col("sz").alias("sza")), "a")
           .join(sizes.select(F.col("d").alias("b"),
                              F.col("sz").alias("szb")), "b")
           .withColumn("jaccard",
                       F.round(F.col("inter")
                               / (F.col("sza") + F.col("szb")
                                  - F.col("inter")), 4))
           .filter(F.col("jaccard") >= threshold)
           .select("a", "b", "inter",
                   F.col("sza").cast("long").alias("sza"),
                   F.col("szb").cast("long").alias("szb"), "jaccard"))
    return out
