"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure Column expressions (whole-stage codegen);
every rule is replayable in ANSI SQL for the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from genesis_spark.operators.dedup import shingles_expr

# language marker words (n-gram-heuristic stand-in for a real lang-id model)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in"),
    "fr": ("le", "la", "et", "les", "des", "une"),
    "es": ("el", "los", "que", "y", "una", "para"),
    "de": ("der", "und", "die", "das", "ein", "mit"),
}


def _marker_hits(tokens: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*markers)))


def lang_id_expr(text: Column) -> Column:
    """Deterministic argmax over marker-word hit counts; CJK via codepoint
    range; ties resolve in en>fr>es>de order; no hits -> 'und'."""
    tokens = F.split(F.lower(text), " ")
    hits = {lang: _marker_hits(tokens, m) for lang, m in LANG_MARKERS.items()}
    has_cjk = text.rlike("[\\u4e00-\\u9fff]")
    en, fr, es, de = hits["en"], hits["fr"], hits["es"], hits["de"]
    return (F.when(has_cjk, "zh")
            .when((en > 0) & (en >= fr) & (en >= es) & (en >= de), "en")
            .when((fr > 0) & (fr >= es) & (fr >= de), "fr")
            .when((es > 0) & (es >= de), "es")
            .when(de > 0, "de")
            .otherwise("und"))


def quality_score_expr(text: Column) -> Column:
    """0-100 heuristic: length band + alpha ratio + stopword-ish ratio +
    mean word length sanity. Mirrors the shape of the reference's validity
    rubric (html_parse_manager.py:303-372) applied to bare text."""
    n = F.length(text)
    tokens = F.split(text, " ")
    n_tok = F.size(tokens)
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z\\u4e00-\\u9fff]", ""))
    alpha_ratio = alpha / F.greatest(n, F.lit(1))
    stop_hits = _marker_hits(F.split(F.lower(text), " "),
                             LANG_MARKERS["en"] + LANG_MARKERS["fr"] +
                             LANG_MARKERS["es"] + LANG_MARKERS["de"])
    stop_ratio = stop_hits / F.greatest(n_tok, F.lit(1))
    mean_word = n / F.greatest(n_tok, F.lit(1))
    score = (
        F.when(n > 500, 30).when(n > 100, 20).when(n > 20, 10).otherwise(0)
        + F.when(alpha_ratio > 0.7, 30).when(alpha_ratio > 0.4, 15).otherwise(0)
        + F.when(stop_ratio > 0.05, 20).otherwise(0)
        + F.when((mean_word >= 3) & (mean_word <= 12), 20).otherwise(0))
    return score.cast("int")


def token_counts_exprs(text: Column) -> dict[str, Column]:
    """Whitespace tokens + a BPE-ish regex segmentation count (alpha runs of
    <=4 chars, digit runs, single punctuation marks)."""
    ws = F.size(F.split(text, " "))
    bpe = F.size(F.regexp_extract_all(
        text, F.lit("[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]"), 0))
    return {"n_tokens_ws": ws, "n_tokens_bpe": bpe}


def fingerprint_expr(text: Column, n_gram: int = 4) -> Column:
    """Winnowing-style doc fingerprint: minimum md5-hex prefix over word
    n-gram shingles (rolling-hash equivalent, engine-portable)."""
    return F.array_min(F.transform(
        shingles_expr(text, n_gram),
        lambda s: F.substring(F.md5(s), 1, 16)))


# ---------------------------------------------------------------------------
# repetition metrics (Gopher-style quality filters, Rae et al. 2021 §A1.1)
# ---------------------------------------------------------------------------

def repetition_stats(docs, top_bigram_max: float = 0.20,
                     dup_word_max: float = 0.60):
    """Per-document repetition metrics over ``(doc_id, text)``:

    * ``dup_word_frac`` — 1 - distinct_words/total_words (Gopher's
      duplicate-*-fraction family applied at word granularity);
    * ``top_bigram_frac`` — occurrences of the most frequent word 2-gram
      over total 2-grams (Gopher's top-n-gram fraction, n=2);
    * ``repetitive`` — either fraction above its threshold.

    Distributed shape: explode bigrams -> count per (doc_id, gram) ->
    max+sum per doc. Two map-side-combinable aggregations keyed by doc_id;
    word distinctness rides the same pass via the tokens array (pure
    codegen — ``array_distinct`` never shuffles). At 100 TB the group key
    (doc_id, gram) is near-unique so the first agg is almost a no-op
    combine; nothing is ever collected per-doc except two longs."""
    tokens = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id",
        F.size(tokens).alias("n_words"),
        F.size(F.array_distinct(tokens)).alias("n_distinct"),
        F.when(F.size(tokens) >= 2,
               F.transform(F.slice(tokens, 1, F.size(tokens) - 1),
                           lambda w, i: F.concat(w, F.lit(" "),
                                                 F.element_at(tokens, i + 2))))
         .otherwise(F.array().cast("array<string>")).alias("bigrams"))
    counts = (base.select("doc_id", "n_words", "n_distinct",
                          F.explode_outer("bigrams").alias("gram"))
              .groupBy("doc_id", "n_words", "n_distinct", "gram")
              .agg(F.count("*").alias("c")))
    stats = (counts.groupBy("doc_id", "n_words", "n_distinct")
             .agg(F.max(F.when(F.col("gram").isNotNull(), F.col("c"))
                        .otherwise(0)).alias("top_c"),
                  F.sum(F.when(F.col("gram").isNotNull(), F.col("c"))
                        .otherwise(0)).alias("total_c")))
    dup = F.round(1 - F.col("n_distinct") / F.greatest("n_words", F.lit(1)), 4)
    top = F.round(F.col("top_c") / F.greatest("total_c", F.lit(1)), 4)
    return stats.select(
        "doc_id", "n_words",
        dup.alias("dup_word_frac"),
        top.alias("top_bigram_frac"),
        ((dup > dup_word_max) | (top > top_bigram_max)).alias("repetitive"))


# ---------------------------------------------------------------------------
# C4-style line cleaning (Raffel et al. 2020 §2.2, re-expressed per line)
# ---------------------------------------------------------------------------

def c4_line_clean(docs, words_per_line: int = 6, min_words: int = 5):
    """C4's line-level cleaning over ``(doc_id, text)`` where lines are the
    deterministic ``words_per_line``-word chunks of the text (the driver's
    documents carry no newlines, so line structure is synthesized exactly
    like the interleave chunking — same rule in the DuckDB oracle):

    * keep a line only if it ends in terminal punctuation AND has at least
      ``min_words`` words and no '{' (the code filter);
    * drop the whole document if it contains 'lorem ipsum';
    * emit ``(doc_id, n_lines, n_kept, clean_text)`` for surviving docs.

    Pure codegen (split/transform/filter/array_join): zero shuffles, zero
    UDFs — at 100 TB this is a straight map over the scan."""
    w = words_per_line
    words = F.split(F.col("text"), " ")
    n_chunks = F.greatest((F.ceil(F.size(words) / F.lit(w))).cast("int"),
                          F.lit(1))
    lines = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * w + 1, w), " "))
    kept = F.filter(
        lines,
        lambda ln: ln.rlike("[.!?]$")
        & (F.size(F.split(ln, " ")) >= min_words)
        & ~ln.contains("{"))
    return (docs
            .filter(~F.lower(F.col("text")).contains("lorem ipsum"))
            .select("doc_id",
                    F.size(lines).alias("n_lines"),
                    F.size(kept).alias("n_kept"),
                    F.array_join(kept, " ").alias("clean_text"))
            .filter(F.col("n_kept") > 0))


# ---------------------------------------------------------------------------
# PII redaction (email/phone regexes shared with functions.text T3/T4)
# ---------------------------------------------------------------------------

# EMAIL_PAT is the extraction regex from functions.text (T3) verbatim —
# one source of truth for what an email looks like. The phone pattern is
# the fixed-format international shape the redaction fixtures inject (a
# general free-form phone matcher can't be made byte-identical across
# Java-regex and RE2 longest-match semantics, so redaction pins the format
# and the extraction-grade matcher stays in functions.text.PHONE_RE).
from genesis_spark.functions.text import EMAIL_RE as _EMAIL_RE  # noqa: E402

EMAIL_PAT = _EMAIL_RE.pattern
PHONE_PAT = "\\+[0-9]{1,3} [0-9]{3} [0-9]{3,4}"


def redact_pii_exprs(text: Column) -> dict[str, Column]:
    """Redacted text plus match counts. Order matters: phones first —
    a phone needs internal spaces so it can never match inside an email,
    and the '>' of an inserted '<PHONE>' marker blocks the email regex
    from eating the marker; the reverse order would let an email match
    consume a phone's trailing digits and leave '+d ddd' digits
    unredacted. Overlap caveat: counts are match counts on the ORIGINAL
    text, so text where a phone and an email share characters redacts the
    overlap once (as the phone). All engine-portable regex (no
    lookaround/backrefs — valid in both Java regex and RE2)."""
    n_emails = F.size(F.regexp_extract_all(text, F.lit(EMAIL_PAT), 0))
    n_phones = F.size(F.regexp_extract_all(text, F.lit(PHONE_PAT), 0))
    red = F.regexp_replace(
        F.regexp_replace(text, PHONE_PAT, "<PHONE>"),
        EMAIL_PAT, "<EMAIL>")
    return {"redacted": red, "n_emails": n_emails, "n_phones": n_phones}


def unigram_lm_score(docs, round_dp: int = 4):
    """Corpus-trained unigram language-model surprisal per document — the
    CCNet-style LM quality filter (docs whose tokens are improbable under
    the corpus distribution are outliers: gibberish, wrong language,
    boilerplate soup), with the corpus itself as the training set so no
    external model ships.

    ``docs`` needs (doc_id, text). Returns ``(doc_id, n_tokens, nll)``
    where ``nll`` is the mean negative log-probability (nats/token,
    rounded to ``round_dp`` so double summation order can't flip a value
    hash).

    Plan: tokenize → one groupBy(token) for term frequencies (map-side
    combinable; the vocabulary is Heaps-law sublinear in corpus size) →
    the single global-total row broadcast onto the vocab → token-level
    equi-join back and one groupBy(doc_id) mean. Two corpus-sized
    shuffles (token tf, per-doc agg); the vocab side of the join is the
    small side and broadcasts while it fits."""
    tok = (docs.filter(F.col("text").isNotNull())
           .select("doc_id", F.explode(F.split("text", " ")).alias("tok")))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("tf"))
    total = vocab.agg(F.sum("tf").alias("t"))
    logp = (vocab.crossJoin(F.broadcast(total))
            .select("tok", F.log(F.col("tf") / F.col("t")).alias("lp")))
    return (tok.join(F.broadcast(logp), "tok")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.round(F.avg(-F.col("lp")), round_dp).alias("nll")))


def bigram_lm_score(docs, k: float = 0.5, round_dp: int = 4):
    """Corpus-trained BIGRAM LM surprisal per document — the second-order
    companion to ``unigram_lm_score``: scores each doc by the mean
    negative log of the add-k-smoothed conditional P(w2|w1) =
    (c(w1,w2) + k) / (c(w1,·) + k·V), where c(w1,·) counts bigrams
    starting with w1 and V is the corpus vocabulary size. Word-salad
    docs with plausible unigrams but improbable transitions — the
    outliers a unigram filter can't see — surface here.

    Returns ``(doc_id, n_bigrams, nll2)`` (nats/bigram, rounded); docs
    with < 2 tokens have no bigrams and drop out on both engines.

    Plan: one bigram explode (array transform, codegen) → two map-side
    combinable groupBys (bigram counts, context counts) → equi-join the
    bigram stream back to its count (the big-big join shuffles on the
    bigram key), context counts and the single (V, k) row broadcast.
    """
    words = F.split(F.col("text"), " ")
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(words) - 2),
                    lambda i: F.struct(
                        F.element_at(words, i + 1).alias("w1"),
                        F.element_at(words, i + 2).alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = (docs.filter(F.col("text").isNotNull())
          .select("doc_id", F.explode(bigrams).alias("b"))
          .select("doc_id", "b.w1", "b.w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab_n = (docs.filter(F.col("text").isNotNull())
               .select(F.explode(words).alias("tok"))
               .agg(F.countDistinct("tok").alias("v")))
    scored = (bg.join(c12, ["w1", "w2"])
              .join(F.broadcast(c1), "w1")
              .crossJoin(F.broadcast(vocab_n))
              .select("doc_id",
                      F.log((F.col("c12") + F.lit(k)) /
                            (F.col("c1") + F.lit(k) * F.col("v")))
                      .alias("lp")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.round(F.avg(-F.col("lp")), round_dp).alias("nll2")))


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021 §A1.1, the non-repetition half)
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(docs, min_words: int = 50, max_words: int = 100_000,
                   min_mean_len: float = 3.0, max_mean_len: float = 10.0,
                   max_symbol_ratio: float = 0.1,
                   min_alpha_frac: float = 0.8, min_stop_hits: int = 2):
    """The full Gopher document-quality rule set over ``(doc_id, text)``
    (Rae et al. 2021 §A1.1; the repetition half lives in
    ``repetition_stats``):

    * word count in [min_words, max_words];
    * mean word length in [min_mean_len, max_mean_len];
    * symbol-to-word ratio (``#`` or ``...`` hits / words) <= 0.1;
    * >= 80% of words contain an alphabetic character;
    * at least ``min_stop_hits`` DISTINCT required stop words present
      (Gopher's "contains two of the/be/to/of/and/that/have/with").

    Distributed shape: one pure-codegen map — every metric is an array
    lambda over the split tokens (no explode, no shuffle). At 100 TB this
    is a filter fused into the scan; fractions round to 4 dp so the gate
    decisions are order-free and engine-portable."""
    w = F.split(F.col("text"), " ")
    n_words = F.size(w)
    mean_len = F.round(
        F.aggregate(w, F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(x)).cast("double")
        / F.greatest(n_words, F.lit(1)), 4)
    n_symbols = (F.size(F.split(F.col("text"), "#", -1)) - 1
                 + F.size(F.split(F.col("text"), r"\.\.\.", -1)) - 1)
    symbol_ratio = F.round(n_symbols.cast("double")
                           / F.greatest(n_words, F.lit(1)), 4)
    alpha_frac = F.round(
        F.size(F.filter(w, lambda x: x.rlike("[a-zA-Z]"))).cast("double")
        / F.greatest(n_words, F.lit(1)), 4)
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stop_hits = F.size(F.filter(
        stops, lambda s: F.array_contains(F.transform(w, F.lower), s)))
    out = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("stop_hits"))
    gate = ((F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words)
            & (F.col("mean_word_len") >= min_mean_len)
            & (F.col("mean_word_len") <= max_mean_len)
            & (F.col("symbol_ratio") <= max_symbol_ratio)
            & (F.col("alpha_frac") >= min_alpha_frac)
            & (F.col("stop_hits") >= min_stop_hits))
    return out.withColumn("gopher_pass", gate)
