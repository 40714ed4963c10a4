"""Registry family: Text analysis & quality (split from the monolithic queries.py)."""

from __future__ import annotations

from genesis_spark.queries._shared import *  # noqa: F401,F403



def q_validity_rubric(spark, sf_dir):
    """A1-shaped pure-column scoring rubric over the documents table."""
    d = _t(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " "))
    score = (F.when(F.col("n_chars") > 200, 20)
             .when(F.col("n_chars") > 100, 10).otherwise(-5)
             + F.when(ntok > 30, 10).otherwise(-5)
             + F.when(F.col("lang") == "en", 10).otherwise(0))
    return d.select("doc_id", F.greatest(score, F.lit(0)).alias("score"))


ORACLE_VALIDITY_RUBRIC = """
SELECT doc_id, greatest(
    (CASE WHEN n_chars > 200 THEN 20 WHEN n_chars > 100 THEN 10 ELSE -5 END)
  + (CASE WHEN len(string_split(text, ' ')) > 30 THEN 10 ELSE -5 END)
  + (CASE WHEN lang = 'en' THEN 10 ELSE 0 END), 0) AS score
FROM documents
"""


def q_text_bpe_apply(spark, sf_dir):
    """BPE tokenization with a FIXED learned merge list (training itself
    is iterative/non-SQL — golden-tested in tests/test_tokenize.py; the
    applied merges here are its frozen sf0.001 output): 12 chained
    codegen replaces over space-wrapped symbol strings, zero shuffles
    until the final vocab count. Output: per-token corpus counts."""
    from genesis_spark.operators.tokenize import bpe_apply

    docs = _t(spark, sf_dir, "documents")
    return (bpe_apply(docs, _BPE_MERGES)
            .groupBy("token").agg(F.count("*").alias("n_tok")))


ORACLE_TEXT_BPE_APPLY = f"""
WITH words AS (
  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
  FROM documents
),
toks AS (
  SELECT unnest(string_split_regex(trim({_bpe_apply_sql(_BPE_MERGES)}),
                ' +')) AS token
  FROM words WHERE word <> ''
)
SELECT token, count(*) AS n_tok FROM toks GROUP BY token
"""


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def q_text_lang_id(spark, sf_dir):
    """Marker-word language ID (textstats.lang_id_expr) censused per
    detected language; the trained Cavnar-Trenkle trigram tier is
    text_langid_ngram."""
    d = _t(spark, sf_dir, "documents")
    return (d.select(TS.lang_id_expr(F.col("text")).alias("lang_detected"))
            .groupBy("lang_detected").agg(F.count("*").alias("n_docs")))


ORACLE_TEXT_LANG_ID = _lang_oracle()


def q_text_quality(spark, sf_dir):
    """Length/punctuation/stopword-ratio quality rubric
    (textstats.quality_score_expr) aggregated per source — the
    calibration input for the corpus_clean gate."""
    d = _t(spark, sf_dir, "documents")
    return (d.select("source",
                     TS.quality_score_expr(F.col("text")).alias("q"))
            .groupBy("source")
            .agg(F.round(F.avg("q"), 2).alias("avg_quality"),
                 F.min("q").alias("min_quality"),
                 F.max("q").alias("max_quality"),
                 F.count("*").alias("n_docs")))


ORACLE_TEXT_QUALITY = f"""
WITH {_quality_cte("source", "documents")}
SELECT source, round(avg(q), 2) AS avg_quality, min(q) AS min_quality,
       max(q) AS max_quality, count(*) AS n_docs
FROM qs GROUP BY source
"""


def q_text_token_count(spark, sf_dir):
    """Token counting two ways per source: whitespace tokens and a
    BPE-ish regex tokenization ([A-Za-z]{1,4} | digit runs | symbol) —
    both pure codegen (textstats.token_counts_exprs)."""
    d = _t(spark, sf_dir, "documents")
    tc = TS.token_counts_exprs(F.col("text"))
    return (d.select("source", tc["n_tokens_ws"].alias("ws"),
                     tc["n_tokens_bpe"].alias("bpe"))
            .groupBy("source")
            .agg(F.sum("ws").alias("total_ws_tokens"),
                 F.sum("bpe").alias("total_bpe_tokens")))


ORACLE_TEXT_TOKEN_COUNT = r"""
SELECT source,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
       CAST(sum(len(regexp_extract_all(text,
           '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
           AS total_bpe_tokens
FROM documents GROUP BY source
"""


def q_text_fingerprint(spark, sf_dir):
    """Document fingerprinting (textstats.fingerprint_expr rolling
    hash) grouped to fingerprint buckets with member lists — exact-dup
    detection at fingerprint grain over the twin corpus."""
    c = _corpus(spark, sf_dir)
    fp = c.select("doc_id", TS.fingerprint_expr(F.col("text")).alias("fp"))
    return (fp.groupBy("fp")
            .agg(F.count("*").alias("n_docs"),
                 F.array_join(
                     F.transform(F.sort_array(F.collect_list("doc_id")),
                                 lambda x: x.cast("string")), ",")
                 .alias("doc_ids_csv"))
            .filter(F.col("n_docs") > 1))


ORACLE_TEXT_FINGERPRINT = f"""
WITH {_CORPUS_SQL},
{_shingle_sql(4)},
fp AS (SELECT doc_id, min(substr(md5(shingle), 1, 16)) AS fp
       FROM sh GROUP BY doc_id)
SELECT fp, count(*) AS n_docs,
       string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids_csv
FROM fp GROUP BY fp HAVING count(*) > 1
"""


def q_text_readability(spark, sf_dir):
    """Flesch reading-ease as a corpus-quality dimension (the classic
    readability rubric beside the Gopher/C4 gates): words by whitespace
    split, sentences by terminal-punctuation runs, syllables by vowel
    groups — all regexp_count codegen, zero shuffles until the final
    bucket rollup is skipped entirely (per-doc rows out). Integer
    counts make the score's double arithmetic cross-engine exact."""
    d = _t(spark, sf_dir, "documents")
    n_words, n_sent, n_syll, flesch = _flesch_exprs()
    bucket = (F.when(flesch >= 90, "very_easy")
              .when(flesch >= 70, "easy")
              .when(flesch >= 50, "medium")
              .when(flesch >= 30, "hard").otherwise("very_hard"))
    return d.select("doc_id", n_words.alias("n_words"),
                    n_sent.alias("n_sent"), n_syll.alias("n_syll"),
                    flesch.alias("flesch"), bucket.alias("bucket"))

ORACLE_TEXT_READABILITY = rf"""
WITH {_FLESCH_M_SQL},
fl AS (SELECT doc_id, n_words, n_sent, n_syll,
              {_FLESCH_Q_SQL} AS flesch FROM m)
SELECT doc_id, n_words, n_sent, n_syll, flesch,
       CASE WHEN flesch >= 90 THEN 'very_easy'
            WHEN flesch >= 70 THEN 'easy'
            WHEN flesch >= 50 THEN 'medium'
            WHEN flesch >= 30 THEN 'hard'
            ELSE 'very_hard' END AS bucket
FROM fl
"""


def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1) over the
    dedup corpus: duplicate-word fraction + top-2-gram fraction per doc.
    Shape: explode bigrams -> two map-side-combinable aggs on doc keys."""
    return TS.repetition_stats(_corpus(spark, sf_dir))


ORACLE_TEXT_REPETITION = f"""
WITH {_CORPUS_SQL},
{_rep_cte("corpus")}
SELECT doc_id, CAST(n_words AS INT) AS n_words,
       round(1 - n_distinct / greatest(n_words, 1), 4) AS dup_word_frac,
       round(top_c / greatest(total_c, 1), 4) AS top_bigram_frac,
       (round(1 - n_distinct / greatest(n_words, 1), 4) > 0.60
        OR round(top_c / greatest(total_c, 1), 4) > 0.20) AS repetitive
FROM rs
"""


def q_text_c4_clean(spark, sf_dir):
    """C4 cleaning (Raffel et al. 2020 §2.2): line-level punctuation /
    length / code filters + doc-level 'lorem ipsum' drop, over a
    deterministically line-structured synthesis of ``documents``. Pure
    codegen — zero shuffles; at 100 TB this is a map over the scan."""
    return TS.c4_line_clean(_c4_synth(spark, sf_dir))


ORACLE_TEXT_C4_CLEAN = f"""
WITH {_C4_SYNTH_SQL},
{_C4_KEPT_SQL}
SELECT doc_id, CAST(n_lines AS INT) AS n_lines,
       CAST(len(keep) AS INT) AS n_kept,
       array_to_string(keep, ' ') AS clean_text
FROM kept WHERE len(keep) > 0
"""


def q_text_pii_redact(spark, sf_dir):
    """PII redaction over a corpus with deterministically injected
    emails + E.164-shaped phones; emits redacted text + match counts.
    Single regexp pass, engine-portable patterns (no lookaround) —
    pure codegen, zero shuffles."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    pii = F.concat(
        F.col("text"),
        F.lit(" contact user"), (F.col("doc_id") % 97).cast("string"),
        F.lit("@mail"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com or call +"),
        (1 + F.col("doc_id") % 9).cast("string"), F.lit(" "),
        F.lpad((100 + F.col("doc_id") % 900).cast("string"), 3, "0"),
        F.lit(" "),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    src = d.select("doc_id", pii.alias("text"))
    ex = TS.redact_pii_exprs(F.col("text"))
    return src.select("doc_id", ex["redacted"].alias("redacted"),
                      ex["n_emails"].alias("n_emails"),
                      ex["n_phones"].alias("n_phones"))


ORACLE_TEXT_PII_REDACT = rf"""
WITH pii AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id % 97 AS VARCHAR)
              || '@mail' || CAST(doc_id % 7 AS VARCHAR)
              || '.example.com or call +'
              || CAST(1 + doc_id % 9 AS VARCHAR) || ' '
              || lpad(CAST(100 + doc_id % 900 AS VARCHAR), 3, '0') || ' '
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(text, '{TS.PHONE_PAT}', '<PHONE>', 'g'),
         '{TS.EMAIL_PAT}', '<EMAIL>', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '{TS.EMAIL_PAT}')) AS INT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '{TS.PHONE_PAT}')) AS INT)
         AS n_phones
FROM pii
"""


def q_text_tfidf_topk(spark, sf_dir):
    """Top-3 TF-IDF terms per document: tokenize (the token-count regex's
    word class), term frequency per (doc, term), document frequency per
    term, idf = ln(N/df), rank by (tfidf DESC, term ASC). Two shuffles
    (doc-term agg, term df) + a broadcast-sized join back — no UDF."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    terms = (docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+"))
        .alias("term"))
        .filter(F.length("term") >= 3))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (tf.join(df, "term")
              .withColumn("tfidf",
                          F.round(F.col("tf") *
                                  F.log(F.lit(float(n_docs)) / F.col("df")),
                                  4)))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("doc_id", "term", "tfidf", "rank"))


ORACLE_TEXT_TFIDF_TOPK = """
WITH toks AS (
  SELECT doc_id, t.term FROM documents,
       UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE len(t.term) >= 3
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
         CAST(df.df AS BIGINT) AS df,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored) WHERE rank <= 3
"""


def q_text_unigram_lm(spark, sf_dir):
    """Corpus-trained unigram LM surprisal per doc — the CCNet-style LM
    quality filter with the corpus itself as the training set. Mean
    negative log-prob in nats/token, rounded 4dp (summation-order-proof);
    vocab tf is one map-side-combinable groupBy, the global total is one
    broadcast row, the log-prob join-back broadcasts the Heaps-law-small
    vocab side (operators.textstats.unigram_lm_score)."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    return TS.unigram_lm_score(d, round_dp=4)


ORACLE_TEXT_UNIGRAM_LM = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
), v AS (
  SELECT tok, count(*) AS tf FROM tok GROUP BY tok
), lp AS (
  SELECT tok, ln(CAST(tf AS DOUBLE)
                 / (SELECT CAST(sum(tf) AS DOUBLE) FROM v)) AS lp
  FROM v
)
SELECT t.doc_id, count(*) AS n_tokens, round(avg(-lp), 4) AS nll
FROM tok t JOIN lp USING (tok) GROUP BY t.doc_id
"""


def q_text_bigram_lm(spark, sf_dir):
    """Corpus-trained bigram LM surprisal per doc: add-0.5-smoothed
    P(w2|w1) over one bigram explode + two groupBys; catches improbable
    TRANSITIONS a unigram filter can't (operators.textstats
    .bigram_lm_score). Docs with < 2 tokens drop out on both engines."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    return TS.bigram_lm_score(d, k=0.5, round_dp=4)


ORACLE_TEXT_BIGRAM_LM = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE text IS NOT NULL
), bg AS (
  SELECT doc_id, w[i + 1] AS w1, w[i + 2] AS w2
  FROM tok, unnest(range(len(w) - 1)) u(i)
  WHERE len(w) >= 2
), c12 AS (
  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2
), c1 AS (
  SELECT w1, count(*) AS c1 FROM bg GROUP BY 1
), v AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE text IS NOT NULL)
)
SELECT bg.doc_id, count(*) AS n_bigrams,
       round(avg(-ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v))), 4) AS nll2
FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
GROUP BY bg.doc_id
"""


# ---------------------------------------------------------------------------
# block 7: Gopher gate, SemDeDup, OPIC, HITS, stream-stream join
# ---------------------------------------------------------------------------


def q_text_gopher(spark, sf_dir):
    """The full Gopher document-quality gate (Rae et al. 2021 §A1.1) —
    word-count bounds, mean word length, symbol-to-word ratio, alphabetic
    word fraction, required-stop-word presence — over the dedup corpus.
    Pure codegen: every metric is an array lambda over the split tokens,
    zero shuffles; at 100 TB this fuses into the scan."""
    return TS.gopher_quality(_corpus(spark, sf_dir))


ORACLE_TEXT_GOPHER = f"""
WITH {_CORPUS_SQL},
g AS (SELECT doc_id, text, string_split(text, ' ') AS w
      FROM corpus WHERE text IS NOT NULL),
m AS (
  SELECT doc_id,
         CAST(len(w) AS INT) AS n_words,
         round(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
               / greatest(len(w), 1), 4) AS mean_word_len,
         round(CAST((len(string_split(text, '#')) - 1)
               + (len(string_split(text, '...')) - 1) AS DOUBLE)
               / greatest(len(w), 1), 4) AS symbol_ratio,
         round(CAST(len(list_filter(w,
                x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
               / greatest(len(w), 1), 4) AS alpha_frac,
         CAST(len(list_filter(
                ['the','be','to','of','and','that','have','with'],
                s -> list_contains(list_transform(w, x -> lower(x)), s)))
              AS INT) AS stop_hits
  FROM g)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, stop_hits,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
        AND stop_hits >= 2) AS gopher_pass
FROM m
"""


def q_text_langid_ngram(spark, sf_dir):
    """Profile-based language ID (the Cavnar-Trenkle n-gram method the
    brief's lang-ID asks for, upgraded from the marker heuristic of
    text_lang_id): TRAIN per-language character-trigram profiles from the
    labeled seed slice (every 3rd doc), then classify EVERY doc by
    profile overlap (count of the doc's distinct trigrams appearing in
    the language's top-20 profile; argmax with lang-asc tie-break, zero
    overlap -> 'und'). Training is one map-side-combinable groupBy; the
    profile is tiny (langs x 20) and broadcast — classification never
    shuffles the corpus, only the per-doc distinct-trigram explode."""
    docs = (_t(spark, sf_dir, "documents")
            .select("doc_id", "lang", F.lower("text").alias("t")))
    tg = F.expr("CASE WHEN char_length(t) >= 3 THEN "
                "transform(sequence(0, char_length(t)-3), "
                "i -> substring(t, i+1, 3)) ELSE array() END")
    grams = docs.select("doc_id", "lang", F.explode(tg).alias("g"))
    wp = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("g"))
    profile = (grams.filter(F.col("doc_id") % 3 == 0)
               .groupBy("lang", "g").agg(F.count("*").alias("c"))
               .withColumn("prank", F.row_number().over(wp))
               .filter(F.col("prank") <= 20)
               .select(F.col("lang").alias("plang"), "g"))
    doc_grams = grams.select("doc_id", "g").distinct()
    matches = (doc_grams.join(F.broadcast(profile), "g")
               .groupBy("doc_id", "plang")
               .agg(F.count("*").alias("hits")))
    wd = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("plang"))
    best = (matches.withColumn("rn", F.row_number().over(wd))
            .filter(F.col("rn") == 1).select("doc_id", "plang"))
    return (docs.join(best, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("plang", F.lit("und")).alias("lang_pred")))


ORACLE_TEXT_LANGID_NGRAM = """
WITH d AS (
  SELECT doc_id, lang, lower(text) AS t FROM documents),
grams AS (
  SELECT doc_id, lang,
         unnest(CASE WHEN length(t) >= 3
                THEN list_transform(range(length(t)-2), i -> t[i+1:i+3])
                ELSE [] END) AS g
  FROM d),
profile AS (
  SELECT lang AS plang, g FROM (
    SELECT lang, g, count(*) AS c,
           row_number() OVER (PARTITION BY lang
                              ORDER BY count(*) DESC, g ASC) AS prank
    FROM grams WHERE doc_id % 3 = 0 GROUP BY lang, g)
  WHERE prank <= 20),
dg AS (SELECT DISTINCT doc_id, g FROM grams),
m AS (
  SELECT doc_id, plang, count(*) AS hits
  FROM dg JOIN profile USING (g) GROUP BY doc_id, plang),
best AS (
  SELECT doc_id, plang FROM (
    SELECT doc_id, plang,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY hits DESC, plang ASC) AS rn
    FROM m) WHERE rn = 1)
SELECT d.doc_id, coalesce(best.plang, 'und') AS lang_pred
FROM d LEFT JOIN best ON best.doc_id = d.doc_id
"""


def q_text_url_extract(spark, sf_dir):
    """Plain-text link discovery (the crawler's non-HTML link source —
    pastebins, feeds, text dumps): regexp_extract_all over the document
    text, one row per found URL with its network class (P5 kernel).
    Pure codegen map + explode — fuses into the scan at 100 TB. The
    fixture embeds two deterministic URLs per doc so the oracle can
    restate the extraction closed-form."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    k = F.col("doc_id")
    syn = F.concat(
        F.substring("text", 1, 40),
        F.lit(" see http://h"), (k % 50).cast("string"),
        F.lit(".onion/p"), k.cast("string"),
        F.lit(" and https://www.ex"), (k % 7).cast("string"),
        F.lit(".com/q?id="), k.cast("string"), F.lit(" end"))
    urls = F.expr(r"regexp_extract_all(t, 'https?://[^ ]+', 0)")
    return (d.select("doc_id", syn.alias("t"))
            .select("doc_id", F.explode(urls).alias("url"))
            .select("doc_id", "url",
                    U.network_type_expr(F.col("url")).alias("network")))


ORACLE_TEXT_URL_EXTRACT = """
SELECT doc_id, 'http://h' || (doc_id % 50) || '.onion/p' || doc_id AS url,
       'onion' AS network
FROM documents
UNION ALL
SELECT doc_id,
       'https://www.ex' || (doc_id % 7) || '.com/q?id=' || doc_id AS url,
       'clearnet' AS network
FROM documents
"""


def q_text_bpe_train_step(spark, sf_dir):
    """The BPE TRAINING step as an oracle row (the tokenizer twin of
    embeddings_kmeans_step): symbol-pair frequencies of the corpus after
    the frozen merge list — exactly the table whose (cnt desc, a, b)
    argmax bpe_train picks as the next merge. One word-count shuffle,
    chained codegen merge rewrites, one map-side-combinable groupBy
    (operators/tokenize.py:bpe_pair_counts)."""
    from genesis_spark.operators.tokenize import bpe_pair_counts

    return bpe_pair_counts(_t(spark, sf_dir, "documents"), _BPE_MERGES)


ORACLE_TEXT_BPE_TRAIN_STEP = f"""
WITH words AS (
  SELECT word, count(*) AS n
  FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
        FROM documents)
  WHERE word <> '' GROUP BY word
),
sym AS (
  SELECT string_split_regex(trim({_bpe_apply_sql(_BPE_MERGES)}), ' +')
           AS t, n
  FROM words
),
pairs AS (
  SELECT unnest(list_transform(range(len(t) - 1),
                i -> {{'a': t[i + 1], 'b': t[i + 2]}})) AS p, n
  FROM sym WHERE len(t) >= 2
)
SELECT p['a'] AS a, p['b'] AS b, CAST(sum(n) AS BIGINT) AS cnt
FROM pairs GROUP BY p['a'], p['b']
"""


def q_text_bm25_topk(spark, sf_dir):
    """BM25 retrieval (k1=1.2, b=0.75, Lucene ``ln(1+(N-df+.5)/(df+.5))``
    idf) for the fixed query {hash, merge, vector} — the SEARCH-side twin
    of text_tfidf_topk: rank documents for a query instead of terms for a
    document. Every scoring input (doc length, avgdl, df, N) is computed
    in-plan — no driver-side literals — and the per-term contributions
    are quantized to 1e-6 integer units BEFORE the per-doc sum, so the
    final score is exact integer arithmetic (float summation order can't
    flip the driver hash).

    Plan/scale: one token shuffle (per-doc length), one (doc,term) agg
    over the 3 matched terms only (filter pushes the query terms into the
    scan side of the explode), df + corpus stats are 3-row / 1-row
    aggregates broadcast back, final top-10 is a TakeOrdered on ~N scored
    docs. No all-pairs, no UDF; at 100 TB the only wide exchange is the
    doc_id-partitioned length/term agg."""
    return (_bm25_ranked(spark, sf_dir)
            .filter(F.col("rank") <= 10)
            .select("doc_id", "n_terms", "score_u", "rank"))

ORACLE_TEXT_BM25_TOPK = f"""
WITH {_BM25_RANKED_SQL}
SELECT doc_id, n_terms, score_u, CAST(rank AS INT) AS rank
FROM bm25_ranked WHERE rank <= 10
"""


def q_text_hashed_lr(spark, sf_dir):
    """Keep/drop labeling over the shared hashed-LR scorer (see
    _hashed_lr_scores for the model shape and scale notes)."""
    return (_hashed_lr_scores(spark, sf_dir)
            .withColumn("label", F.when(F.col("score_u") > 0, "keep")
                        .otherwise("drop"))
            .select("doc_id", "n_bigrams", "score_u", "label"))

ORACLE_TEXT_HASHED_LR = f"""
WITH {_HASHED_LR_SQL}
SELECT doc_id, n_bigrams, score_u,
       CASE WHEN score_u > 0 THEN 'keep' ELSE 'drop' END AS label
FROM lr_scored
"""


def q_text_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT
    5-gram shingles whose first corpus occurrence (min doc_id) is the
    doc itself. Template spam and boilerplate-heavy mirrors score near
    zero (their shingles all debuted elsewhere); the injected corpus
    twins make the signal deterministic. This is the within-corpus
    contamination lens next to dedup_decontaminate's cross-set one.

    Plan/scale: shingle explode -> distinct (doc, shingle) -> the
    first-occurrence agg partitions by shingle (one wide shuffle, the
    same shape dedup_exact_substr already carries at 100 TB) -> join
    back on shingle reuses that partitioning -> per-doc agg. Novelty is
    an integer ratio rounded at 4 dp."""
    corpus = _corpus(spark, sf_dir)
    sh = (corpus.select(
        "doc_id",
        F.explode(D.shingles_expr(F.col("text"), 5)).alias("shingle"))
        .distinct())
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (sh.join(first, "shingle")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_shingles"),
                 F.sum((F.col("first_doc") == F.col("doc_id"))
                       .cast("long")).alias("n_novel"))
            .withColumn("novelty",
                        F.round(F.col("n_novel") / F.col("n_shingles"),
                                4))
            .select("doc_id", "n_shingles", "n_novel", "novelty"))


ORACLE_TEXT_NGRAM_NOVELTY = f"""
WITH {_CORPUS_SQL},
{_shingle_sql(5)},
dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
first AS (SELECT shingle, min(doc_id) AS first_doc FROM dsh
          GROUP BY shingle),
agg AS (
  SELECT doc_id, count(*) AS n_shingles,
         CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM dsh JOIN first USING (shingle) GROUP BY doc_id)
SELECT doc_id, n_shingles, n_novel,
       round(n_novel / n_shingles, 4) AS novelty
FROM agg
"""


def q_text_sentence_dedup(spark, sf_dir):
    """C4's global duplicate-LINE removal (Raffel et al. 2020: any line
    occurring more than once in the corpus is kept only at its first
    occurrence) over the deterministic line-structured corpus, with the
    per-doc text REBUILT from the surviving lines in original order —
    the rebuild makes the value hash sensitive to a single misplaced or
    mis-dropped line anywhere in the corpus. First occurrence = min
    (doc_id, idx) per line, which also drops within-doc repeats.

    Plan/scale: posexplode lines -> ONE window shuffle partitioned by
    md5(line) (64-bit-sized key, not the raw line string — the shuffle
    carries hashes, the payload tags along) -> per-doc rebuild agg on
    doc_id. The same two-exchange shape as dedup_exact_substr; at
    100 TB the line-hash partitioning is what keeps the wide exchange
    bounded."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    lines = d.select(
        "doc_id",
        F.posexplode(_c4_lines_col()).alias("idx", "line"))
    w = (Window.partitionBy(F.md5("line"))
         .orderBy("doc_id", "idx"))
    ranked = lines.withColumn("rn", F.row_number().over(w))
    kept = (ranked.filter(F.col("rn") == 1)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_kept"),
                 F.array_join(
                     F.transform(
                         F.sort_array(F.collect_list(
                             F.struct("idx", "line"))),
                         lambda s: s["line"]), " ")
                 .alias("clean_text")))
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    return (totals.join(kept, "doc_id", "left")
            .select("doc_id", "n_lines",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    F.coalesce("clean_text", F.lit(""))
                    .alias("clean_text")))


ORACLE_TEXT_SENTENCE_DEDUP = f"""
WITH {_C4_SYNTH_SQL},
ex AS (
  SELECT doc_id, CAST(r.idx AS INT) AS idx,
         lines[CAST(r.idx AS INT) + 1] AS line
  FROM ln, UNNEST(range(len(lines))) AS r(idx)),
ranked AS (
  SELECT doc_id, idx, line,
         row_number() OVER (PARTITION BY md5(line)
                            ORDER BY doc_id, idx) AS rn
  FROM ex),
kept AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, ' ' ORDER BY idx) AS clean_text
  FROM ranked WHERE rn = 1 GROUP BY doc_id),
totals AS (SELECT doc_id, count(*) AS n_lines FROM ex GROUP BY doc_id)
SELECT t.doc_id, t.n_lines,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       coalesce(k.clean_text, '') AS clean_text
FROM totals t LEFT JOIN kept k USING (doc_id)
"""


def q_text_bigram_pmi(spark, sf_dir):
    """PMI collocation mining (Church & Hanks 1990) — the phrase/
    multiword-expression extractor a tokenizer-training pipeline runs
    before BPE (strong collocations become merge candidates; the
    text_bpe_train_step row picks merges by raw frequency, this row
    ranks them by association strength): PMI(a,b) =
    ln((c_ab/M) / ((c_a/N)(c_b/N))) over adjacent token pairs, c_ab >= 3,
    quantized to 1e-6 integer units, global top-20 with (wa, wb)
    tie-break.

    Plan/scale: one unigram agg, one bigram agg (both map-side
    combinable), unigram table joined back twice (vocabulary-sized —
    broadcast at any corpus scale), 1-row totals crossJoin, top-20
    TakeOrdered. The corpus itself shuffles only for the two counts."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    arr = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                   lambda x: F.length(x) >= 2)
    docs = d.select(arr.alias("w"))
    uni = (docs.select(F.explode("w").alias("term"))
           .groupBy("term").agg(F.count("*").alias("c")))
    tot = uni.agg(F.sum("c").alias("n"))
    bigrams = F.when(
        F.size("w") >= 2,
        F.transform(F.sequence(F.lit(1), F.size("w") - 1),
                    lambda i: F.concat(F.element_at("w", i), F.lit("|"),
                                       F.element_at("w", i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    bi0 = (docs.select(F.explode(bigrams).alias("bigram"))
           .groupBy("bigram").agg(F.count("*").alias("c_ab")))
    # M = ALL adjacent pairs (before the frequency floor): p(a,b) =
    # c_ab/M must normalize by the full event space or every PMI is
    # shifted up by ln(total/kept)
    m = bi0.agg(F.sum("c_ab").alias("m"))
    bi = (bi0.filter(F.col("c_ab") >= 3)
          .select(F.substring_index("bigram", "|", 1).alias("wa"),
                  F.substring_index("bigram", "|", -1).alias("wb"),
                  "c_ab"))
    ua = uni.select(F.col("term").alias("wa"), F.col("c").alias("ca"))
    ub = uni.select(F.col("term").alias("wb"), F.col("c").alias("cb"))
    scored = (bi.join(F.broadcast(ua), "wa").join(F.broadcast(ub), "wb")
              .crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(m))
              .withColumn(
                  "pmi_u",
                  F.round(F.log((F.col("c_ab") / F.col("m")) /
                                ((F.col("ca") / F.col("n")) *
                                 (F.col("cb") / F.col("n")))) * 1e6)
                  .cast("long")))
    w = Window.orderBy(F.desc("pmi_u"), F.asc("wa"), F.asc("wb"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 20)
            .select("wa", "wb", "c_ab", "pmi_u", "rank"))


ORACLE_TEXT_BIGRAM_PMI = """
WITH arrs AS (
  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> len(x) >= 2) AS w
  FROM documents),
uni AS (
  SELECT u.t AS term, count(*) AS c
  FROM arrs, UNNEST(w) AS u(t) GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
bi0 AS (
  SELECT g.bigram, count(*) AS c_ab FROM arrs,
       UNNEST(CASE WHEN len(w) >= 2
                THEN list_transform(range(1, len(w)),
                                    i -> w[i] || '|' || w[i + 1])
                ELSE [] END) AS g(bigram)
  GROUP BY g.bigram),
m AS (SELECT CAST(sum(c_ab) AS BIGINT) AS m FROM bi0),
bi AS (
  SELECT split_part(bigram, '|', 1) AS wa,
         split_part(bigram, '|', 2) AS wb, c_ab
  FROM bi0 WHERE c_ab >= 3),
scored AS (
  SELECT bi.wa, bi.wb, bi.c_ab,
         CAST(round(ln((bi.c_ab / m.m) /
                       ((ua.c / tot.n) * (ub.c / tot.n)))
                    * 1000000.0) AS BIGINT) AS pmi_u
  FROM bi
  JOIN uni ua ON ua.term = bi.wa
  JOIN uni ub ON ub.term = bi.wb
  CROSS JOIN tot CROSS JOIN m)
SELECT wa, wb, c_ab, pmi_u, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY pmi_u DESC, wa ASC, wb ASC)
    AS rank FROM scored) WHERE rank <= 20
"""


def q_text_char_entropy(spark, sf_dir):
    """Character-level Shannon entropy per document — the classic
    gibberish / binary-spill / key-mash detector (low entropy =
    template spam, implausibly high = random bytes).  Per-(doc, char)
    terms quantize to 1e-6 integer units (the corpus_drift_kl
    convention) so the cross-engine sum is an exact integer sum.

    Plan/scale: explode chars -> partial-agg on (doc_id, char) — at
    most |alphabet| rows per doc survive the map-side combine — then a
    doc_id roll-up.  Two bounded shuffles; nothing carries raw text."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    # [^\n], not '.': Java-regex '.' also excludes \r/ /... while
    # RE2 (the oracle engine) excludes only \n — CRLF text would diverge
    ch = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(r"[^\n]"), 0))
        .alias("ch"))
    cnt = ch.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"),
                                    F.count(F.lit(1)).alias("n_distinct"))
    p = F.col("c") / F.col("n")
    term_u = F.round(-p * F.log(p) * 1e6).cast("long")
    per = (cnt.join(tot, "doc_id")
           .groupBy("doc_id")
           .agg(F.max("n").alias("n_chars"),
                F.max("n_distinct").cast("long").alias("n_distinct"),
                F.sum(term_u).alias("entropy_u")))
    suspect = (F.col("n_chars") >= 50) & (F.col("entropy_u") < 2000000)
    return per.select("doc_id", "n_chars", "n_distinct", "entropy_u",
                      suspect.alias("suspect"))


ORACLE_TEXT_CHAR_ENTROPY = r"""
WITH ch AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[^\n]')) AS ch
  FROM documents WHERE text IS NOT NULL
),
cnt AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch),
tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_distinct
        FROM cnt GROUP BY doc_id),
per AS (
  SELECT cnt.doc_id, max(n) AS n_chars, max(n_distinct) AS n_distinct,
         CAST(sum(CAST(round(-(c * 1.0 / n) * ln(c * 1.0 / n) * 1000000.0)
                       AS BIGINT)) AS BIGINT) AS entropy_u
  FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
  GROUP BY cnt.doc_id
)
SELECT doc_id, n_chars, n_distinct, entropy_u,
       (n_chars >= 50 AND entropy_u < 2000000) AS suspect
FROM per
"""


def q_text_mojibake(spark, sf_dir):
    """Encoding-damage triage for a web corpus: count U+FFFD
    replacement characters and the classic UTF-8-decoded-as-Latin-1
    signatures (ftfy's core cases), emit a verdict and the repaired
    text.  Damage is injected deterministically by doc_id class so
    every branch has positives.  Pure codegen (literal replace chain,
    two regexp_counts) — zero shuffles; at 100 TB this is a map over
    the scan."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    cls = F.col("doc_id") % 4
    damaged = (F.when(cls == 1, F.concat(
                    F.col("text"), F.lit(" caf" + _MOJI_EACUTE + " "
                                         + _MOJI_RSQUO + "quote"
                                         + _MOJI_LDQUO)))
               .when(cls == 2, F.concat(
                    F.col("text"), F.lit(" bad" + _REPL_CHAR
                                         + _REPL_CHAR + "bytes")))
               .when(cls == 3, F.concat(
                    F.col("text"), F.lit(_MOJI_NBSP + "padded"
                                         + _MOJI_NBSP)))
               .otherwise(F.col("text")))
    src = d.select("doc_id", damaged.alias("text"))
    n_repl = F.regexp_count("text", F.lit(_REPL_CHAR))
    n_moji = F.regexp_count(
        "text", F.lit("|".join([_MOJI_RSQUO, _MOJI_LDQUO,
                                _MOJI_EACUTE, _MOJI_NBSP])))
    fixed = F.col("text")
    for bad, good in [(_MOJI_RSQUO, "’"), (_MOJI_LDQUO, "“"),
                      (_MOJI_EACUTE, "é"), (_MOJI_NBSP, " ")]:
        fixed = F.replace(fixed, F.lit(bad), F.lit(good))
    verdict = (F.when(n_repl > 0, "replacement")
               .when(n_moji > 0, "mojibake").otherwise("clean"))
    return src.select("doc_id", n_repl.alias("n_repl"),
                      n_moji.alias("n_moji"), verdict.alias("verdict"),
                      fixed.alias("fixed"))


ORACLE_TEXT_MOJIBAKE = f"""
WITH moji AS (
  SELECT {_chr_sql(_MOJI_RSQUO)} AS rsquo, {_chr_sql(_MOJI_LDQUO)} AS ldquo,
         {_chr_sql(_MOJI_EACUTE)} AS eacute, {_chr_sql(_MOJI_NBSP)} AS nbsp,
         chr(65533) AS repl
),
src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 1 THEN
                text || ' caf' || eacute || ' ' || rsquo || 'quote' || ldquo
              WHEN doc_id % 4 = 2 THEN
                text || ' bad' || repl || repl || 'bytes'
              WHEN doc_id % 4 = 3 THEN
                text || nbsp || 'padded' || nbsp
              ELSE text END AS text
  FROM documents CROSS JOIN moji
  WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, chr(65533))) AS INT) AS n_repl,
       CAST(len(regexp_extract_all(text,
            (SELECT rsquo || '|' || ldquo || '|' || eacute || '|' || nbsp
             FROM moji))) AS INT) AS n_moji,
       CASE WHEN len(regexp_extract_all(text, chr(65533))) > 0
              THEN 'replacement'
            WHEN len(regexp_extract_all(text,
                 (SELECT rsquo || '|' || ldquo || '|' || eacute || '|' || nbsp
                  FROM moji))) > 0 THEN 'mojibake'
            ELSE 'clean' END AS verdict,
       replace(replace(replace(replace(text,
           (SELECT rsquo FROM moji), chr(8217)),
           (SELECT ldquo FROM moji), chr(8220)),
           (SELECT eacute FROM moji), chr(233)),
           (SELECT nbsp FROM moji), ' ') AS fixed
FROM src
"""


def q_text_zipf_fit(spark, sf_dir):
    """Zipf's-law fit over the corpus vocabulary — the one-row
    distribution diagnostic (slope ~ -1 for natural text; spam /
    machine-generated corpora bend it): OLS of ln(freq) on ln(rank)
    over the top 256 types with freq >= 2.  Per-row OLS terms quantize
    to 1e-6 integer units, so slope / intercept / r2 derive from exact
    integer sums — summation order can't flip the hash.

    Plan/scale: the vocab census is one partial-agg shuffle; the
    global rank window runs over the CENSUS (|types|, driver-scale),
    never the corpus — the standard census-then-rank shape."""
    d = _t(spark, sf_dir, "documents").select("text")
    vocab = (d.select(F.explode(F.split(F.lower("text"), "[^a-z]+"))
                      .alias("w"))
             .filter(F.length("w") >= 2)
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    r = Window.orderBy(F.col("freq").desc(), F.col("w").asc())
    top = (vocab.withColumn("rank", F.row_number().over(r))
           .filter((F.col("rank") <= 256) & (F.col("freq") >= 2)))
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    u = lambda col: F.round(col * 1e6).cast("long")  # noqa: E731
    s = top.agg(F.count(F.lit(1)).alias("n"),
                F.sum(u(x)).alias("sx"), F.sum(u(y)).alias("sy"),
                F.sum(u(x * y)).alias("sxy"), F.sum(u(x * x)).alias("sxx"),
                F.sum(u(y * y)).alias("syy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx") / 1e6, F.col("sy") / 1e6
    sxy, sxx, syy = F.col("sxy") / 1e6, F.col("sxx") / 1e6, F.col("syy") / 1e6
    cov, vx, vy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    return s.select(
        "n",
        F.round(cov / vx, 4).alias("slope"),
        F.round((sy - (cov / vx) * sx) / n, 4).alias("intercept"),
        F.round(cov * cov / (vx * vy), 4).alias("r2"))


ORACLE_TEXT_ZIPF_FIT = r"""
WITH vocab AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents)
  WHERE len(w) >= 2 GROUP BY w
),
top AS (
  SELECT * FROM (
    SELECT w, freq,
           row_number() OVER (ORDER BY freq DESC, w ASC) AS rank
    FROM vocab) WHERE rank <= 256 AND freq >= 2
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(ln(rank) * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sx,
         CAST(sum(CAST(round(ln(freq) * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sy,
         CAST(sum(CAST(round(ln(rank) * ln(freq) * 1000000.0) AS BIGINT))
              AS BIGINT) AS sxy,
         CAST(sum(CAST(round(ln(rank) * ln(rank) * 1000000.0) AS BIGINT))
              AS BIGINT) AS sxx,
         CAST(sum(CAST(round(ln(freq) * ln(freq) * 1000000.0) AS BIGINT))
              AS BIGINT) AS syy
  FROM top
)
SELECT n,
       round((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             / (n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6)), 4) AS slope,
       round(((sy / 1e6) - ((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
                            / (n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6)))
                           * (sx / 1e6)) / n, 4) AS intercept,
       round((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             * (n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             / ((n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6))
                * (n * (syy / 1e6) - (sy / 1e6) * (sy / 1e6))), 4) AS r2
FROM s
"""


def q_text_rake(spark, sf_dir):
    """RAKE keyword scoring (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs; each word scores deg/freq where
    deg sums the lengths of every phrase containing it.  Phrase ids
    come from a running stopword count per doc (ONE per-doc window),
    phrase lengths from a per-(doc, phrase) window, word stats from a
    token-keyed partial agg — integer arithmetic until the single
    4-dp division.  Per-doc windows bound state at 100 TB; the only
    corpus-wide exchange carries (token, small ints)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tk = (d.select("doc_id",
                   F.posexplode(F.split(F.lower("text"), "[^a-z]+"))
                   .alias("i", "tok"))
          .filter(F.col("tok") != ""))
    is_stop = F.col("tok").isin(*_RAKE_STOPS)
    wd = Window.partitionBy("doc_id").orderBy("i") \
        .rowsBetween(Window.unboundedPreceding, 0)
    tk = tk.select("doc_id", "i", "tok", is_stop.alias("stop"),
                   F.sum(is_stop.cast("int")).over(wd).alias("phrase_id"))
    content = tk.filter(~F.col("stop"))
    wp = Window.partitionBy("doc_id", "phrase_id")
    content = content.withColumn("phrase_len",
                                 F.count(F.lit(1)).over(wp))
    stats = (content.filter(F.length("tok") >= 3)
             .groupBy(F.col("tok").alias("word"))
             .agg(F.count(F.lit(1)).alias("freq"),
                  F.sum("phrase_len").alias("deg")))
    return (stats.filter(F.col("freq") >= 5)
            .select("word", "freq", "deg",
                    F.round(F.col("deg") / F.col("freq"), 4)
                    .alias("rake_score")))


ORACLE_TEXT_RAKE = f"""
WITH tk AS (
  SELECT doc_id, i, w[i+1] AS tok
  FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS w,
               unnest(range(len(w))) AS i
        FROM documents)
  WHERE w[i+1] <> ''
),
ph AS (
  SELECT doc_id, i, tok,
         tok IN {str(tuple(_RAKE_STOPS))} AS stop,
         sum(CASE WHEN tok IN {str(tuple(_RAKE_STOPS))} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i
                 ROWS UNBOUNDED PRECEDING) AS phrase_id
  FROM tk
),
content AS (
  SELECT doc_id, tok, phrase_id,
         count(*) OVER (PARTITION BY doc_id, phrase_id) AS phrase_len
  FROM ph WHERE NOT stop
),
stats AS (
  SELECT tok AS word, count(*) AS freq,
         CAST(sum(phrase_len) AS BIGINT) AS deg
  FROM content WHERE len(tok) >= 3 GROUP BY tok
)
SELECT word, freq, deg, round(deg * 1.0 / freq, 4) AS rake_score
FROM stats WHERE freq >= 5
"""


def q_text_quality_pr(spark, sf_dir):
    """Quality-filter calibration — the eval row for the text_quality
    rubric (the eval-family pattern of ann_recall_eval /
    dedup_minhash_eval / url_bloom_eval, applied to the quality gate a
    corpus-clean pipeline thresholds on): sweep 5 score thresholds and
    report exact precision/recall in ppm against an independent weak
    label (doc length >= 200 chars — the signal the score must NOT just
    restate, since length contributes at most 30 of 100 points). This is
    the table an operator reads to PICK the corpus_clean threshold
    instead of guessing.

    Plan/scale: one scan scores every doc (all codegen), a 5-row
    threshold literal cross-joins (broadcast-trivial), one partial agg —
    counts only, ppm division exact-integer."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    scored = d.select(
        TS.quality_score_expr(F.col("text")).alias("q"),
        (F.length("text") >= 200).cast("long").alias("label"))
    thr = spark.range(1, 6).select(
        (F.col("id") * 20 - 10).cast("int").alias("threshold"))  # 10..90
    graded = scored.crossJoin(F.broadcast(thr)).select(
        "threshold",
        ((F.col("q") >= F.col("threshold")).cast("long")).alias("pred"),
        "label")
    agg = graded.groupBy("threshold").agg(
        F.sum(F.col("pred") * F.col("label")).alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("label"))).alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("label")).alias("fn"))
    return agg.select(
        "threshold",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.expr("tp * 1000000 DIV greatest(tp + fp, 1)").cast("long")
        .alias("precision_ppm"),
        F.expr("tp * 1000000 DIV greatest(tp + fn, 1)").cast("long")
        .alias("recall_ppm"))


ORACLE_TEXT_QUALITY_PR = f"""
WITH {_quality_cte("doc_id", "documents")},
lbl AS (
  SELECT qs.q,
         CASE WHEN qm.n >= 200 THEN 1 ELSE 0 END AS label
  FROM qs JOIN qm ON qm.doc_id = qs.doc_id
  WHERE qm.n IS NOT NULL),
thr AS (SELECT CAST(i * 20 - 10 AS INT) AS threshold
        FROM range(1, 6) t(i)),
graded AS (
  SELECT t.threshold,
         CASE WHEN l.q >= t.threshold THEN 1 ELSE 0 END AS pred,
         l.label
  FROM lbl l CROSS JOIN thr t),
agg AS (
  SELECT threshold,
         CAST(sum(pred * label) AS BIGINT) AS tp,
         CAST(sum(pred * (1 - label)) AS BIGINT) AS fp,
         CAST(sum((1 - pred) * label) AS BIGINT) AS fn
  FROM graded GROUP BY threshold)
SELECT threshold, tp, fp, fn,
       CAST(tp * 1000000 // greatest(tp + fp, 1) AS BIGINT)
         AS precision_ppm,
       CAST(tp * 1000000 // greatest(tp + fn, 1) AS BIGINT)
         AS recall_ppm
FROM agg
"""


def q_text_inverted_index(spark, sf_dir):
    """Inverted-index construction — the posting lists a search layer
    (and the BM25 row) reads, built as a bounded driver row: distinct
    (term, doc) pairs for terms of length >= 3, document frequency per
    term, the 20 highest-df terms (ties broken by term ASC), and each
    one's posting list truncated to the 10 lowest doc_ids, emitted as a
    comma-joined string (engine-portable — no array hashing in the
    compare).

    Plan/scale: explode -> distinct (the shuffle is on (term, doc_id),
    never raw text), df partial agg, top-20 via sort-limit (tiny), then
    a BROADCAST semi-join back so posting collection touches only the
    20 surviving terms' pairs; collect_list is bounded by df and sliced
    to 10 after an explicit array_sort — order is deterministic, not
    collection-order."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    pairs = (d.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.explode(F.split(F.lower("text"), " "))
                      .alias("term"))
             .filter(F.length("term") >= 3)
             .distinct())
    df_ = pairs.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    top = (df_.orderBy(F.col("df").desc(), F.col("term").asc()).limit(20))
    postings = (pairs.join(F.broadcast(top), "term")
                .groupBy("term")
                .agg(F.max("df").alias("df"),
                     F.slice(F.array_sort(F.collect_list("doc_id")),
                             1, 10).alias("plist")))
    return postings.select(
        "term", F.col("df").cast("long").alias("df"),
        F.size("plist").cast("int").alias("n_posted"),
        F.array_join(F.transform("plist", lambda x: x.cast("string")),
                     ",").alias("postings"))


ORACLE_TEXT_INVERTED_INDEX = """
WITH pairs AS (
  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id,
         unnest(string_split(lower(text), ' ')) AS term
  FROM documents WHERE text IS NOT NULL),
flt AS (SELECT * FROM pairs WHERE length(term) >= 3),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       FROM flt GROUP BY term),
top AS (
  SELECT term, df,
         row_number() OVER (ORDER BY df DESC, term ASC) AS rk
  FROM df QUALIFY rk <= 20),
plists AS (
  SELECT f.term, max(t.df) AS df,
         list_slice(list(f.doc_id ORDER BY f.doc_id), 1, 10) AS plist
  FROM flt f JOIN top t ON t.term = f.term
  GROUP BY f.term)
SELECT term, df,
       CAST(len(plist) AS INT) AS n_posted,
       array_to_string(plist, ',') AS postings
FROM plists
"""


def q_text_code_detect(spark, sf_dir):
    """Code-vs-prose routing — the corpus-composition gate every LLM
    data pipeline runs (code goes to a code pipeline with different
    dedup/quality rules; prose goes to text cleaning): symbol density,
    code-keyword hits, and digit density vote on each doc; 2+ votes
    route to `code`. Code docs are synthesized deterministically (every
    11th doc gains a code tail) so both routes materialize and the
    detector is judged against a known plant.

    Plan/scale: per-row regexp codegen + one 2-row agg — one scan, no
    Python, the same shape as the C4/Gopher filter rows."""
    i = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    code_tail = (" def run(): return {x[i]; i += 1}"
                 " if (a == b) { return 0; } // end")
    text = F.when(i % 11 == 0,
                  F.concat(F.col("text"), F.lit(code_tail))
                  ).otherwise(F.col("text"))
    t = d.select(i.alias("doc_id"), text.alias("t"))
    n_chars = F.greatest(F.length("t"), F.lit(1))
    n_sym = F.length(F.regexp_replace("t", "[^{}();=\\[\\]<>]", ""))
    kw_hits = F.size(F.expr(
        r"regexp_extract_all(t, '\\b(def|return|if|else|for|while"
        r"|var|let|const|function|import)\\b', 0)"))
    n_digit = F.length(F.regexp_replace("t", "[^0-9]", ""))
    feat = t.select(
        "doc_id",
        (n_sym * 1000 / n_chars >= 10).cast("int").alias("v_sym"),
        (kw_hits >= 3).cast("int").alias("v_kw"),
        (n_digit * 1000 / n_chars >= 5).cast("int").alias("v_digit"))
    routed = feat.select(
        F.when(F.col("v_sym") + F.col("v_kw") + F.col("v_digit") >= 2,
               F.lit("code")).otherwise(F.lit("prose")).alias("route"),
        "v_sym", "v_kw", "v_digit")
    return routed.groupBy("route").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("v_sym").cast("long").alias("n_sym_votes"),
        F.sum("v_kw").cast("long").alias("n_kw_votes"),
        F.sum("v_digit").cast("long").alias("n_digit_votes"))


ORACLE_TEXT_CODE_DETECT = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text ||
           ' def run(): return {x[i]; i += 1} if (a == b) { return 0; } // end'
         ELSE text END AS t
  FROM documents WHERE text IS NOT NULL),
feat AS (
  SELECT doc_id,
    CASE WHEN length(regexp_replace(t, '[^{}();=\[\]<>]', '', 'g'))
              * 1000 / greatest(length(t), 1) >= 10
         THEN 1 ELSE 0 END AS v_sym,
    CASE WHEN len(regexp_extract_all(t, '\b(def|return|if|else|for'
              || '|while|var|let|const|function|import)\b')) >= 3
         THEN 1 ELSE 0 END AS v_kw,
    CASE WHEN length(regexp_replace(t, '[^0-9]', '', 'g'))
              * 1000 / greatest(length(t), 1) >= 5
         THEN 1 ELSE 0 END AS v_digit
  FROM t),
routed AS (
  SELECT CASE WHEN v_sym + v_kw + v_digit >= 2 THEN 'code'
              ELSE 'prose' END AS route,
         v_sym, v_kw, v_digit
  FROM feat)
SELECT route, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(v_sym) AS BIGINT) AS n_sym_votes,
       CAST(sum(v_kw) AS BIGINT) AS n_kw_votes,
       CAST(sum(v_digit) AS BIGINT) AS n_digit_votes
FROM routed GROUP BY route
"""


def q_text_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix — the eval row for the marker-word
    lang_id detector (the eval-family discipline: a detector without a
    confusion matrix is a guess): declared corpus language vs detected
    language, pair counts, and the exact per-pair share of the declared
    language's docs in ppm. The diagonal is accuracy; off-diagonal mass
    says WHICH languages bleed into which (what you tune markers by).

    Plan/scale: one scan with the shared lang_id_expr + one two-key
    partial agg + one bounded window over <= #languages² rows."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    pairs = (d.select(F.col("lang").alias("lang_declared"),
                      TS.lang_id_expr(F.col("text"))
                      .alias("lang_detected"))
             .groupBy("lang_declared", "lang_detected")
             .agg(F.count("*").cast("long").alias("n")))
    tot = Window.partitionBy("lang_declared")
    return pairs.select(
        "lang_declared", "lang_detected", "n",
        (F.col("lang_declared") == F.col("lang_detected"))
        .alias("is_match"),
        F.expr("n * 1000000").cast("long").alias("num"),
        F.sum("n").over(tot).alias("den")
    ).select("lang_declared", "lang_detected", "n", "is_match",
             F.expr("num DIV den").cast("long").alias("share_ppm"))


ORACLE_TEXT_LANG_CONFUSION = _lang_confusion_oracle()


def q_text_dup_ngram_coverage(spark, sf_dir):
    """Cross-document duplicated-n-gram coverage — the RefinedWeb /
    MassiveText line-level dedup metric (Penedo et al. 2023 §4.2:
    "fraction of characters in duplicated n-grams") at word-8-gram
    granularity: an 8-gram appearing in >= 2 distinct docs is
    DUPLICATED, and each doc reports what fraction of its word
    positions any duplicated 8-gram covers (exact ppm). This is the
    cross-doc complement to text_repetition's intra-doc stats — the
    number the near-dedup threshold is tuned against.

    Plan/scale: grams hash to md5 BEFORE the shuffle (wide text stays
    map-side), df is one partial agg, coverage explodes only DUP gram
    windows (8 positions each) and distinct-counts per doc — cost
    scales with duplicated mass, not corpus size."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = d.select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.split("text", " ").alias("ws"))
    grams = base.select(
        "doc_id", F.size("ws").alias("n_words"),
        F.explode(F.expr(
            "transform(sequence(1, greatest(size(ws) - 7, 0)), "
            "i -> struct(i AS pos, "
            "md5(array_join(slice(ws, i, 8), ' ')) AS g))")).alias("gr"))
    occ = grams.select("doc_id", "n_words", F.col("gr.pos").alias("pos"),
                       F.col("gr.g").alias("g"))
    df_ = (occ.select("g", "doc_id").distinct()
           .groupBy("g").agg(F.count("*").alias("df")))
    dup = occ.join(df_.filter(F.col("df") >= 2), "g")
    covered = (dup.select("doc_id", "n_words",
                          F.explode(F.expr("sequence(pos, pos + 7)"))
                          .alias("cov_pos"))
               .groupBy("doc_id")
               .agg(F.max("n_words").alias("n_words"),
                    F.countDistinct("cov_pos").cast("long")
                    .alias("n_dup_positions")))
    sizes = base.select("doc_id", F.size("ws").cast("long")
                        .alias("n_words"))
    return (sizes.join(covered.select("doc_id", "n_dup_positions"),
                       "doc_id", "left")
            .select("doc_id", "n_words",
                    F.coalesce("n_dup_positions", F.lit(0)).cast("long")
                    .alias("n_dup_positions"))
            .withColumn("dup_coverage_ppm",
                        F.expr("n_dup_positions * 1000000 "
                               "DIV greatest(n_words, 1)").cast("long")))


ORACLE_TEXT_DUP_NGRAM_COVERAGE = """
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         string_split(text, ' ') AS ws
  FROM documents WHERE text IS NOT NULL),
occ AS (
  SELECT doc_id, len(ws) AS n_words,
         CAST(i AS INT) AS pos,
         md5(array_to_string(ws[CAST(i AS INT):CAST(i + 7 AS INT)], ' '))
           AS g
  FROM base, unnest(range(1, greatest(len(ws) - 7, 0) + 1)) t(i)),
df AS (
  SELECT g, count(DISTINCT doc_id) AS df FROM occ GROUP BY g),
dup AS (
  SELECT o.doc_id, o.n_words, o.pos
  FROM occ o JOIN df ON df.g = o.g WHERE df.df >= 2),
covered AS (
  SELECT doc_id, count(DISTINCT cov_pos) AS n_dup_positions
  FROM (SELECT doc_id, pos + x AS cov_pos
        FROM dup, unnest(range(0, 8)) t(x))
  GROUP BY doc_id),
sizes AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words FROM base)
SELECT s.doc_id, s.n_words,
       CAST(coalesce(c.n_dup_positions, 0) AS BIGINT)
         AS n_dup_positions,
       CAST(coalesce(c.n_dup_positions, 0) * 1000000
            // greatest(s.n_words, 1) AS BIGINT) AS dup_coverage_ppm
FROM sizes s LEFT JOIN covered c ON c.doc_id = s.doc_id
"""


def q_text_rag_chunks(spark, sf_dir):
    """Sliding-window chunking for retrieval indexing — the
    chunk-with-overlap pass every RAG ingestion pipeline runs (64-token
    windows, 16-token overlap = stride 48, so a fact straddling a
    boundary survives in the next chunk): per chunk, the doc, ordinal,
    start position, exact token count, and an md5 content hash (the
    dedup/update key — chunk text itself never needs to leave the
    scan).

    Plan/scale: pure array codegen (sequence + slice per row) + one
    explode; output cardinality ~n_tokens/48 per doc, no shuffle."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = d.select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.split("text", " ").alias("ws"))
    chunks = base.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, greatest(size(ws), 1), 48), "
            "(s, i) -> struct(i AS chunk_id, s AS start_pos, "
            "size(slice(ws, s, 64)) AS n_tokens, "
            "md5(array_join(slice(ws, s, 64), ' ')) AS chunk_md5))"
        )).alias("c"))
    return chunks.select(
        "doc_id",
        F.col("c.chunk_id").cast("int").alias("chunk_id"),
        F.col("c.start_pos").cast("int").alias("start_pos"),
        F.col("c.n_tokens").cast("int").alias("n_tokens"),
        F.col("c.chunk_md5").alias("chunk_md5"))


ORACLE_TEXT_RAG_CHUNKS = """
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         string_split(text, ' ') AS ws
  FROM documents WHERE text IS NOT NULL)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1
            AS INT) AS chunk_id,
       CAST(s AS INT) AS start_pos,
       CAST(len(ws[CAST(s AS INT):CAST(s + 63 AS INT)]) AS INT)
         AS n_tokens,
       md5(array_to_string(ws[CAST(s AS INT):CAST(s + 63 AS INT)], ' '))
         AS chunk_md5
FROM base, unnest(range(1, greatest(len(ws), 1) + 1, 48)) t(s)
"""


def q_text_heaps_fit(spark, sf_dir):
    """Heaps'-law vocabulary-growth fit — the companion diagnostic to
    text_zipf_fit: V(N) = K * N^beta (beta ~ 0.4-0.6 for natural text;
    template/machine-generated corpora flatten it, OCR noise inflates
    it). Per doc in doc_id order: cumulative tokens consumed N and
    cumulative distinct types V (a type's birth doc = min(doc_id) over
    its occurrences), then OLS of ln V on ln N. The ln terms are taken
    on exact integer cumsums and quantized to 1e-6 units before
    summing, so slope/intercept/r2 derive from exact integer sums —
    the text_zipf_fit recipe verbatim.

    Plan/scale: token explode -> two census-scale aggs (per-type birth,
    per-doc counts); the cumsum window runs over |docs| census rows,
    never the token stream. Same census-then-rank shape as zipf."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = (d.select("doc_id",
                     F.explode(F.split(F.lower("text"), "[^a-z]+"))
                     .alias("w"))
            .filter(F.length("w") >= 2))
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"))
    births = (toks.groupBy("w").agg(F.min("doc_id").alias("birth"))
              .groupBy("birth").agg(F.count(F.lit(1)).alias("new_types"))
              .withColumnRenamed("birth", "doc_id"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    pts = (per_doc.join(births, "doc_id", "left")
           .select("doc_id", "n_tokens",
                   F.coalesce("new_types", F.lit(0)).alias("new_types"))
           .withColumn("nn", F.sum("n_tokens").over(w))
           .withColumn("vv", F.sum("new_types").over(w))
           .filter((F.col("nn") >= 10) & (F.col("vv") >= 1)))
    x = F.log(F.col("nn").cast("double"))
    y = F.log(F.col("vv").cast("double"))
    u = lambda col: F.round(col * 1e6).cast("long")  # noqa: E731
    s = pts.agg(F.count(F.lit(1)).alias("n"),
                F.sum(u(x)).alias("sx"), F.sum(u(y)).alias("sy"),
                F.sum(u(x * y)).alias("sxy"),
                F.sum(u(x * x)).alias("sxx"),
                F.sum(u(y * y)).alias("syy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx") / 1e6, F.col("sy") / 1e6
    sxy, sxx, syy = (F.col("sxy") / 1e6, F.col("sxx") / 1e6,
                     F.col("syy") / 1e6)
    cov, vx, vy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    return s.select(
        "n",
        F.round(cov / vx, 4).alias("beta"),
        F.round((sy - (cov / vx) * sx) / n, 4).alias("ln_k"),
        F.round(cov * cov / (vx * vy), 4).alias("r2"))


ORACLE_TEXT_HEAPS_FIT = r"""
WITH toks AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents)
  WHERE len(w) >= 2),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY doc_id),
births AS (
  SELECT birth AS doc_id, CAST(count(*) AS BIGINT) AS new_types FROM (
    SELECT w, min(doc_id) AS birth FROM toks GROUP BY w)
  GROUP BY birth),
pts AS (
  SELECT sum(n_tokens) OVER (ORDER BY p.doc_id
                             ROWS UNBOUNDED PRECEDING) AS nn,
         sum(coalesce(new_types, 0))
           OVER (ORDER BY p.doc_id ROWS UNBOUNDED PRECEDING) AS vv
  FROM per_doc p LEFT JOIN births b ON b.doc_id = p.doc_id),
f AS (SELECT nn, vv FROM pts WHERE nn >= 10 AND vv >= 1),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(ln(nn) * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sx,
         CAST(sum(CAST(round(ln(vv) * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sy,
         CAST(sum(CAST(round(ln(nn) * ln(vv) * 1000000.0) AS BIGINT))
              AS BIGINT) AS sxy,
         CAST(sum(CAST(round(ln(nn) * ln(nn) * 1000000.0) AS BIGINT))
              AS BIGINT) AS sxx,
         CAST(sum(CAST(round(ln(vv) * ln(vv) * 1000000.0) AS BIGINT))
              AS BIGINT) AS syy
  FROM f)
SELECT n,
       round((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             / (n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6)), 4) AS beta,
       round(((sy / 1e6) - ((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
                            / (n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6)))
              * (sx / 1e6)) / n, 4) AS ln_k,
       round((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             * (n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             / ((n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6))
                * (n * (syy / 1e6) - (sy / 1e6) * (sy / 1e6))), 4) AS r2
FROM s
"""


def q_text_kn_bigram(spark, sf_dir):
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney, ICASSP 1995;
    Chen & Goodman 1999) — the principled upgrade over text_bigram_lm's
    add-0.5 smoothing: absolute discount D = 3/4 on observed bigram
    counts, with the freed mass backed off to the CONTINUATION
    probability (in how many distinct contexts does w2 appear), which
    is what makes KN the default n-gram smoother.

      P(w2|w1) = max(c12 - D, 0)/c1  +  (D * N1+(w1,.)/c1) * N1+(.,w2)/T

    Exactness: D = 3/4 keeps everything rational — both terms are
    integer-DIV quotients in 1e-9 units (decimal(38) intermediates so
    the N1+ x N1+ x 1e9 product can't wrap at web vocab sizes), so the
    probability is exact integer arithmetic on both engines.

    Plan/scale: one bigram explode -> three census-scale groupBys
    (c12, per-w1, per-w2) + a broadcast 1-row type count; the rank
    window runs over the c12 >= 2 CENSUS, never the token stream."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("text"))
    toks = d.select(F.filter(
        F.split(F.lower("text"), "[^a-z]+"),
        lambda x: F.length(x) >= 2).alias("w")).filter(F.size("w") >= 2)
    bg = toks.select(F.explode(F.expr(
        "transform(sequence(1, size(w) - 1), "
        "i -> struct(w[i - 1] AS w1, w[i] AS w2))")).alias("p")
    ).select("p.w1", "p.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long")
                                     .alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"),
                               F.count(F.lit(1)).alias("n1p_w1"))
    cw2 = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_w2"))
    tt = c12.agg(F.count(F.lit(1)).alias("tt"))
    j = (c12.join(c1, "w1").join(cw2, "w2")
         .crossJoin(F.broadcast(tt)))
    # exact integer DIV in 1e-6 units (ppm); 3 * N1+ * N1+ * 1e6 stays
    # under long at ~5e4 distinct continuations per word — beyond that
    # (full web vocab) promote to decimal(38,0) like
    # embeddings_standardize
    term1 = F.expr("((4 * c12 - 3) * 1000000L) DIV (4 * c1)")
    term2 = F.expr("(3L * n1p_w1 * n1p_w2 * 1000000L) "
                   "DIV (4L * c1 * tt)")
    scored = (j.filter(F.col("c12") >= 2)
              .select("w1", "w2", "c12",
                      (term1 + term2).cast("long").alias("kn_ppm")))
    r = Window.orderBy(F.col("kn_ppm").desc(), "w1", "w2")
    return (scored.withColumn("rank", F.row_number().over(r))
            .filter(F.col("rank") <= 50)
            .select("w1", "w2", "c12", "kn_ppm", "rank"))


ORACLE_TEXT_KN_BIGRAM = """
WITH tok AS (
  SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> len(x) >= 2) AS w
  FROM documents WHERE text IS NOT NULL),
tw AS (SELECT w FROM tok WHERE len(w) >= 2),
bg AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM tw, unnest(range(1, len(w))) u(i)),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
              CAST(count(*) AS BIGINT) AS n1p_w1
       FROM c12 GROUP BY 1),
cw2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_w2
        FROM c12 GROUP BY 1),
tt AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM c12),
scored AS (
  SELECT c12.w1, c12.w2, c12.c12,
         CAST((4::HUGEINT * c12.c12 - 3) * 1000000
              // (4::HUGEINT * c1.c1)
              + (3::HUGEINT * c1.n1p_w1 * cw2.n1p_w2 * 1000000)
                // (4::HUGEINT * c1.c1 * tt.tt) AS BIGINT) AS kn_ppm
  FROM c12 JOIN c1 USING (w1) JOIN cw2 USING (w2) CROSS JOIN tt
  WHERE c12.c12 >= 2)
SELECT w1, w2, c12, kn_ppm, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY kn_ppm DESC, w1, w2) AS rank
  FROM scored)
WHERE rank <= 50
"""


def q_text_calibration_ece(spark, sf_dir):
    """Reliability table for the quality rubric (Guo et al., ICML 2017
    calibration methodology): treat score/100 as the rubric's
    'confidence' that a doc is good, bin into 10 confidence deciles,
    and compare each bin's mean confidence against its empirical
    accuracy on the independent length>=200 label (the same weak label
    text_quality_pr calibrates thresholds on). |conf - acc| per bin is
    the reliability-diagram gap whose n-weighted sum is ECE — the
    standard 'is the scorer over-confident' diagnostic run before
    trusting corpus_clean's gate at 100 TB.

    Exactness: confidence = score * 10000 ppm (integer), bins by
    integer DIV, per-bin means as exact integer DIV of integer sums —
    no floats anywhere.

    Plan/scale: one codegen scoring scan -> ONE partial agg to a
    10-row census."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    scored = d.select(
        TS.quality_score_expr(F.col("text")).alias("q"),
        (F.length("text") >= 200).cast("long").alias("label"))
    binned = scored.select(
        F.least(F.expr("q DIV 10"), F.lit(9)).cast("int").alias("bin"),
        (F.col("q") * 10000).cast("long").alias("conf_ppm"), "label")
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conf_ppm").alias("sum_conf"),
        F.sum("label").alias("n_pos"))
    return agg.select(
        "bin", "n",
        F.expr("sum_conf DIV n").cast("long").alias("mean_conf_ppm"),
        F.expr("(n_pos * 1000000) DIV n").cast("long").alias("acc_ppm"),
        F.abs(F.expr("sum_conf DIV n")
              - F.expr("(n_pos * 1000000) DIV n")).cast("long")
        .alias("gap_ppm"))


ORACLE_TEXT_CALIBRATION_ECE = f"""
WITH {_quality_cte("doc_id", "documents")},
b AS (
  SELECT least(qs.q // 10, 9) AS bin,
         CAST(qs.q * 10000 AS BIGINT) AS conf_ppm,
         CASE WHEN qm.n >= 200 THEN 1 ELSE 0 END AS label
  FROM qs JOIN qm USING (doc_id)
  WHERE qm.n IS NOT NULL),
agg AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(conf_ppm) AS BIGINT) AS sum_conf,
         CAST(sum(label) AS BIGINT) AS n_pos
  FROM b GROUP BY bin)
SELECT CAST(bin AS INT) AS bin, n,
       CAST(sum_conf // n AS BIGINT) AS mean_conf_ppm,
       CAST((n_pos * 1000000) // n AS BIGINT) AS acc_ppm,
       CAST(abs(sum_conf // n - (n_pos * 1000000) // n) AS BIGINT)
         AS gap_ppm
FROM agg
"""


def q_text_ttr_sttr(spark, sf_dir):
    """Standardized type-token ratio (Johnson 1944's STTR fix for TTR's
    length bias): per doc, tokens are cut into non-overlapping 50-token
    chunks (trailing partial chunk dropped), distinct types are counted
    per chunk, and the doc's lexical diversity is the mean chunk TTR —
    comparable ACROSS documents of different lengths, which raw TTR is
    not. The low-diversity tail is template/boilerplate text the
    repetition and novelty filters each see differently.

    Exactness: sttr_ppm = (sum of per-chunk distinct counts) * 1e6 DIV
    (n_chunks * 50) — all exact integers. Docs under 50 tokens drop out
    on both engines.

    Plan/scale: posexplode -> (doc, chunk) distinct-count agg ->
    per-doc agg; everything keys on (doc_id, chunk), so the shuffle is
    politeness-bucket sized — no giant keys, no windows."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    toks = d.select("doc_id", F.filter(
        F.split(F.lower("text"), "[^a-z]+"),
        lambda x: F.length(x) >= 2).alias("w"))
    pos = (toks.select("doc_id", F.posexplode("w").alias("pos", "tok"))
           .withColumn("chunk", F.expr("pos DIV 50"))
           .withColumn("n_tok", F.count(F.lit(1)).over(
               Window.partitionBy("doc_id")))
           .filter(F.col("chunk") < F.expr("n_tok DIV 50")))
    per_chunk = pos.groupBy("doc_id", "chunk").agg(
        F.countDistinct("tok").cast("long").alias("types"))
    return (per_chunk.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_chunks"),
                 F.sum("types").cast("long").alias("sum_types"))
            .select("doc_id", "n_chunks",
                    F.expr("(sum_types * 1000000) DIV (n_chunks * 50)")
                    .cast("long").alias("sttr_ppm")))


ORACLE_TEXT_TTR_STTR = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> len(x) >= 2) AS w
  FROM documents WHERE text IS NOT NULL),
pos AS (
  SELECT doc_id, i // 50 AS chunk, w[i + 1] AS tok,
         len(w) AS n_tok
  FROM toks, unnest(range(len(w))) u(i)
  WHERE i // 50 < len(w) // 50),
per_chunk AS (
  SELECT doc_id, chunk,
         CAST(count(DISTINCT tok) AS BIGINT) AS types
  FROM pos GROUP BY doc_id, chunk)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST((sum(types) * 1000000) // (count(*) * 50) AS BIGINT)
         AS sttr_ppm
FROM per_chunk GROUP BY doc_id
"""


def q_text_lexicon_triage(spark, sf_dir):
    """Policy-lexicon content triage — the text-side analogue of the
    reference's NudeNet image gate (M3, raw/parsers nudity model):
    token-EXACT matching of each document against a broadcastable
    policy term list (here a 3-term embedded lexicon; production
    broadcasts the full list exactly like the T9 dictionary), with a
    per-doc hit count, hit density, and a two-condition flag
    (absolute count OR density) — the cheap first-pass filter that
    routes documents to the expensive model.

    Exactness: token-exact `IN` matching over the split tokens (never
    substring — 'duplicate' can't hit 'dup'); density is exact integer
    DIV ppm on the whitespace token count.

    Plan/scale: zero-exchange pure map over the corpus (array filter
    in codegen) — fuses into the scan; the lexicon is a literal (a
    broadcast join for large lists, same plan shape as T9)."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()))
    toks = "split(lower(text), ' ')"
    hits = F.expr(f"size(filter({toks}, t -> t IN ('dup', 'slow', "
                  f"'spill')))").cast("long")
    n_tok = F.expr(f"size({toks})").cast("long")
    return (d.select("doc_id", hits.alias("n_hits"),
                     n_tok.alias("n_tokens"))
            .withColumn("density_ppm",
                        F.expr("n_hits * 1000000 DIV n_tokens")
                        .cast("long"))
            .withColumn("flagged",
                        ((F.col("n_hits") >= 3)
                         | (F.col("density_ppm") >= 40000)).cast("int")))


ORACLE_TEXT_LEXICON_TRIAGE = """
WITH d AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(lower(text), ' '),
              t -> t IN ('dup', 'slow', 'spill'))) AS BIGINT) AS n_hits,
         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL)
SELECT doc_id, n_hits, n_tokens,
       CAST(n_hits * 1000000 // n_tokens AS BIGINT) AS density_ppm,
       CAST(CASE WHEN n_hits >= 3
                  OR n_hits * 1000000 // n_tokens >= 40000
                 THEN 1 ELSE 0 END AS INT) AS flagged
FROM d
"""


def q_text_lm_heldout(spark, sf_dir):
    """HELD-OUT unigram-LM perplexity — the methodologically honest
    version of text_unigram_lm (scoring the training set flatters the
    model): the LM trains on the 80% split (doc_id % 5 != 0), scores
    the held-out 20% with add-0.5 smoothing over the train vocab
    (V+1 events — the unseen-token mass), and reports per-doc nll
    plus the OOV rate the in-corpus row can never see.

    Exactness: tf/V/T are exact integers on both engines; nll uses
    the module's round(avg, 4) convention; OOV ppm is integer DIV.

    Plan/scale: train vocab is one map-side-combinable groupBy, the
    scoring join broadcasts the Heaps-small vocab; the split predicate
    prunes at the scan."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    train = tok.filter(F.col("doc_id") % 5 != 0)
    test = tok.filter(F.col("doc_id") % 5 == 0)
    v = train.groupBy("tok").agg(F.count(F.lit(1)).cast("long")
                                 .alias("tf"))
    totals = v.agg(F.sum("tf").cast("long").alias("t_total"),
                   F.count(F.lit(1)).cast("long").alias("v_size"))
    scored = (test.join(F.broadcast(v), "tok", "left")
              .crossJoin(F.broadcast(totals))
              .withColumn("p", (F.coalesce("tf", F.lit(0).cast("long"))
                                + F.lit(0.5))
                          / (F.col("t_total")
                             + 0.5 * (F.col("v_size") + 1))))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 F.sum(F.col("tf").isNull().cast("int")).cast("long")
                 .alias("n_oov"),
                 F.round(F.avg(-F.log("p")), 4).alias("nll"))
            .withColumn("oov_ppm",
                        F.expr("n_oov * 1000000 DIV n_tokens")
                        .cast("long")))


ORACLE_TEXT_LM_HELDOUT = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL),
v AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE doc_id % 5 <> 0 GROUP BY tok),
tot AS (
  SELECT CAST(sum(tf) AS BIGINT) AS t_total,
         CAST(count(*) AS BIGINT) AS v_size FROM v),
sc AS (
  SELECT t.doc_id, v.tf,
         (coalesce(v.tf, 0) + 0.5)
         / (tot.t_total + 0.5 * (tot.v_size + 1)) AS p
  FROM tok t LEFT JOIN v USING (tok) CROSS JOIN tot
  WHERE t.doc_id % 5 = 0)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN tf IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       round(avg(-ln(p)), 4) AS nll,
       CAST(sum(CASE WHEN tf IS NULL THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS oov_ppm
FROM sc GROUP BY doc_id
"""


def q_text_script_detect(spark, sf_dir):
    """Unicode-SCRIPT census per document — the writing-system
    classifier that runs before any language model in a web-scale
    pipeline (langid over the wrong script is noise; CJK needs a
    different tokenizer; mixed-script is a spam/homograph signal):
    per-doc counts of Latin, Cyrillic, and Greek letters plus
    digits, the dominant script by count (ties break Latin >
    Cyrillic > Greek), and a mixed-script flag when two scripts
    both exceed 10% of letters.

    Fixture: a deterministic multi-script corpus derived from
    documents — doc_id%7==1 transliterates a/e/o to Cyrillic
    а/е/о, %7==2 transliterates a/e/o to Greek α/ε/ο, the rest
    stay ASCII (counts via literal-codepoint regexp ranges that
    parse identically under Java regex and RE2).

    Plan/scale: pure per-row codegen (replace + regexp strip +
    length) — no shuffle but the final tiny projection; fuses into
    the scan."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id", "text"))
    t = (F.when(F.col("doc_id") % 7 == 1,
                F.translate("text", "aeo", "аео"))
         .when(F.col("doc_id") % 7 == 2,
               F.translate("text", "aeo", "αεο"))
         .otherwise(F.col("text")))
    d = d.select("doc_id", t.alias("xt"))

    def n_of(pat):
        return (F.length("xt")
                - F.length(F.regexp_replace("xt", pat, ""))).cast("long")

    lat = n_of("[A-Za-z]")
    cyr = n_of("[Ѐ-ӿ]")
    grk = n_of("[Ͱ-Ͽ]")
    dig = n_of("[0-9]")
    d = d.select("doc_id", lat.alias("n_latin"), cyr.alias("n_cyrillic"),
                 grk.alias("n_greek"), dig.alias("n_digit"))
    letters = F.col("n_latin") + F.col("n_cyrillic") + F.col("n_greek")
    dom = (F.when((F.col("n_latin") >= F.col("n_cyrillic"))
                  & (F.col("n_latin") >= F.col("n_greek")), F.lit("latin"))
           .when(F.col("n_cyrillic") >= F.col("n_greek"), F.lit("cyrillic"))
           .otherwise(F.lit("greek")))
    n_big = ((F.col("n_latin") * 10 > letters).cast("int")
             + (F.col("n_cyrillic") * 10 > letters).cast("int")
             + (F.col("n_greek") * 10 > letters).cast("int"))
    return (d.withColumn("dominant", dom)
            .withColumn("is_mixed", (n_big >= 2).cast("int")))


ORACLE_TEXT_SCRIPT_DETECT = """
WITH x AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 1
              THEN translate(text, 'aeo', 'аео')
              WHEN doc_id % 7 = 2
              THEN translate(text, 'aeo', 'αεο')
              ELSE text END AS xt
  FROM documents WHERE text IS NOT NULL),
c AS (
  SELECT doc_id,
         CAST(length(xt) - length(regexp_replace(xt, '[A-Za-z]', '', 'g'))
              AS BIGINT) AS n_latin,
         CAST(length(xt) - length(regexp_replace(xt,
              '[Ѐ-ӿ]', '', 'g')) AS BIGINT) AS n_cyrillic,
         CAST(length(xt) - length(regexp_replace(xt,
              '[Ͱ-Ͽ]', '', 'g')) AS BIGINT) AS n_greek,
         CAST(length(xt) - length(regexp_replace(xt, '[0-9]', '', 'g'))
              AS BIGINT) AS n_digit
  FROM x)
SELECT doc_id, n_latin, n_cyrillic, n_greek, n_digit,
       CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_greek THEN 'latin'
            WHEN n_cyrillic >= n_greek THEN 'cyrillic'
            ELSE 'greek' END AS dominant,
       CAST(CASE WHEN
            (CASE WHEN n_latin * 10 > n_latin + n_cyrillic + n_greek
                  THEN 1 ELSE 0 END)
          + (CASE WHEN n_cyrillic * 10 > n_latin + n_cyrillic + n_greek
                  THEN 1 ELSE 0 END)
          + (CASE WHEN n_greek * 10 > n_latin + n_cyrillic + n_greek
                  THEN 1 ELSE 0 END) >= 2
            THEN 1 ELSE 0 END AS INT) AS is_mixed
FROM c
"""


def q_text_moss_pairs(spark, sf_dir):
    """MOSS-style WINNOWING overlap pairs (Schleimer et al., SIGMOD'03)
    — the plagiarism/partial-reuse detector the whole-doc dedup family
    misses: per doc, hash every 4-gram shingle, slide a window of 5
    consecutive gram hashes and keep each window's MINIMUM (the
    winnowing guarantee: any shared run of >= w+k-1 tokens shares a
    selected fingerprint), then pair documents sharing >= 3 DISTINCT
    selected fingerprints. Hot fingerprints (df > 40) are dropped
    before pairing — the same max_df fan-out guard as
    dedup_ngram_jaccard.

    Plan/scale: the window-min runs inside a per-doc window (partition
    by the high-cardinality doc key — no skew, no global window); the
    pairing is a bucketed self-equi-join on fingerprint with df-capped
    fan-out, never all-pairs."""
    c = (_corpus(spark, sf_dir)
         .select("doc_id", F.split(F.col("text"), " ").alias("w"))
         .filter(F.size("w") >= 9))
    grams = F.transform(
        F.sequence(F.lit(0), F.size("w") - 5),
        lambda i: F.substring(
            F.md5(F.array_join(F.slice(F.col("w"), i + 1, 4), " ")), 1, 12))
    g = (c.select("doc_id", grams.alias("grams"))
         .select("doc_id", F.size("grams").alias("m"),
                 F.posexplode("grams").alias("pos", "h")))
    wmin = Window.partitionBy("doc_id").orderBy("pos") \
        .rowsBetween(0, 4)
    sel = (g.withColumn("fp", F.min("h").over(wmin))
           .filter(F.col("pos") <= F.col("m") - 5)
           .select("doc_id", "fp").distinct())
    df_guard = (sel.groupBy("fp")
                .agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") <= 40))
    kept = sel.join(df_guard.select("fp"), "fp")
    pairs = (kept.alias("x").join(kept.alias("y"), "fp")
             .filter(F.col("x.doc_id") < F.col("y.doc_id"))
             .select(F.col("x.doc_id").alias("doc_a"),
                     F.col("y.doc_id").alias("doc_b"), "fp"))
    return (pairs.groupBy("doc_a", "doc_b")
            .agg(F.countDistinct("fp").cast("long").alias("n_shared"))
            .filter(F.col("n_shared") >= 3))


ORACLE_TEXT_MOSS_PAIRS = f"""
WITH {_CORPUS_SQL},
b AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM corpus
  WHERE len(string_split(text, ' ')) >= 9),
gl AS (
  SELECT doc_id, list_transform(range(len(w) - 4),
             i -> substr(md5(array_to_string(
                      w[CAST(i+1 AS INT):CAST(i+4 AS INT)], ' ')), 1, 12))
           AS grams
  FROM b),
g AS (
  SELECT doc_id, len(grams) AS m, unnest(grams) AS h,
         generate_subscripts(grams, 1) - 1 AS pos
  FROM gl),
sel AS (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id, pos, m,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
    FROM g) WHERE pos <= m - 5),
guard AS (
  SELECT fp FROM sel GROUP BY fp HAVING count(*) <= 40),
kept AS (
  SELECT s.doc_id, s.fp FROM sel s JOIN guard USING (fp))
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(count(DISTINCT x.fp) AS BIGINT) AS n_shared
FROM kept x JOIN kept y ON x.fp = y.fp AND x.doc_id < y.doc_id
GROUP BY x.doc_id, y.doc_id
HAVING count(DISTINCT x.fp) >= 3
"""


def q_text_invisible_chars(spark, sf_dir):
    """INVISIBLE-character census — the zero-width watermark /
    tracking-payload scrub a clean corpus needs (zero-width spaces
    and joiners fingerprint leaked documents, steganographic
    watermarks survive copy-paste, and soft hyphens break exact
    dedup silently): per doc, counts of ZWSP (U+200B), ZWNJ
    (U+200C), ZWJ (U+200D), and soft hyphen (U+00AD), the total
    invisible mass, the scrubbed length, and the watermark flag
    (>= 4 zero-width marks is a deliberate payload, not an
    artifact).

    Fixture: deterministic injection — every 4th doc gets ZWSPs
    after each 10th word, every 7th gets soft hyphens; injected
    via portable replace on both engines.

    Plan/scale: per-row replace + length codegen, no shuffle; the
    scrub itself is the same regexp_replace the census counts."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    zwsp, zwnj, zwj, shy = "​", "‌", "‍", "­"
    t = F.col("text")
    t = F.when(F.col("doc_id") % 4 == 0,
               F.regexp_replace(t, r"((?:\S+ ){10})", "$1" + zwsp)) \
        .otherwise(t)
    t = F.when(F.col("doc_id") % 7 == 0,
               F.regexp_replace(t, "scan ", "sc" + shy + "an ")) \
        .otherwise(t)
    d = d.select("doc_id", t.alias("xt"))

    def n_of(ch):
        return (F.length("xt")
                - F.length(F.regexp_replace("xt", ch, ""))).cast("long")

    inv = "[" + zwsp + zwnj + zwj + shy + "]"
    return (d.select(
        "doc_id",
        n_of(zwsp).alias("n_zwsp"), n_of(zwnj).alias("n_zwnj"),
        n_of(zwj).alias("n_zwj"), n_of(shy).alias("n_shy"),
        n_of(inv).alias("n_invisible"),
        F.length(F.regexp_replace("xt", inv, "")).cast("long")
        .alias("clean_len"))
        .withColumn("is_watermarked",
                    ((F.col("n_zwsp") + F.col("n_zwnj")
                      + F.col("n_zwj")) >= 4).cast("int")))


ORACLE_TEXT_INVISIBLE_CHARS = """
WITH x AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN replace(t1, 'scan ',
                   'sc' || chr(173) || 'an ')
              ELSE t1 END AS xt
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0
                THEN regexp_replace(text, '((?:\\S+ ){10})',
                                    '\\1' || chr(8203), 'g')
                ELSE text END AS t1
    FROM documents WHERE text IS NOT NULL))
SELECT doc_id,
       CAST(length(xt) - length(replace(xt, chr(8203), '')) AS BIGINT)
         AS n_zwsp,
       CAST(length(xt) - length(replace(xt, chr(8204), '')) AS BIGINT)
         AS n_zwnj,
       CAST(length(xt) - length(replace(xt, chr(8205), '')) AS BIGINT)
         AS n_zwj,
       CAST(length(xt) - length(replace(xt, chr(173), '')) AS BIGINT)
         AS n_shy,
       CAST(length(xt) - length(regexp_replace(xt,
            '[' || chr(8203) || chr(8204) || chr(8205) || chr(173) || ']',
            '', 'g')) AS BIGINT) AS n_invisible,
       CAST(length(regexp_replace(xt,
            '[' || chr(8203) || chr(8204) || chr(8205) || chr(173) || ']',
            '', 'g')) AS BIGINT) AS clean_len,
       CAST(CASE WHEN (length(xt) - length(replace(xt, chr(8203), '')))
                    + (length(xt) - length(replace(xt, chr(8204), '')))
                    + (length(xt) - length(replace(xt, chr(8205), '')))
                    >= 4 THEN 1 ELSE 0 END AS INT) AS is_watermarked
FROM x
"""


def q_text_fineweb_rules(spark, sf_dir):
    """FineWeb/RedPajama LINE-level quality rules — the filter family
    the C4 and Gopher rows don't cover (C4 is sentence-level, Gopher
    is symbol-ratio; FineWeb's strongest filters are line-structure):
    per doc, the fraction of lines ending in terminal punctuation
    (< 0.12 → junk), the duplicate-line fraction (> 0.30 → boiler),
    the bullet-line fraction (> 0.90 → list page), and short-line
    fraction, each in exact ppm, with the composed keep/drop verdict
    and the dominant drop reason.

    Fixture: docs are re-lined deterministically (12-word lines;
    every 3rd line gains a '.', every 5th a '- ' bullet, every 4th
    doc repeats its first line at the end) so every rule has both
    populations.

    Plan/scale: line synthesis + census are one explode + two
    groupBys partitioned by doc_id; verdicts are pure codegen."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    w = F.split(F.col("text"), " ")
    n_lines = F.greatest((F.ceil(F.size(w) / F.lit(12))).cast("int"),
                         F.lit(1))
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.concat(
            F.when((i + 1) % 5 == 0, F.lit("- ")).otherwise(F.lit("")),
            F.array_join(F.slice(w, i * 12 + 1, 12), " "),
            F.when((i + 1) % 3 == 0, F.lit(".")).otherwise(F.lit(""))))
    lines = F.when(F.col("doc_id") % 4 == 0,
                   F.concat(lines, F.slice(lines, 1, 1))) \
        .otherwise(lines)
    ex = d.select("doc_id", F.explode(lines).alias("line"))
    feat = ex.select(
        "doc_id",
        F.col("line").rlike(r"[.!?]$").cast("int").alias("punct"),
        F.col("line").startswith("- ").cast("int").alias("bullet"),
        (F.size(F.split("line", " ")) <= 3).cast("int").alias("short"),
        F.col("line").alias("line"))
    dup = (feat.groupBy("doc_id", "line")
           .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    dupc = (dup.groupBy("doc_id")
            .agg(F.sum("cnt").cast("long").alias("n_lines"),
                 F.sum(F.col("cnt") - 1).cast("long").alias("n_dup")))
    cen = (feat.groupBy("doc_id")
           .agg(F.sum("punct").cast("long").alias("n_punct"),
                F.sum("bullet").cast("long").alias("n_bullet"),
                F.sum("short").cast("long").alias("n_short")))
    j = cen.join(dupc, "doc_id")
    out = (j.withColumn("punct_ppm",
                        F.expr("n_punct * 1000000 DIV n_lines")
                        .cast("long"))
           .withColumn("dup_ppm",
                       F.expr("n_dup * 1000000 DIV n_lines")
                       .cast("long"))
           .withColumn("bullet_ppm",
                       F.expr("n_bullet * 1000000 DIV n_lines")
                       .cast("long"))
           .withColumn("short_ppm",
                       F.expr("n_short * 1000000 DIV n_lines")
                       .cast("long")))
    reason = (F.when(F.col("punct_ppm") < 120000, F.lit("low-punct"))
              .when(F.col("dup_ppm") > 300000, F.lit("dup-lines"))
              .when(F.col("bullet_ppm") > 900000, F.lit("bullet-page"))
              .otherwise(F.lit("keep")))
    return (out.withColumn("verdict", reason)
            .select("doc_id", "n_lines", "punct_ppm", "dup_ppm",
                    "bullet_ppm", "short_ppm", "verdict"))


ORACLE_TEXT_FINEWEB_RULES = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE text IS NOT NULL),
l0 AS (
  SELECT doc_id, list_transform(
      range(greatest(CAST(ceil(len(w) / 12.0) AS INT), 1)),
      i -> CASE WHEN (i + 1) % 5 = 0 THEN '- ' ELSE '' END
           || array_to_string(w[CAST(i*12+1 AS INT):CAST(i*12+12 AS INT)],
                              ' ')
           || CASE WHEN (i + 1) % 3 = 0 THEN '.' ELSE '' END) AS ls
  FROM base),
l1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN list_concat(ls, ls[1:1])
              ELSE ls END AS ls
  FROM l0),
ex AS (SELECT doc_id, unnest(ls) AS line FROM l1),
feat AS (
  SELECT doc_id, line,
         CASE WHEN regexp_matches(line, '[.!?]$') THEN 1 ELSE 0 END
           AS punct,
         CASE WHEN line LIKE '- %' THEN 1 ELSE 0 END AS bullet,
         CASE WHEN len(string_split(line, ' ')) <= 3 THEN 1 ELSE 0 END
           AS short
  FROM ex),
dup AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_lines,
         CAST(sum(cnt - 1) AS BIGINT) AS n_dup
  FROM (SELECT doc_id, line, CAST(count(*) AS BIGINT) AS cnt
        FROM feat GROUP BY doc_id, line)
  GROUP BY doc_id),
cen AS (
  SELECT doc_id, CAST(sum(punct) AS BIGINT) AS n_punct,
         CAST(sum(bullet) AS BIGINT) AS n_bullet,
         CAST(sum(short) AS BIGINT) AS n_short
  FROM feat GROUP BY doc_id),
j AS (
  SELECT c.doc_id, d.n_lines,
         CAST(c.n_punct * 1000000 // d.n_lines AS BIGINT) AS punct_ppm,
         CAST(d.n_dup * 1000000 // d.n_lines AS BIGINT) AS dup_ppm,
         CAST(c.n_bullet * 1000000 // d.n_lines AS BIGINT) AS bullet_ppm,
         CAST(c.n_short * 1000000 // d.n_lines AS BIGINT) AS short_ppm
  FROM cen c JOIN dup d USING (doc_id))
SELECT doc_id, n_lines, punct_ppm, dup_ppm, bullet_ppm, short_ppm,
       CASE WHEN punct_ppm < 120000 THEN 'low-punct'
            WHEN dup_ppm > 300000 THEN 'dup-lines'
            WHEN bullet_ppm > 900000 THEN 'bullet-page'
            ELSE 'keep' END AS verdict
FROM j
"""


def q_text_dialog_turns(spark, sf_dir):
    """DIALOG-turn structure census — the conversational-data
    profiler an instruction/chat corpus needs before formatting
    (turn balance and strict speaker alternation decide whether a
    page is a usable dialogue or a forum dump): docs are rendered
    as 'u<N>: ...' turn lines (deterministic 2-3 speaker scripts),
    then per doc: turn count, distinct speakers, mean turn length
    in exact centitokens, and the alternation ratio (consecutive
    turns with different speakers / transitions) in ppm — 10^6
    means a clean two-party dialogue.

    Plan/scale: turn synthesis is flatten/transform codegen; the
    census is one posexplode + per-doc window lag + one groupBy —
    the sessionize shuffle shape, partitioned by doc."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id", F.split(F.col("text"), " ").alias("w")))
    n_turns = F.greatest((F.ceil(F.size("w") / F.lit(9))).cast("int"),
                         F.lit(1))
    n_speakers = (F.col("doc_id") % 2 + 2).cast("int")
    turns = F.transform(
        F.sequence(F.lit(0), n_turns - 1),
        lambda i: F.struct(
            (i % n_speakers).cast("int").alias("speaker"),
            F.size(F.split(F.array_join(F.slice(F.col("w"), i * 9 + 1, 9),
                                        " "), " ")).cast("long")
            .alias("n_tok")))
    ex = d.select("doc_id", F.posexplode(turns).alias("pos", "t"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = ex.withColumn(
        "alt", (F.col("t.speaker") != F.lag("t.speaker").over(w))
        .cast("int"))
    return (flagged.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_turns"),
                 F.countDistinct("t.speaker").cast("long")
                 .alias("n_speakers"),
                 F.sum("t.n_tok").cast("long").alias("n_tokens"),
                 F.sum(F.coalesce("alt", F.lit(0))).cast("long")
                 .alias("n_alt"))
            .withColumn("mean_turn_centitok",
                        F.expr("n_tokens * 100 DIV n_turns")
                        .cast("long"))
            .withColumn("alternation_ppm",
                        F.when(F.col("n_turns") > 1,
                               F.expr("n_alt * 1000000 DIV "
                                      "(n_turns - 1)"))
                        .otherwise(F.lit(0)).cast("long")))


ORACLE_TEXT_DIALOG_TURNS = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE text IS NOT NULL),
tl AS (
  SELECT doc_id, (doc_id % 2 + 2) AS n_spk,
         list_transform(
             range(greatest(CAST(ceil(len(w) / 9.0) AS INT), 1)),
             i -> {'speaker': i % (doc_id % 2 + 2),
                   'n_tok': CAST(len(string_split(array_to_string(
                       w[CAST(i*9+1 AS INT):CAST(i*9+9 AS INT)], ' '),
                       ' ')) AS BIGINT)}) AS turns
  FROM base),
ex AS (
  SELECT doc_id, unnest(turns) AS t,
         generate_subscripts(turns, 1) - 1 AS pos
  FROM tl),
fl AS (
  SELECT doc_id, t.speaker AS speaker, t.n_tok AS n_tok,
         CASE WHEN t.speaker <> lag(t.speaker) OVER (
                  PARTITION BY doc_id ORDER BY pos) THEN 1 ELSE 0 END
           AS alt
  FROM ex),
cen AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_turns,
         CAST(count(DISTINCT speaker) AS BIGINT) AS n_speakers,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         CAST(sum(coalesce(alt, 0)) AS BIGINT) AS n_alt
  FROM fl GROUP BY doc_id)
SELECT doc_id, n_turns, n_speakers, n_tokens, n_alt,
       CAST(n_tokens * 100 // n_turns AS BIGINT) AS mean_turn_centitok,
       CAST(CASE WHEN n_turns > 1
                 THEN n_alt * 1000000 // (n_turns - 1)
                 ELSE 0 END AS BIGINT) AS alternation_ppm
FROM cen
"""


def q_text_html_entities(spark, sf_dir):
    """Residual HTML-ENTITY audit — the extraction-quality check a
    text pipeline runs after HTML-to-text (leftover &amp;/&#39;
    entities mean the extractor missed a decode pass, and entity
    mass correlates with broken markup): per doc, counts of named
    (&amp; &lt; &gt; &quot; &nbsp;), decimal (&#39;), and hex
    (&#x27;) entities, the decoded text for the three commonest,
    and the clean/dirty verdict.

    Fixture: entities injected deterministically (every 3rd doc
    gets '&amp;' between words, every 5th '&#39;', every 7th
    '&nbsp;') so all three classes exist.

    Plan/scale: per-row regexp codegen; the decode is the same
    regexp_replace cascade the cleaner applies — audited and
    applied in one pass, no shuffle."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    t = F.col("text")
    t = F.when(F.col("doc_id") % 3 == 0,
               F.regexp_replace(t, " and ", " &amp; ")).otherwise(t)
    t = F.when(F.col("doc_id") % 5 == 0,
               F.regexp_replace(t, " the ", " the&#39; ")).otherwise(t)
    t = F.when(F.col("doc_id") % 7 == 0,
               F.regexp_replace(t, " a ", " a&nbsp;")).otherwise(t)
    d = d.select("doc_id", t.alias("xt"))
    n_named = F.regexp_count("xt", F.lit("&(amp|lt|gt|quot|nbsp);")) \
        .cast("long")
    n_dec = F.regexp_count("xt", F.lit("&#[0-9]+;")).cast("long")
    n_hex = F.regexp_count("xt", F.lit("&#x[0-9a-fA-F]+;")).cast("long")
    decoded = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("xt", "&amp;", "&"),
            "&nbsp;", " "),
        "&#39;", "'")
    return (d.select("doc_id",
                     n_named.alias("n_named"), n_dec.alias("n_decimal"),
                     n_hex.alias("n_hex"),
                     F.length(decoded).cast("long").alias("decoded_len"))
            .withColumn("n_entities",
                        (F.col("n_named") + F.col("n_decimal")
                         + F.col("n_hex")).cast("long"))
            .withColumn("is_dirty",
                        (F.col("n_entities") > 0).cast("int")))


ORACLE_TEXT_HTML_ENTITIES = """
WITH x AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN replace(t2, ' a ', ' a&nbsp;') ELSE t2 END AS xt
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0
                THEN replace(t1, ' the ', ' the&#39; ') ELSE t1 END AS t2
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN replace(text, ' and ', ' &amp; ') ELSE text END
               AS t1
      FROM documents WHERE text IS NOT NULL)))
SELECT doc_id,
       CAST(len(regexp_extract_all(xt, '&(amp|lt|gt|quot|nbsp);'))
            AS BIGINT) AS n_named,
       CAST(len(regexp_extract_all(xt, '&#[0-9]+;')) AS BIGINT)
         AS n_decimal,
       CAST(len(regexp_extract_all(xt, '&#x[0-9a-fA-F]+;')) AS BIGINT)
         AS n_hex,
       CAST(length(replace(replace(replace(xt, '&amp;', '&'),
                                   '&nbsp;', ' '), '&#39;', ''''))
            AS BIGINT) AS decoded_len,
       CAST(len(regexp_extract_all(xt, '&(amp|lt|gt|quot|nbsp);'))
            + len(regexp_extract_all(xt, '&#[0-9]+;'))
            + len(regexp_extract_all(xt, '&#x[0-9a-fA-F]+;'))
            AS BIGINT) AS n_entities,
       CAST(CASE WHEN len(regexp_extract_all(xt, '&(amp|lt|gt|quot|nbsp);'))
                    + len(regexp_extract_all(xt, '&#[0-9]+;'))
                    + len(regexp_extract_all(xt, '&#x[0-9a-fA-F]+;')) > 0
                 THEN 1 ELSE 0 END AS INT) AS is_dirty
FROM x
"""


def q_text_date_extract(spark, sf_dir):
    """Document DATING by in-text year extraction — the freshness
    estimator a corpus runs when crawl metadata is missing or lies
    (page footers and citations carry years; the max plausible year
    in the text is the standard cheap document date): per doc, the
    count of 4-digit year tokens in [1990, 2029], the min and max
    year, the dating-confidence class (none / single / multi), and
    the corpus-age bucket the doc lands in for curriculum or decay
    weighting.

    Fixture: deterministic year injection — every doc gains
    'copyright <year>' with year = 1998 + doc_id % 28; every 3rd
    doc gains a second, earlier citation year.

    Plan/scale: regexp_extract_all + array codegen per row, one
    final projection — no shuffle."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    year1 = (F.col("doc_id") % 28 + 1998).cast("long")
    year2 = (F.col("doc_id") % 9 + 1991).cast("long")
    page = F.concat(
        F.col("text"), F.lit(" copyright "), year1.cast("string"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(" cited "), year2.cast("string")))
        .otherwise(F.lit("")))
    d = d.select("doc_id", page.alias("page"))
    years = F.expr(
        r"transform(regexp_extract_all(page, '(^| )((19|20)[0-9]{2})( |$)',"
        r" 2), x -> CAST(x AS BIGINT))")
    valid = F.filter(years, lambda y: (y >= 1990) & (y <= 2029))
    d = d.select("doc_id", valid.alias("ys"))
    conf = (F.when(F.size("ys") == 0, F.lit("none"))
            .when(F.size("ys") == 1, F.lit("single"))
            .otherwise(F.lit("multi")))
    mx = F.array_max("ys")
    bucket = (F.when(mx >= 2020, F.lit("recent"))
              .when(mx >= 2010, F.lit("modern"))
              .when(mx >= 2000, F.lit("old"))
              .otherwise(F.lit("ancient")))
    return (d.select("doc_id",
                     F.size("ys").cast("long").alias("n_years"),
                     F.array_min("ys").alias("min_year"),
                     mx.alias("max_year"),
                     conf.alias("confidence"),
                     F.when(F.size("ys") > 0, bucket)
                     .otherwise(F.lit("undated")).alias("age_bucket")))


ORACLE_TEXT_DATE_EXTRACT = """
WITH d AS (
  SELECT doc_id,
         text || ' copyright ' || (doc_id % 28 + 1998)
         || CASE WHEN doc_id % 3 = 0
                 THEN ' cited ' || (doc_id % 9 + 1991) ELSE '' END
           AS page
  FROM documents WHERE text IS NOT NULL),
y AS (
  SELECT doc_id,
         list_filter(list_transform(
             regexp_extract_all(page, '(^| )((19|20)[0-9]{2})( |$)', 2),
             x -> CAST(x AS BIGINT)),
             v -> v >= 1990 AND v <= 2029) AS ys
  FROM d)
SELECT doc_id, CAST(len(ys) AS BIGINT) AS n_years,
       list_min(ys) AS min_year, list_max(ys) AS max_year,
       CASE WHEN len(ys) = 0 THEN 'none'
            WHEN len(ys) = 1 THEN 'single'
            ELSE 'multi' END AS confidence,
       CASE WHEN len(ys) = 0 THEN 'undated'
            WHEN list_max(ys) >= 2020 THEN 'recent'
            WHEN list_max(ys) >= 2010 THEN 'modern'
            WHEN list_max(ys) >= 2000 THEN 'old'
            ELSE 'ancient' END AS age_bucket
FROM y
"""


def q_text_math_detect(spark, sf_dir):
    """MATH-content detection — the STEM-corpus router that pairs
    with text_code_detect (math-heavy pages want different
    tokenization, LaTeX-aware cleaning, and usually UP-weighting in
    a pretraining mix): per doc, the digit-token ratio, operator
    density (=+−*/^<>), equation-pattern count ('a = b' shapes and
    \\frac/\\sum LaTeX commands), all in exact ppm of tokens, and
    the math/mixed/prose verdict.

    Fixture: every 4th doc gains equation snippets ('x = 3 + 4'),
    every 6th a LaTeX fragment — deterministic injections over the
    prose corpus.

    Plan/scale: per-row regexp census, no shuffle; verdicts are the
    same CASE ladder the router applies inline."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    t = F.col("text")
    t = F.when(F.col("doc_id") % 4 == 0,
               F.concat(t, F.lit(" x = 3 + 4 y = x * 2 z = y - 1"))) \
        .otherwise(t)
    t = F.when(F.col("doc_id") % 6 == 0,
               F.concat(t, F.lit(" \\frac{a}{b} \\sum_{i=0} e^x"))) \
        .otherwise(t)
    d = d.select("doc_id", t.alias("xt"))
    n_tok = F.size(F.split("xt", " ")).cast("long")
    n_digit_tok = F.size(F.filter(F.split("xt", " "),
                                  lambda w: w.rlike("^[0-9]+$"))) \
        .cast("long")
    n_ops = F.regexp_count("xt", F.lit(r"[=+*/^]| - ")).cast("long")
    n_eq = F.regexp_count(
        "xt", F.lit(r"[a-z0-9}] = [a-z0-9\\]")).cast("long")
    n_latex = F.regexp_count("xt", F.lit(r"\\(frac|sum|int|sqrt)")) \
        .cast("long")
    cen = (d.select("doc_id", n_tok.alias("n_tokens"),
                    n_digit_tok.alias("n_digit_tokens"),
                    n_ops.alias("n_operators"),
                    n_eq.alias("n_equations"),
                    n_latex.alias("n_latex"))
           .withColumn("digit_ppm",
                       F.expr("n_digit_tokens * 1000000 DIV n_tokens")
                       .cast("long"))
           .withColumn("op_ppm",
                       F.expr("n_operators * 1000000 DIV n_tokens")
                       .cast("long")))
    verdict = (F.when((F.col("n_latex") > 0)
                      | (F.col("n_equations") >= 3), F.lit("math"))
               .when(F.col("n_equations") >= 1, F.lit("mixed"))
               .otherwise(F.lit("prose")))
    return cen.withColumn("verdict", verdict)


ORACLE_TEXT_MATH_DETECT = """
WITH x AS (
  SELECT doc_id,
         CASE WHEN doc_id % 6 = 0
              THEN t1 || ' \\frac{a}{b} \\sum_{i=0} e^x'
              ELSE t1 END AS xt
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0
                THEN text || ' x = 3 + 4 y = x * 2 z = y - 1'
                ELSE text END AS t1
    FROM documents WHERE text IS NOT NULL)),
c AS (
  SELECT doc_id,
         CAST(len(string_split(xt, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split(xt, ' '),
              w -> regexp_matches(w, '^[0-9]+$'))) AS BIGINT)
           AS n_digit_tokens,
         CAST(len(regexp_extract_all(xt, '[=+*/^]| - '))
              AS BIGINT) AS n_operators,
         CAST(len(regexp_extract_all(xt, '[a-z0-9}] = [a-z0-9\\\\]'))
              AS BIGINT) AS n_equations,
         CAST(len(regexp_extract_all(xt, '\\\\(frac|sum|int|sqrt)'))
              AS BIGINT) AS n_latex
  FROM x)
SELECT doc_id, n_tokens, n_digit_tokens, n_operators, n_equations,
       n_latex,
       CAST(n_digit_tokens * 1000000 // n_tokens AS BIGINT) AS digit_ppm,
       CAST(n_operators * 1000000 // n_tokens AS BIGINT) AS op_ppm,
       CASE WHEN n_latex > 0 OR n_equations >= 3 THEN 'math'
            WHEN n_equations >= 1 THEN 'mixed'
            ELSE 'prose' END AS verdict
FROM c
"""


def q_text_template_mine(spark, sf_dir):
    """Log/boilerplate TEMPLATE mining (Drain-style, one level) —
    the structure extractor for machine-generated text: lines that
    become identical once their variable slots (digit runs) are
    masked to '<N>' belong to one template; per template the census
    reports instance count, how many DISTINCT raw variants filled
    it, the slot count, and the template class (static: one
    variant; parametric: many variants through few slots). Mining
    templates first is how log corpora dedup 100:1 before any
    n-gram pass.

    Fixture: deterministic machine lines ('fetch <id> took <ms> ms'
    shapes) emitted with varying ids/latencies.

    Plan/scale: mask via one regexp_replace, census via ONE
    groupBy(template) with count + countDistinct — the template
    space is Heaps-tiny; raw lines shuffle once."""
    k = F.col("o_orderkey")
    line = (F.when(k % 4 == 0,
                   F.concat(F.lit("fetch "), k.cast("string"),
                            F.lit(" took "), (k % 900).cast("string"),
                            F.lit(" ms")))
            .when(k % 4 == 1,
                  F.concat(F.lit("retry "), (k % 5).cast("string"),
                           F.lit(" for host h"),
                           (k % 120).cast("string")))
            .when(k % 4 == 2,
                  F.concat(F.lit("parsed "), (k % 60).cast("string"),
                           F.lit(" links depth "),
                           (k % 3).cast("string")))
            .otherwise(F.lit("politeness sleep done")))
    d = _t(spark, sf_dir, "orders").select(line.alias("line"))
    tpl = F.regexp_replace("line", "[0-9]+", "<N>")
    t = d.withColumn("template", tpl)
    cen = (t.groupBy("template")
           .agg(F.count(F.lit(1)).cast("long").alias("n_instances"),
                F.countDistinct("line").cast("long").alias("n_variants")))
    n_slots = F.expr(
        "CAST((length(template) - "
        "length(replace(template, '<N>', 'xx'))) AS BIGINT)")
    return (cen.withColumn("n_slots", n_slots)
            .withColumn("template_class",
                        F.when(F.col("n_variants") == 1, F.lit("static"))
                        .otherwise(F.lit("parametric"))))


ORACLE_TEXT_TEMPLATE_MINE = """
WITH d AS (
  SELECT CASE WHEN o_orderkey % 4 = 0 THEN
              'fetch ' || o_orderkey || ' took ' || (o_orderkey % 900)
              || ' ms'
            WHEN o_orderkey % 4 = 1 THEN
              'retry ' || (o_orderkey % 5) || ' for host h'
              || (o_orderkey % 120)
            WHEN o_orderkey % 4 = 2 THEN
              'parsed ' || (o_orderkey % 60) || ' links depth '
              || (o_orderkey % 3)
            ELSE 'politeness sleep done' END AS line
  FROM orders),
t AS (
  SELECT line, regexp_replace(line, '[0-9]+', '<N>', 'g') AS template
  FROM d),
cen AS (
  SELECT template, CAST(count(*) AS BIGINT) AS n_instances,
         CAST(count(DISTINCT line) AS BIGINT) AS n_variants
  FROM t GROUP BY template)
SELECT template, n_instances, n_variants,
       CAST(length(template) - length(replace(template, '<N>', 'xx'))
            AS BIGINT) AS n_slots,
       CASE WHEN n_variants = 1 THEN 'static'
            ELSE 'parametric' END AS template_class
FROM cen
"""


def q_text_gazetteer_tag(spark, sf_dir):
    """GAZETTEER entity tagging — the no-model NER pass that covers
    most of what a crawl pipeline needs from entities (which places
    and orgs does this page mention?) at broadcast-join cost: a
    small curated gazetteer (term -> entity type) broadcasts against
    the exploded token stream; per doc the census reports mentions
    and DISTINCT entities per type plus the entity-density ppm the
    page-typer consumes. The reference's NER slot (M2) returns [] —
    this is the honest cheap upgrade that stays SQL.

    Fixture: gazetteer terms injected deterministically (every 3rd
    doc gains place names, every 5th org names).

    Plan/scale: explode + broadcast inner join (unmatched tokens
    never survive the join) + one per-doc census — the dictionary
    pattern text_lexicon_triage already proved at 10^10 tokens."""
    gaz = [("paris", "place"), ("tokyo", "place"), ("berlin", "place"),
           ("acme", "org"), ("globex", "org"), ("initech", "org")]
    gdf = spark.createDataFrame(gaz, ["term", "etype"])
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    t = F.col("text")
    t = F.when(F.col("doc_id") % 3 == 0,
               F.concat(t, F.lit(" paris tokyo paris"))).otherwise(t)
    t = F.when(F.col("doc_id") % 5 == 0,
               F.concat(t, F.lit(" acme globex"))).otherwise(t)
    tok = (d.select("doc_id", t.alias("xt"))
           .select("doc_id", F.explode(F.split("xt", " ")).alias("term"))
           .withColumn("n_tokens_marker", F.lit(1)))
    counts = (tok.groupBy("doc_id")
              .agg(F.count(F.lit(1)).cast("long").alias("n_tokens")))
    hits = (tok.join(F.broadcast(gdf), "term")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_mentions"),
                 F.countDistinct("term").cast("long")
                 .alias("n_entities"),
                 F.sum((F.col("etype") == "place").cast("int"))
                 .cast("long").alias("n_place"),
                 F.sum((F.col("etype") == "org").cast("int"))
                 .cast("long").alias("n_org")))
    return (counts.join(hits, "doc_id", "left")
            .na.fill(0, ["n_mentions", "n_entities", "n_place", "n_org"])
            .withColumn("density_ppm",
                        F.expr("n_mentions * 1000000 DIV n_tokens")
                        .cast("long")))


ORACLE_TEXT_GAZETTEER_TAG = """
WITH gaz(term, etype) AS (VALUES
  ('paris', 'place'), ('tokyo', 'place'), ('berlin', 'place'),
  ('acme', 'org'), ('globex', 'org'), ('initech', 'org')),
x AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN t1 || ' acme globex'
              ELSE t1 END AS xt
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN text || ' paris tokyo paris'
                ELSE text END AS t1
    FROM documents WHERE text IS NOT NULL)),
tok AS (
  SELECT doc_id, unnest(string_split(xt, ' ')) AS term FROM x),
counts AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
  FROM tok GROUP BY doc_id),
hits AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_mentions,
         CAST(count(DISTINCT term) AS BIGINT) AS n_entities,
         CAST(sum(CASE WHEN etype = 'place' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_place,
         CAST(sum(CASE WHEN etype = 'org' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_org
  FROM tok JOIN gaz USING (term) GROUP BY doc_id)
SELECT c.doc_id, c.n_tokens,
       CAST(coalesce(h.n_mentions, 0) AS BIGINT) AS n_mentions,
       CAST(coalesce(h.n_entities, 0) AS BIGINT) AS n_entities,
       CAST(coalesce(h.n_place, 0) AS BIGINT) AS n_place,
       CAST(coalesce(h.n_org, 0) AS BIGINT) AS n_org,
       CAST(coalesce(h.n_mentions, 0) * 1000000 // c.n_tokens
            AS BIGINT) AS density_ppm
FROM counts c LEFT JOIN hits h USING (doc_id)
"""


def q_text_llm_watermark(spark, sf_dir):
    """LLM-WATERMARK detection (Kirchenbauer et al., ICML'23) — a
    watermarking generator seeds a PRF with the previous token and
    samples the next token from the "green" half of the vocabulary;
    a detector recomputes membership per adjacent token pair and
    runs a one-proportion z-test against the p=1/2 null. Crawled
    text that scores z >= 2 is likely machine-generated — exactly
    the contamination a pre-training corpus wants to exclude. Per
    source: docs scored, pair/green-pair census, green ppm, docs
    flagged at z >= 2.0, and the worst doc's z (milli-units).

    PRF here is md5(prev || US || tok) top bit — the same keyed-
    hash shape as the paper's greenlist seed, computable in any
    engine. Natural text sits near 500000 ppm by construction.

    Plan/scale: one explode (linear in token count) + two census
    groupBys (doc, then source) — no joins, no shuffle wider than
    the doc census; z is per-row double math, floor-pinned."""
    toks = (_t(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull())
            .select("doc_id", "source", F.split("text", " ").alias("t"))
            .filter(F.size("t") >= 2))
    pairs = toks.select(
        "doc_id", "source",
        F.explode(F.expr(
            "transform(sequence(1, size(t) - 1), "
            "i -> struct(t[i-1] AS prev, t[i] AS tok))")).alias("p"))
    green = (F.substring(
        F.md5(F.concat(F.col("p.prev"), F.expr("chr(31)"),
                       F.col("p.tok"))), 1, 1)
        .isin(*"89abcdef"))
    per_doc = (pairs.groupBy("doc_id", "source")
               .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                    F.sum(green.cast("int")).cast("long").alias("greens")))
    z_milli = F.floor(
        F.lit(1000.0) * (2 * F.col("greens") - F.col("n_pairs"))
        / F.sqrt(F.col("n_pairs").cast("double"))).cast("long")
    staged = per_doc.withColumn("z_milli", z_milli)
    return (staged.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_pairs").cast("long").alias("pairs"),
                 F.sum("greens").cast("long").alias("green_pairs"),
                 F.sum((F.col("z_milli") >= 2000).cast("int")).cast("long")
                 .alias("flagged_docs"),
                 F.max("z_milli").cast("long").alias("max_z_milli"))
            .withColumn("green_ppm",
                        F.expr("green_pairs * 1000000 DIV pairs")
                        .cast("long")))


ORACLE_TEXT_LLM_WATERMARK = """
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t
  FROM documents
  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
idx AS (
  SELECT doc_id, source, t,
         unnest(range(2, len(t) + 1)) AS i
  FROM toks),
pd AS (
  SELECT doc_id, source,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN substr(md5(t[i - 1] || chr(31) || t[i]), 1, 1)
                        IN ('8','9','a','b','c','d','e','f')
                   THEN 1 ELSE 0 END) AS BIGINT) AS greens
  FROM idx GROUP BY doc_id, source),
z AS (
  SELECT *,
         CAST(floor(1000.0 * (2 * greens - n_pairs)
              / sqrt(CAST(n_pairs AS DOUBLE))) AS BIGINT) AS z_milli
  FROM pd)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_pairs) AS BIGINT) AS pairs,
       CAST(sum(greens) AS BIGINT) AS green_pairs,
       CAST(sum(CASE WHEN z_milli >= 2000 THEN 1 ELSE 0 END) AS BIGINT)
         AS flagged_docs,
       CAST(max(z_milli) AS BIGINT) AS max_z_milli,
       CAST(sum(greens) * 1000000 // sum(n_pairs) AS BIGINT) AS green_ppm
FROM z GROUP BY source
"""


def q_text_ai_slop(spark, sf_dir):
    """AI-SLOP lexicon screen — LLM-generated filler has a stable
    phrase signature ("delve", "tapestry", "it is important to
    note", ...); corpus curators screen crawl text for it because
    recursively training on model output degrades quality (the
    model-collapse loop). Per doc: slop-term hits per 1000 tokens
    and distinct slop terms; verdict slop when rate >= 5 per-mille
    AND >= 3 distinct terms (one natural "moreover" never flags).
    Per source: docs, slop docs, hit mass ppm, worst doc rate.

    Fixture: every 11th doc gets a slop paragraph appended — those
    flag; natural fixture text does not.

    Plan/scale: pure per-row string codegen (8 replace/contains
    passes) + one census groupBy(source) — one scan, no Python."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id", "source",
                 F.lower(F.when(F.col("doc_id") % 11 == 0,
                                F.concat(F.col("text"), F.lit(_SLOP_ADD)))
                         .otherwise(F.col("text"))).alias("s")))
    hits = F.lit(0)
    present = F.lit(0)
    for t in _SLOP_TERMS:
        hits = hits + F.expr(
            f"(length(s) - length(replace(s, '{t}', ''))) DIV {len(t)}")
        present = present + F.expr(
            f"CASE WHEN contains(s, '{t}') THEN 1 ELSE 0 END")
    staged = (d.withColumn("n_tokens",
                           F.size(F.split("s", " ")).cast("long"))
              .withColumn("hits", hits.cast("long"))
              .withColumn("n_terms", present.cast("long"))
              .withColumn("rate_pm",
                          F.expr("hits * 1000 DIV n_tokens").cast("long")))
    is_slop = (F.col("rate_pm") >= 5) & (F.col("n_terms") >= 3)
    return (staged.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum(is_slop.cast("int")).cast("long").alias("slop_docs"),
                 F.sum("hits").cast("long").alias("hits"),
                 F.sum("n_tokens").cast("long").alias("tokens"),
                 F.max("rate_pm").cast("long").alias("max_rate_pm"))
            .withColumn("hits_ppm",
                        F.expr("hits * 1000000 DIV tokens").cast("long")))

ORACLE_TEXT_AI_SLOP = f"""
WITH d AS (
  SELECT doc_id, source,
         lower(CASE WHEN doc_id % 11 = 0 THEN text || '{_SLOP_ADD}'
                    ELSE text END) AS s
  FROM documents WHERE text IS NOT NULL),
st AS (
  SELECT source,
         CAST(len(string_split(s, ' ')) AS BIGINT) AS n_tokens,
         CAST({_OCC_SQL} AS BIGINT) AS hits,
         CAST({_PRES_SQL} AS BIGINT) AS n_terms
  FROM d),
r AS (
  SELECT *, CAST(hits * 1000 // n_tokens AS BIGINT) AS rate_pm FROM st)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN rate_pm >= 5 AND n_terms >= 3
                THEN 1 ELSE 0 END) AS BIGINT) AS slop_docs,
       CAST(sum(hits) AS BIGINT) AS hits,
       CAST(sum(n_tokens) AS BIGINT) AS tokens,
       CAST(max(rate_pm) AS BIGINT) AS max_rate_pm,
       CAST(sum(hits) * 1000000 // sum(n_tokens) AS BIGINT) AS hits_ppm
FROM r GROUP BY source
"""


def q_text_citation_extract(spark, sf_dir):
    """CITATION extraction — scholarly/standards references (DOI,
    arXiv id, RFC number) mined from crawl text: the signal that
    routes a page into the academic/technical corpus slice and the
    edge set for a citation graph. Per source: docs, docs citing,
    per-kind mention counts, and the citing-docs ppm.

    Fixture: every 7th doc gets two DOIs + an arXiv id + an RFC;
    every 7th+3 doc gets one arXiv id + one RFC.

    Plan/scale: three regexp_extract_all passes per row (linear,
    codegen) + one census groupBy(source) — the patterns are
    anchored token shapes identical under Java regex and RE2."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id", "source",
                 F.when(F.col("doc_id") % 7 == 0,
                        F.concat(F.col("text"), F.lit(_CITE_ADD_A)))
                 .when(F.col("doc_id") % 7 == 3,
                       F.concat(F.col("text"), F.lit(_CITE_ADD_B)))
                 .otherwise(F.col("text")).alias("s")))
    n_doi = F.size(F.expr(
        r"regexp_extract_all(s, 'doi:10\\.[0-9]{4}/[a-z0-9.]+', 0)"))
    n_arxiv = F.size(F.expr(
        r"regexp_extract_all(s, 'arXiv:[0-9]{4}\\.[0-9]{4,5}', 0)"))
    n_rfc = F.size(F.expr(
        r"regexp_extract_all(s, 'rfc [0-9]{3,4}', 0)"))
    staged = (d.withColumn("n_doi", n_doi.cast("long"))
              .withColumn("n_arxiv", n_arxiv.cast("long"))
              .withColumn("n_rfc", n_rfc.cast("long")))
    cites = (F.col("n_doi") + F.col("n_arxiv") + F.col("n_rfc")) > 0
    return (staged.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum(cites.cast("int")).cast("long")
                 .alias("citing_docs"),
                 F.sum("n_doi").cast("long").alias("doi_mentions"),
                 F.sum("n_arxiv").cast("long").alias("arxiv_mentions"),
                 F.sum("n_rfc").cast("long").alias("rfc_mentions"))
            .withColumn("citing_ppm",
                        F.expr("citing_docs * 1000000 DIV n_docs")
                        .cast("long")))


ORACLE_TEXT_CITATION_EXTRACT = f"""
WITH d AS (
  SELECT source,
         CASE WHEN doc_id % 7 = 0 THEN text || '{_CITE_ADD_A}'
              WHEN doc_id % 7 = 3 THEN text || '{_CITE_ADD_B}'
              ELSE text END AS s
  FROM documents WHERE text IS NOT NULL),
st AS (
  SELECT source,
         CAST(len(regexp_extract_all(s,
              'doi:10\\.[0-9]{{4}}/[a-z0-9.]+')) AS BIGINT) AS n_doi,
         CAST(len(regexp_extract_all(s,
              'arXiv:[0-9]{{4}}\\.[0-9]{{4,5}}')) AS BIGINT) AS n_arxiv,
         CAST(len(regexp_extract_all(s,
              'rfc [0-9]{{3,4}}')) AS BIGINT) AS n_rfc
  FROM d)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_doi + n_arxiv + n_rfc > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS citing_docs,
       CAST(sum(n_doi) AS BIGINT) AS doi_mentions,
       CAST(sum(n_arxiv) AS BIGINT) AS arxiv_mentions,
       CAST(sum(n_rfc) AS BIGINT) AS rfc_mentions,
       CAST(sum(CASE WHEN n_doi + n_arxiv + n_rfc > 0
                THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
         AS citing_ppm
FROM st GROUP BY source
"""


def q_text_ocr_artifacts(spark, sf_dir):
    """OCR-ARTIFACT census — scanned-document text carries a stable
    damage signature: stray single-character tokens (broken words)
    and digit-letter fusions (o->0, l->1 misreads). A corpus
    curator gates OCR-heavy sources because the noise poisons
    tokenizers. Per doc: single-char tokens (minus real words
    'a'/'i'), letter-digit fused tokens, score per-mille, verdict
    at >= 30 per-mille; per source: docs, flagged docs, token and
    artifact mass, artifact ppm.

    Fixture: every 13th doc is deterministically damaged in-query
    (' the ' -> ' t he ', all 'o' -> '0') — those flag.

    Plan/scale: one explode over tokens (linear) + two census
    groupBys; per-token flags are codegen string ops."""
    dmg = F.replace(
        F.replace(F.col("text"), F.lit(" the "), F.lit(" t he ")),
        F.lit("o"), F.lit("0"))
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id", "source",
                 F.lower(F.when(F.col("doc_id") % 13 == 0, dmg)
                         .otherwise(F.col("text"))).alias("s")))
    tok = d.select("doc_id", "source",
                   F.explode(F.split("s", " ")).alias("t"))
    single = ((F.length("t") == 1) & ~F.col("t").isin("a", "i"))
    mixed = F.col("t").rlike("[a-z][0-9]|[0-9][a-z]")
    per_doc = (tok.groupBy("doc_id", "source")
               .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                    F.sum(single.cast("int")).cast("long")
                    .alias("n_single"),
                    F.sum(mixed.cast("int")).cast("long")
                    .alias("n_mixed")))
    score = F.expr("(n_single + n_mixed) * 1000 DIV n_tokens")
    staged = per_doc.withColumn("score_pm", score.cast("long"))
    return (staged.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum((F.col("score_pm") >= 30).cast("int"))
                 .cast("long").alias("flagged_docs"),
                 F.sum("n_tokens").cast("long").alias("tokens"),
                 F.sum(F.col("n_single") + F.col("n_mixed"))
                 .cast("long").alias("artifacts"),
                 F.max("score_pm").cast("long").alias("max_score_pm"))
            .withColumn("artifact_ppm",
                        F.expr("artifacts * 1000000 DIV tokens")
                        .cast("long")))


ORACLE_TEXT_OCR_ARTIFACTS = """
WITH d AS (
  SELECT doc_id, source,
         lower(CASE WHEN doc_id % 13 = 0
                    THEN replace(replace(text, ' the ', ' t he '),
                                 'o', '0')
                    ELSE text END) AS s
  FROM documents WHERE text IS NOT NULL),
tok AS (
  SELECT doc_id, source, unnest(string_split(s, ' ')) AS t FROM d),
pd AS (
  SELECT doc_id, source,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN length(t) = 1 AND t NOT IN ('a', 'i')
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_single,
         CAST(sum(CASE WHEN regexp_matches(t, '[a-z][0-9]|[0-9][a-z]')
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed
  FROM tok GROUP BY doc_id, source),
sc AS (
  SELECT *, CAST((n_single + n_mixed) * 1000 // n_tokens AS BIGINT)
              AS score_pm
  FROM pd)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN score_pm >= 30 THEN 1 ELSE 0 END) AS BIGINT)
         AS flagged_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens,
       CAST(sum(n_single + n_mixed) AS BIGINT) AS artifacts,
       CAST(max(score_pm) AS BIGINT) AS max_score_pm,
       CAST(sum(n_single + n_mixed) * 1000000 // sum(n_tokens)
            AS BIGINT) AS artifact_ppm
FROM sc GROUP BY source
"""


def q_text_markdown_structure(spark, sf_dir):
    """MARKDOWN-STRUCTURE census — structured docs (headings, list
    items, code fences) are worth more per token to an instruction
    corpus than flat prose, and the packer treats fenced code
    blocks as atomic. Per doc over its lines: heading / list /
    fence counts and a structure flag; per source: docs,
    structured docs, per-kind line totals, structured ppm.

    Fixture: every 5th doc gets a markdown preamble (2 headings,
    2 list items, 1 fenced block) prepended.

    Plan/scale: one explode over lines + two census groupBys;
    line-class flags are startswith codegen."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id", "source",
                 F.when(F.col("doc_id") % 5 == 0,
                        F.concat(F.lit(_MD_HEADER), F.col("text")))
                 .otherwise(F.col("text")).alias("s")))
    ln = d.select("doc_id", "source",
                  F.explode(F.split("s", "\n")).alias("l"))
    head = F.col("l").startswith("#")
    item = F.col("l").startswith("- ")
    fence = F.col("l").startswith("```")
    per_doc = (ln.groupBy("doc_id", "source")
               .agg(F.count(F.lit(1)).cast("long").alias("n_lines"),
                    F.sum(head.cast("int")).cast("long")
                    .alias("n_headings"),
                    F.sum(item.cast("int")).cast("long").alias("n_items"),
                    F.sum(fence.cast("int")).cast("long")
                    .alias("n_fences")))
    structured = ((F.col("n_headings") > 0)
                  | (F.col("n_items") > 0) | (F.col("n_fences") > 0))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum(structured.cast("int")).cast("long")
                 .alias("structured_docs"),
                 F.sum("n_lines").cast("long").alias("lines"),
                 F.sum("n_headings").cast("long").alias("headings"),
                 F.sum("n_items").cast("long").alias("list_items"),
                 F.sum("n_fences").cast("long").alias("code_fences"))
            .withColumn("structured_ppm",
                        F.expr("structured_docs * 1000000 DIV n_docs")
                        .cast("long")))


ORACLE_TEXT_MARKDOWN_STRUCTURE = """
WITH d AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 5 = 0
              THEN '# Title' || chr(10) || '## Section' || chr(10)
                   || '- item one' || chr(10) || '- item two'
                   || chr(10) || '```' || chr(10) || 'code line'
                   || chr(10) || '```' || chr(10) || text
              ELSE text END AS s
  FROM documents WHERE text IS NOT NULL),
ln AS (
  SELECT doc_id, source,
         unnest(string_split(s, chr(10))) AS l
  FROM d),
pd AS (
  SELECT doc_id, source,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN l LIKE '#%' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_headings,
         CAST(sum(CASE WHEN l LIKE '- %' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_items,
         CAST(sum(CASE WHEN l LIKE '```%' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_fences
  FROM ln GROUP BY doc_id, source)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_headings > 0 OR n_items > 0
                      OR n_fences > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS structured_docs,
       CAST(sum(n_lines) AS BIGINT) AS lines,
       CAST(sum(n_headings) AS BIGINT) AS headings,
       CAST(sum(n_items) AS BIGINT) AS list_items,
       CAST(sum(n_fences) AS BIGINT) AS code_fences,
       CAST(sum(CASE WHEN n_headings > 0 OR n_items > 0
                      OR n_fences > 0 THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS structured_ppm
FROM pd GROUP BY source
"""


def q_text_luhn_pii(spark, sf_dir):
    """LUHN-validated PAN detection — the PII screen that separates
    real payment-card numbers from arbitrary 16-digit ids (order
    numbers, tracking codes): a 16-digit candidate is only a card
    if its ISO/IEC 7812 Luhn mod-10 checksum holds, which cuts the
    false-positive rate 10x and is what DLP scanners actually ship.
    Per doc: candidates found, Luhn-valid count, Luhn-fail count,
    the has_pii flag, and the redaction bill in chars.

    Fixture: every 6th doc gets a valid test PAN (4111...1111),
    every doc_id%10==7 an invalid one (...1112 — fails Luhn),
    every doc_id%15==5 a second valid brand (5555...4444); the
    detector must separate them BY CHECKSUM, not by injection rule.

    Plan/scale: regexp_extract_all + a 16-step higher-order
    aggregate per candidate — row-local codegen, zero shuffle."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id",
                 F.concat(
                     "text",
                     F.when(F.col("doc_id") % 6 == 0,
                            F.lit(" card 4111111111111111 on file"))
                     .otherwise(F.lit("")),
                     F.when(F.col("doc_id") % 10 == 7,
                            F.lit(" ref 4111111111111112 code"))
                     .otherwise(F.lit("")),
                     F.when(F.col("doc_id") % 15 == 5,
                            F.lit(" acct 5555555555554444 ok"))
                     .otherwise(F.lit(""))).alias("xt")))
    c = d.select("doc_id",
                 F.regexp_extract_all(
                     "xt", F.lit(r"\b[0-9]{16}\b"), 0).alias("cands"))
    m = c.select("doc_id", F.size("cands").cast("long")
                 .alias("n_candidates"),
                 F.expr(_LUHN_EXPR_SPARK).alias("mods"))
    return (m.select(
        "doc_id", "n_candidates",
        F.expr("size(filter(mods, x -> x = 0))").cast("long")
        .alias("n_valid_pan"))
        .withColumn("n_luhn_fail",
                    (F.col("n_candidates") - F.col("n_valid_pan"))
                    .cast("long"))
        .withColumn("has_pii", (F.col("n_valid_pan") > 0).cast("int"))
        .withColumn("redact_chars",
                    (F.col("n_valid_pan") * 16).cast("long")))


ORACLE_TEXT_LUHN_PII = r"""
WITH d AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 6 = 0
                 THEN ' card 4111111111111111 on file' ELSE '' END
         || CASE WHEN doc_id % 10 = 7
                 THEN ' ref 4111111111111112 code' ELSE '' END
         || CASE WHEN doc_id % 15 = 5
                 THEN ' acct 5555555555554444 ok' ELSE '' END AS xt
  FROM documents WHERE text IS NOT NULL),
c AS (SELECT doc_id,
             regexp_extract_all(xt, '\b[0-9]{16}\b') AS cands
      FROM d),
m AS (SELECT doc_id, len(cands) AS n_candidates,
             list_transform(cands, s -> list_sum(
               list_transform(generate_series(0, 15), i ->
                 CASE WHEN i % 2 = 1 THEN
                   CASE WHEN (ascii(s[16-i]) - 48) * 2 > 9
                        THEN (ascii(s[16-i]) - 48) * 2 - 9
                        ELSE (ascii(s[16-i]) - 48) * 2 END
                 ELSE ascii(s[16-i]) - 48 END)) % 10) AS mods
      FROM c)
SELECT doc_id, CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(len(list_filter(mods, x -> x = 0)) AS BIGINT)
         AS n_valid_pan,
       CAST(n_candidates - len(list_filter(mods, x -> x = 0))
            AS BIGINT) AS n_luhn_fail,
       CAST(CASE WHEN len(list_filter(mods, x -> x = 0)) > 0
                 THEN 1 ELSE 0 END AS INT) AS has_pii,
       CAST(len(list_filter(mods, x -> x = 0)) * 16 AS BIGINT)
         AS redact_chars
FROM m
"""


def q_text_unicode_nfc(spark, sf_dir):
    """Unicode NFC-normalization audit — combining-mark sequences
    (e + U+0301) and their precomposed twins (U+00E9) are
    byte-different but render identically, which silently breaks
    exact dedup, tokenizer vocab hits, and hash-based URL-seen
    checks (UAX #15 is why every serious corpus normalizes to NFC
    on ingest). Per doc: combining-mark count, raw vs NFC length
    (over the fixture's closed accent alphabet — production swaps
    in a full NFC kernel at the same seam), and the changed flag.

    Fixture: every 5th doc gets decomposed accents injected, every
    7th the precomposed twins — the pair exact dedup would miss.

    Plan/scale: per-row regexp + replace codegen, zero shuffle."""
    comb_acute, comb_grave = "́", "̀"
    e_acute, a_grave = "é", "à"
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id",
                 F.when(F.col("doc_id") % 5 == 0,
                        F.concat("text",
                                 F.lit(" cafe" + comb_acute
                                       + " a" + comb_grave
                                       + " la carte")))
                 .when(F.col("doc_id") % 7 == 0,
                       F.concat("text", F.lit(" caf" + e_acute + " "
                                              + a_grave + " la carte")))
                 .otherwise(F.col("text")).alias("xt")))
    marks = "[̀-ͯ]"
    n_comb = (F.length("xt")
              - F.length(F.regexp_replace("xt", marks, "")))
    nfc = F.replace(F.replace(F.col("xt"),
                              F.lit("e" + comb_acute), F.lit(e_acute)),
                    F.lit("a" + comb_grave), F.lit(a_grave))
    out = (d.select("doc_id",
                    n_comb.cast("long").alias("n_combining"),
                    F.length("xt").cast("long").alias("len_raw"),
                    F.length(nfc).cast("long").alias("len_nfc")))
    return out.withColumn("changed",
                          (F.col("len_nfc") != F.col("len_raw"))
                          .cast("int"))


ORACLE_TEXT_UNICODE_NFC = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
                THEN text || ' cafe' || chr(769) || ' a' || chr(768)
                     || ' la carte'
              WHEN doc_id % 7 = 0
                THEN text || ' caf' || chr(233) || ' ' || chr(224)
                     || ' la carte'
              ELSE text END AS xt
  FROM documents WHERE text IS NOT NULL),
x AS (
  SELECT doc_id,
         CAST(length(xt)
              - length(regexp_replace(xt, '[\\x{0300}-\\x{036F}]', '',
                                      'g')) AS BIGINT) AS n_combining,
         CAST(length(xt) AS BIGINT) AS len_raw,
         CAST(length(replace(replace(xt, 'e' || chr(769), chr(233)),
                             'a' || chr(768), chr(224))) AS BIGINT)
           AS len_nfc
  FROM d)
SELECT doc_id, n_combining, len_raw, len_nfc,
       CAST(CASE WHEN len_nfc <> len_raw THEN 1 ELSE 0 END AS INT)
         AS changed
FROM x
"""


def q_text_gibberish(spark, sf_dir):
    """GIBBERISH / keyboard-mash detection — spam and
    machine-generated filler that passes entropy and length gates
    still betrays itself phonotactically: natural language keeps
    vowels near 35-45% of letters and consonant runs short, while
    'asdfghjkl' has zero vowels and an 8-long consonant run (the
    signal text_char_entropy cannot see: mash has NORMAL character
    entropy). Per doc: letter/vowel census, vowel ppm, the longest
    consonant run, consonant-only tokens (>= 5 letters), and the
    2-of-3 gibberish vote.

    Fixture: every 8th doc gets keyboard-mash tokens appended.

    Plan/scale: regexp codegen per row, zero shuffle."""
    cons = "[bcdfghjklmnpqrstvwxyz]"
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id",
                 F.lower(F.when(F.col("doc_id") % 8 == 0,
                                F.concat("text",
                                         F.lit(" asdfghjkl qwrtypsdfg"
                                               " zxcvbnmm")))
                         .otherwise(F.col("text"))).alias("lt")))
    letters = F.length(F.regexp_replace("lt", "[^a-z]", ""))
    vowels = (F.length("lt")
              - F.length(F.regexp_replace("lt", "[aeiou]", "")))
    runs = F.expr(f"coalesce(array_max(transform("
                  f"regexp_extract_all(lt, '{cons}+', 0), "
                  f"s -> length(s))), 0)")
    mash = F.expr(rf"size(regexp_extract_all(lt, "
                  rf"'\\b{cons}{{5,}}\\b', 0))")
    out = (d.select("doc_id",
                    letters.cast("long").alias("n_letters"),
                    vowels.cast("long").alias("n_vowels"),
                    runs.cast("long").alias("max_cons_run"),
                    mash.cast("long").alias("n_mash_tokens"))
           .withColumn("vowel_ppm",
                       F.expr("CASE WHEN n_letters > 0 THEN "
                              "n_vowels * 1000000 DIV n_letters "
                              "ELSE 0 END").cast("long")))
    votes = ((F.col("vowel_ppm") < 250000).cast("int")
             + (F.col("max_cons_run") >= 6).cast("int")
             + (F.col("n_mash_tokens") >= 2).cast("int"))
    return out.withColumn("is_gibberish", (votes >= 2).cast("int"))


ORACLE_TEXT_GIBBERISH = r"""
WITH d AS (
  SELECT doc_id,
         lower(CASE WHEN doc_id % 8 = 0
               THEN text || ' asdfghjkl qwrtypsdfg zxcvbnmm'
               ELSE text END) AS lt
  FROM documents WHERE text IS NOT NULL),
x AS (
  SELECT doc_id,
         CAST(len(regexp_replace(lt, '[^a-z]', '', 'g')) AS BIGINT)
           AS n_letters,
         CAST(len(lt) - len(regexp_replace(lt, '[aeiou]', '', 'g'))
              AS BIGINT) AS n_vowels,
         CAST(coalesce(list_max(list_transform(
              regexp_extract_all(lt, '[bcdfghjklmnpqrstvwxyz]+'),
              s -> len(s))), 0) AS BIGINT) AS max_cons_run,
         CAST(len(regexp_extract_all(lt,
              '\b[bcdfghjklmnpqrstvwxyz]{5,}\b')) AS BIGINT)
           AS n_mash_tokens
  FROM d),
v AS (
  SELECT *,
         CAST(CASE WHEN n_letters > 0
                   THEN n_vowels * 1000000 // n_letters
                   ELSE 0 END AS BIGINT) AS vowel_ppm
  FROM x)
SELECT doc_id, n_letters, n_vowels, max_cons_run, n_mash_tokens,
       vowel_ppm,
       CAST(CASE WHEN (CASE WHEN vowel_ppm < 250000 THEN 1 ELSE 0 END
                 + CASE WHEN max_cons_run >= 6 THEN 1 ELSE 0 END
                 + CASE WHEN n_mash_tokens >= 2 THEN 1 ELSE 0 END)
                 >= 2 THEN 1 ELSE 0 END AS INT) AS is_gibberish
FROM v
"""


def q_text_sentence_burstiness(spark, sf_dir):
    """Sentence-length BURSTINESS — the third classic machine-text
    signal next to the lexicon screen (text_ai_slop) and the
    watermark z-test (text_llm_watermark): human prose mixes short
    and long sentences (high dispersion), generated/templated text
    is metronomic. Per doc over '.'-split sentences: count, mean
    length in milli-chars, the dispersion index Var/mean in exact
    milli units (var_scaled * 1000 / (n * sum_len)), and the
    uniformity flag (dispersion < 500 milli over >= 4 sentences).

    Fixture: every 9th doc is replaced by eight identically-sized
    sentences — dispersion exactly 0.

    Plan/scale: per-row split + two higher-order folds, zero
    shuffle."""
    uni = ("this sentence has exactly seven words ok. " * 8).strip()
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id",
                 F.when(F.col("doc_id") % 9 == 0, F.lit(uni))
                 .otherwise(F.col("text")).alias("xt")))
    lens = ("filter(transform(split(xt, '\\\\.'), "
            "s -> length(trim(s))), v -> v > 0)")
    t = d.select(
        "doc_id",
        F.expr(f"size({lens})").cast("long").alias("n_sentences"),
        F.expr(f"aggregate({lens}, CAST(0 AS BIGINT), "
               "(acc, v) -> acc + v)").cast("long").alias("s1"),
        F.expr(f"aggregate({lens}, CAST(0 AS BIGINT), "
               "(acc, v) -> acc + CAST(v AS BIGINT) * v)")
        .cast("long").alias("s2"))
    out = (t.filter(F.col("n_sentences") > 0)
           .withColumn("mean_len_milli",
                       F.expr("s1 * 1000 DIV n_sentences").cast("long"))
           .withColumn("dispersion_milli",
                       F.expr("(n_sentences * s2 - s1 * s1) * 1000 "
                              "DIV (n_sentences * s1)").cast("long")))
    return (out.select("doc_id", "n_sentences", "mean_len_milli",
                       "dispersion_milli")
            .withColumn("is_uniform",
                        ((F.col("dispersion_milli") < 500)
                         & (F.col("n_sentences") >= 4)).cast("int")))


ORACLE_TEXT_SENTENCE_BURSTINESS = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 9 = 0 THEN
           trim(repeat('this sentence has exactly seven words ok. ',
                       8))
         ELSE text END AS xt
  FROM documents WHERE text IS NOT NULL),
l AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(xt, '.'),
                     s -> len(trim(s))), v -> v > 0) AS lens
  FROM d),
t AS (
  SELECT doc_id, CAST(len(lens) AS BIGINT) AS n_sentences,
         CAST(coalesce(list_sum(lens), 0) AS BIGINT) AS s1,
         CAST(coalesce(list_sum(list_transform(lens,
              v -> CAST(v AS BIGINT) * v)), 0) AS BIGINT) AS s2
  FROM l)
SELECT doc_id, n_sentences,
       CAST(s1 * 1000 // n_sentences AS BIGINT) AS mean_len_milli,
       CAST((n_sentences * s2 - s1 * s1) * 1000
            // (n_sentences * s1) AS BIGINT) AS dispersion_milli,
       CAST(CASE WHEN (n_sentences * s2 - s1 * s1) * 1000
                      // (n_sentences * s1) < 500
                  AND n_sentences >= 4
                 THEN 1 ELSE 0 END AS INT) AS is_uniform
FROM t WHERE n_sentences > 0
"""


def q_text_ks_two_sample(spark, sf_dir):
    """Two-sample KOLMOGOROV-SMIRNOV test between document-length
    distributions — the exact distribution-shift test behind
    "did this crawl round change what we collect?": unlike the
    binned KL monitor (corpus_drift_kl), KS needs no bin choice
    and its D statistic is an exact rational D_int/(n1*n2), so the
    REJECT decision is computed in pure integer arithmetic on both
    engines: D > c(a)*sqrt((n1+n2)/(n1*n2)) with c(0.05) = 1.358
    iff D_int^2 * 10^6 > 1844164 * (n1+n2) * n1 * n2 (decimal/
    HUGEINT — no float ever enters the decision).

    Pairs: 'ab' = even vs odd doc_ids (same distribution — the
    null holds at every SF) and 'ac' = even vs odd shifted +50%
    (rejected at every SF).

    Plan/scale: per-pair groupBy(value) census then ONE window
    cumsum over distinct values — the shuffle carries (pair,
    value, counts), never documents; max-diff agg closes it."""
    docs = (_t(spark, sf_dir, "documents")
            .select("doc_id", F.col("n_chars").cast("long").alias("v")))
    even = docs.filter(F.col("doc_id") % 2 == 0).select("v")
    odd = docs.filter(F.col("doc_id") % 2 == 1).select("v")
    shifted = odd.select((F.col("v") + (F.col("v") / 2)
                          .cast("long")).alias("v"))

    def _side(df, pair, grp):
        return df.select(F.lit(pair).alias("pair"),
                         F.lit(grp).alias("grp"), "v")

    allrows = (_side(even, "ab", 1).unionByName(_side(odd, "ab", 2))
               .unionByName(_side(even, "ac", 1))
               .unionByName(_side(shifted, "ac", 2)))
    census = (allrows.groupBy("pair", "v")
              .agg(F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
                   .alias("c1"),
                   F.sum(F.when(F.col("grp") == 2, 1).otherwise(0))
                   .alias("c2")))
    wcum = (Window.partitionBy("pair").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = (Window.partitionBy("pair")
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    diffed = (census
              .withColumn("cum1", F.sum("c1").over(wcum))
              .withColumn("cum2", F.sum("c2").over(wcum))
              .withColumn("n1", F.sum("c1").over(wall))
              .withColumn("n2", F.sum("c2").over(wall)))
    agg = (diffed.groupBy("pair")
           .agg(F.max(F.abs(F.col("cum1") * F.col("n2")
                            - F.col("cum2") * F.col("n1")))
                .cast("long").alias("d_int"),
                F.max("n1").cast("long").alias("n1"),
                F.max("n2").cast("long").alias("n2")))
    dec = F.col("d_int").cast("decimal(38,0)")
    n1d = F.col("n1").cast("decimal(38,0)")
    n2d = F.col("n2").cast("decimal(38,0)")
    reject = (dec * dec * F.lit(1000000).cast("decimal(38,0)")
              > F.lit(1844164).cast("decimal(38,0)")
              * (n1d + n2d) * n1d * n2d)
    return (agg.select(
        "pair", "n1", "n2", "d_int",
        (F.floor(F.col("d_int") * 1000000.0
                 / (F.col("n1") * F.col("n2")) + 0.5) / 1000000.0)
        .alias("d_stat"),
        reject.cast("int").alias("reject")))


ORACLE_TEXT_KS_TWO_SAMPLE = """
WITH docs AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS v
              FROM documents),
sides AS (
  SELECT 'ab' AS pair, 1 AS grp, v FROM docs WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'ab', 2, v FROM docs WHERE doc_id % 2 = 1
  UNION ALL
  SELECT 'ac', 1, v FROM docs WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'ac', 2, v + v // 2 FROM docs WHERE doc_id % 2 = 1),
census AS (
  SELECT pair, v,
         SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS c2
  FROM sides GROUP BY pair, v),
cum AS (
  SELECT pair, v,
         SUM(c1) OVER (PARTITION BY pair ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum1,
         SUM(c2) OVER (PARTITION BY pair ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum2,
         SUM(c1) OVER (PARTITION BY pair) AS n1,
         SUM(c2) OVER (PARTITION BY pair) AS n2
  FROM census),
agg AS (
  SELECT pair,
         CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_int,
         CAST(MAX(n1) AS BIGINT) AS n1,
         CAST(MAX(n2) AS BIGINT) AS n2
  FROM cum GROUP BY pair)
SELECT pair, n1, n2, d_int,
       floor(CAST(d_int AS DOUBLE) * 1000000.0
             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) + 0.5)
         / 1000000.0 AS d_stat,
       CAST(CASE WHEN CAST(d_int AS HUGEINT) * CAST(d_int AS HUGEINT)
                      * 1000000
                 > CAST(1844164 AS HUGEINT) * (n1 + n2) * n1 * n2
            THEN 1 ELSE 0 END AS INT) AS reject
FROM agg
"""


def q_text_bm25_ndcg(spark, sf_dir):
    """NDCG@1..10 curve of the BM25 ranking (Jarvelin & Kekalainen
    2002) — the retrieval-QUALITY eval the ranking rows lack: graded
    relevance = number of distinct query terms the doc matches (1-3,
    computed from the same candidate table, independent of the score
    ordering), DCG discounts by log2(pos+1), IDCG re-ranks the SAME
    relevance grades ideally (rel DESC, doc_id ASC), and ndcg@k for
    every prefix k=1..10 is the running ratio. Per-position gains are
    quantized to 1e-6 integer units BEFORE the cumulative sums so the
    curve is exact integer arithmetic; the final ratio is 4-dp
    floor-rounded through DOUBLE on both engines.

    Plan/scale: reuses _bm25_ranked (one token shuffle + broadcast
    stats); actual and ideal top-10 are two TakeOrdereds joined on
    position — a 10-row table, so the eval itself costs nothing at any
    corpus size."""
    ranked = _bm25_ranked(spark, sf_dir)
    act = (ranked.filter(F.col("rank") <= 10)
           .select(F.col("rank").alias("pos"), "doc_id",
                   F.col("n_terms").alias("rel")))
    wi = Window.orderBy(F.desc("n_terms"), F.asc("doc_id"))
    ideal = (ranked.withColumn("pos", F.row_number().over(wi))
             .filter(F.col("pos") <= 10)
             .select("pos", F.col("n_terms").alias("ideal_rel")))

    def gain_u(rel):
        return F.round(rel * 1e6 / F.log2(F.col("pos") + 1)).cast("long")

    joined = (act.join(ideal, "pos")
              .withColumn("gain_u", gain_u(F.col("rel")))
              .withColumn("ideal_gain_u", gain_u(F.col("ideal_rel"))))
    wcum = (Window.orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (joined
            .withColumn("dcg_u", F.sum("gain_u").over(wcum))
            .withColumn("idcg_u", F.sum("ideal_gain_u").over(wcum))
            .select("pos", "doc_id", "rel", "gain_u", "dcg_u", "idcg_u",
                    (F.floor(F.col("dcg_u").cast("double") * 1e4
                             / F.col("idcg_u") + 0.5) / 1e4)
                    .alias("ndcg")))


ORACLE_TEXT_BM25_NDCG = f"""
WITH {_BM25_RANKED_SQL},
act AS (
  SELECT CAST(rank AS INT) AS pos, doc_id, n_terms AS rel
  FROM bm25_ranked WHERE rank <= 10),
ideal AS (
  SELECT CAST(row_number() OVER (ORDER BY n_terms DESC, doc_id ASC)
              AS INT) AS pos,
         n_terms AS ideal_rel
  FROM bm25_ranked),
j AS (
  SELECT act.pos, act.doc_id, act.rel,
         CAST(round(act.rel * 1000000.0 / log2(act.pos + 1))
              AS BIGINT) AS gain_u,
         CAST(round(ideal.ideal_rel * 1000000.0 / log2(ideal.pos + 1))
              AS BIGINT) AS ideal_gain_u
  FROM act JOIN ideal USING (pos)),
c AS (
  SELECT *,
         SUM(gain_u) OVER (ORDER BY pos ROWS UNBOUNDED PRECEDING)
           AS dcg_u,
         SUM(ideal_gain_u) OVER (ORDER BY pos ROWS UNBOUNDED PRECEDING)
           AS idcg_u
  FROM j)
SELECT pos, doc_id, rel, gain_u,
       CAST(dcg_u AS BIGINT) AS dcg_u, CAST(idcg_u AS BIGINT) AS idcg_u,
       floor(CAST(dcg_u AS DOUBLE) * 10000.0 / idcg_u + 0.5) / 10000.0
         AS ndcg
FROM c
"""


def q_text_quality_isotonic(spark, sf_dir):
    """Isotonic (PAV) calibration of the quality rubric — the
    monotone-regression step a threshold-picker runs AFTER
    text_quality_pr's sweep: bucket docs by score decile, measure the
    empirical P(label | bucket) (label = length >= 200, the same
    independent signal quality_pr grades against), and fit the
    monotone-nondecreasing rate via the minimax identity
    fitted[i] = max_{j<=i} min_{k>=i} mean(j..k). Interval means are
    floor-quantized to exact ppm (BIGINT division) BEFORE the
    min/max lattice, so the fit is pure integer arithmetic and
    cross-engine exact; the fitted curve is monotone by construction
    (j-range grows, k-range shrinks as i advances).

    Plan/scale: one scan scores and buckets every doc, one <=11-row
    census groupBy — the O(B^3) minimax runs on the census table
    (B <= 11, ~1.3k interval rows), so calibration costs nothing at
    any corpus size."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    scored = d.select(
        (TS.quality_score_expr(F.col("text")) / 10).cast("int").alias("b"),
        (F.length("text") >= 200).cast("long").alias("label"))
    census = (scored.groupBy("b")
              .agg(F.count("*").cast("long").alias("n"),
                   F.sum("label").cast("long").alias("pos")))
    j = census.select(F.col("b").alias("jb"))
    k = census.select(F.col("b").alias("kb"))
    # interval means m(j,k) over contiguous bucket ranges [jb, kb]:
    # sums via a cumulative join (bucket table is tiny, a triangle
    # join is fine and engine-portable)
    mid = census.select(F.col("b").alias("mb"), F.col("n").alias("mn"),
                        F.col("pos").alias("mp"))
    iv = (j.join(k, F.col("jb") <= F.col("kb"))
          .join(mid, (F.col("mb") >= F.col("jb"))
                & (F.col("mb") <= F.col("kb")))
          .groupBy("jb", "kb")
          .agg(F.expr("sum(mp) * 1000000 DIV sum(mn)").alias("m_ppm")))
    i_ = census.select(F.col("b").alias("ib"))
    fitted = (iv.join(i_, (F.col("jb") <= F.col("ib"))
                      & (F.col("kb") >= F.col("ib")))
              .groupBy("ib", "jb").agg(F.min("m_ppm").alias("inner"))
              .groupBy("ib").agg(F.max("inner").alias("iso_ppm")))
    return (census.join(fitted, census.b == fitted.ib)
            .select(F.col("b").alias("bucket"), "n", "pos",
                    F.expr("pos * 1000000 DIV n").alias("raw_ppm"),
                    "iso_ppm"))


ORACLE_TEXT_QUALITY_ISOTONIC = f"""
WITH {_quality_cte("doc_id", "documents")},
scored AS (
  SELECT CAST(qs.q // 10 AS INT) AS b,
         CASE WHEN qm.n >= 200 THEN 1 ELSE 0 END AS label
  FROM qs JOIN qm ON qm.doc_id = qs.doc_id
  WHERE qm.n IS NOT NULL),
census AS (
  SELECT b, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(label) AS BIGINT) AS pos
  FROM scored GROUP BY b),
iv AS (
  SELECT j.b AS jb, k.b AS kb,
         CAST(sum(m.pos) * 1000000 // sum(m.n) AS BIGINT) AS m_ppm
  FROM census j JOIN census k ON j.b <= k.b
  JOIN census m ON m.b BETWEEN j.b AND k.b
  GROUP BY j.b, k.b),
fitted AS (
  SELECT ib, CAST(max(inner_m) AS BIGINT) AS iso_ppm FROM (
    SELECT i.b AS ib, iv.jb, min(iv.m_ppm) AS inner_m
    FROM iv JOIN census i ON iv.jb <= i.b AND iv.kb >= i.b
    GROUP BY i.b, iv.jb)
  GROUP BY ib)
SELECT c.b AS bucket, c.n, c.pos,
       CAST(c.pos * 1000000 // c.n AS BIGINT) AS raw_ppm, f.iso_ppm
FROM census c JOIN fitted f ON c.b = f.ib
"""


def q_text_jsonld_extract(spark, sf_dir):
    """JSON-LD structured-data extraction — the schema.org metadata a
    crawler mines for entity/product/article enrichment: pull the
    <script type="application/ld+json"> payload out of a synthetic
    HTML wrapper (regexp span extraction), parse it with the engine's
    JSON parser (get_json_object; malformed blocks — every 13th doc is
    torn mid-object — surface as NULL type, the PERMISSIVE contract
    jsonl_ingest established), and report the per-@type census with
    recovered wordCount sums and the torn-block count. The oracle
    re-parses the SAME payloads with DuckDB's JSON engine, so the
    value hash proves the two JSON parsers agree on both the data AND
    what is unrecoverable.

    Plan/scale: regexp + one JSON parse per doc, all JVM; one tiny
    census agg. Torn blocks cost a failed parse, never a task."""
    i = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    typ = (F.when(i % 3 == 0, F.lit("Article"))
           .when(i % 3 == 1, F.lit("Product"))
           .otherwise(F.lit("NewsArticle")))
    payload_full = F.concat(
        F.lit('{"@context":"https://schema.org","@type":"'), typ,
        F.lit('","name":"doc '), i.cast("string"),
        F.lit('","wordCount":'), F.col("n_chars").cast("string"),
        F.lit("}"))
    payload = F.when(
        i % 13 == 0,
        F.expr("substring(payload_full, 1, length(payload_full) - 7)")
    ).otherwise(F.col("payload_full"))
    html = F.concat(F.lit('<html><head><script type="application/ld+json">'),
                    F.col("payload"),
                    F.lit("</script></head><body>x</body></html>"))
    blocks = (d.withColumn("payload_full", payload_full)
              .withColumn("payload", payload)
              .select("doc_id", html.alias("html"))
              .withColumn(
                  "block",
                  F.regexp_extract(
                      "html",
                      '<script type="application/ld\\+json">(.*?)</script>',
                      1)))
    parsed = blocks.select(
        "doc_id",
        F.get_json_object("block", "$['@type']").alias("jtype"),
        F.get_json_object("block", "$.wordCount").cast("long")
        .alias("wc"))
    return (parsed
            .withColumn("jtype", F.coalesce("jtype", F.lit("_torn")))
            .groupBy("jtype")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.coalesce("wc", F.lit(0))).cast("long")
                 .alias("sum_wc"),
                 F.min("doc_id").cast("long").alias("min_doc"),
                 F.max("doc_id").cast("long").alias("max_doc")))


ORACLE_TEXT_JSONLD_EXTRACT = """
WITH d AS (
  SELECT doc_id, n_chars,
         CASE WHEN doc_id % 3 = 0 THEN 'Article'
              WHEN doc_id % 3 = 1 THEN 'Product'
              ELSE 'NewsArticle' END AS typ
  FROM documents WHERE text IS NOT NULL),
pl AS (
  SELECT doc_id,
         '{"@context":"https://schema.org","@type":"' || typ ||
         '","name":"doc ' || doc_id || '","wordCount":' || n_chars
         || '}' AS payload_full
  FROM d),
blocks AS (
  SELECT doc_id,
         regexp_extract(
           '<html><head><script type="application/ld+json">' ||
           CASE WHEN doc_id % 13 = 0
                THEN substr(payload_full, 1, length(payload_full) - 7)
                ELSE payload_full END ||
           '</script></head><body>x</body></html>',
           '<script type="application/ld\\+json">(.*?)</script>', 1)
           AS block
  FROM pl),
parsed AS (
  SELECT doc_id,
         CASE WHEN json_valid(block)
              THEN json_extract_string(block, '$."@type"') END AS jtype,
         CASE WHEN json_valid(block)
              THEN CAST(json_extract(block, '$.wordCount') AS BIGINT)
              END AS wc
  FROM blocks)
SELECT COALESCE(jtype, '_torn') AS jtype,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(COALESCE(wc, 0)) AS BIGINT) AS sum_wc,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM parsed GROUP BY COALESCE(jtype, '_torn')
"""


def q_text_table_extract(spark, sf_dir):
    """HTML TABLE extraction to (row, col, cell) facts — the
    structured-data mining pass table-heavy corpora need (the T7
    span parser surfaces tables as text; this recovers the grid):
    deterministic fixture tables (1 header row + 2..4 data rows, 3
    columns, messy per-cell attributes on every 2nd doc) are parsed
    by row split + regexp cell extraction in pure codegen; output
    one fact per cell with header flag. Both engines build and parse
    the same markup, so the hash proves the extraction grammar
    (attribute-tolerant tag match, th/td distinction, ordinal
    recovery).

    Plan/scale: split + regexp_extract_all per doc, bounded explode
    (<= 15 cells/doc), zero shuffles."""
    did = F.col("doc_id")
    d = (_t(spark, sf_dir, "documents").select("doc_id")
         .filter(did % 4 == 1))
    attr = F.when(did % 2 == 0, F.lit(' class="z"')).otherwise(F.lit(""))
    hdr = F.concat(F.lit("<tr><th>name</th><th"), attr,
                   F.lit(">count</th><th>note</th></tr>"))
    n_rows = (did % 3 + 2).cast("int")
    body = F.concat_ws("", F.transform(
        F.sequence(F.lit(1), n_rows),
        lambda r: F.concat(
            F.lit("<tr><td"), attr, F.lit(">item"),
            (did + r).cast("string"),
            F.lit("</td><td>"), ((did * 7 + r * 3) % 100).cast("string"),
            F.lit("</td><td>n"), r.cast("string"),
            F.lit("</td></tr>"))))
    html = F.concat(F.lit("<div><table>"), hdr, body,
                    F.lit("</table></div>"))
    rows = (d.withColumn("html", html)
            .select("doc_id",
                    F.posexplode(F.expr(
                        "filter(split(regexp_extract(html, "
                        "'<table>(.*?)</table>', 1), '</tr>'), "
                        "x -> x != '')")).alias("row_idx", "rowhtml")))
    cells = rows.select(
        "doc_id", F.col("row_idx").cast("int").alias("row_idx"),
        F.col("rowhtml"),
        F.posexplode(F.expr(
            "regexp_extract_all(rowhtml || '</tr>', "
            "'<t[dh][^>]*>([^<]*)</t[dh]>', 1)"))
        .alias("col_idx", "cell"))
    hdr_flag = F.col("rowhtml").contains("<th")
    return (cells
            .select("doc_id", "row_idx",
                    F.col("col_idx").cast("int").alias("col_idx"),
                    "cell", hdr_flag.cast("int").alias("is_header")))


ORACLE_TEXT_TABLE_EXTRACT = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN ' class="z"' ELSE '' END AS attr,
         CAST(doc_id % 3 + 2 AS INT) AS n_rows
  FROM documents WHERE doc_id % 4 = 1),
built AS (
  SELECT doc_id,
         '<tr><th>name</th><th' || attr ||
         '>count</th><th>note</th></tr>' ||
         list_aggr(list_transform(range(1, n_rows + 1), r ->
           '<tr><td' || attr || '>item' || (doc_id + r) ||
           '</td><td>' || ((doc_id * 7 + r * 3) % 100) ||
           '</td><td>n' || r || '</td></tr>'), 'string_agg', '')
           AS inner_html
  FROM d),
rows_ AS (
  SELECT doc_id, CAST(t.i AS INT) AS row_idx,
         parts[t.i + 1] AS rowhtml
  FROM (SELECT doc_id,
               list_filter(string_split(inner_html, '</tr>'),
                           x -> x <> '') AS parts
        FROM built),
       UNNEST(range(len(parts))) t(i)),
cells AS (
  SELECT doc_id, row_idx, CAST(t.i AS INT) AS col_idx,
         cs[t.i + 1] AS cell,
         CASE WHEN rowhtml LIKE '%<th%' THEN 1 ELSE 0 END AS is_header
  FROM (SELECT doc_id, row_idx, rowhtml,
               regexp_extract_all(rowhtml || '</tr>',
                 '<t[dh][^>]*>([^<]*)</t[dh]>', 1) AS cs
        FROM rows_),
       UNNEST(range(len(cs))) t(i))
SELECT doc_id, row_idx, col_idx, cell, CAST(is_header AS INT) AS is_header
FROM cells
"""


def q_text_rouge_pairs(spark, sf_dir):
    """ROUGE-1/ROUGE-2 recall between each document and its synthetic
    twin — the CLIPPED-count n-gram overlap family (Lin 2004) that
    summarization eval and decontamination-forensics both run; the
    clipping (min of the two term counts, a MULTISET intersection) is
    exactly what Jaccard rows don't measure — a candidate repeating
    one reference word 50x gains nothing: per (ref = original doc,
    cand = twin at id+100000) pair, unigram and bigram clipped match
    counts and recall in exact ppm.

    Byte-identical twins (ref%10 in {0,5} after the twin's own %5
    test) must land at exactly 1,000,000 ppm on both orders — a
    built-in calibration check.

    Plan/scale: tokenize in the array domain, explode ONLY into the
    (doc, term) partial agg, equi-join ref x cand counts on
    (pair, term), sum least() — never a cross join; both n-gram
    orders share the scan."""
    corpus = _corpus(spark, sf_dir)
    toks = F.expr("filter(split(lower(text), ' '), x -> x <> '')")
    bigr = F.expr(
        "if(size(filter(split(lower(text), ' '), x -> x <> '')) < 2, "
        "array(), transform(sequence(1, size(filter(split(lower(text),"
        " ' '), x -> x <> '')) - 1), i -> concat("
        "element_at(filter(split(lower(text), ' '), x -> x <> ''), i),"
        " ' ', element_at(filter(split(lower(text), ' '), "
        "x -> x <> ''), i + 1))))")
    base = corpus.select("doc_id", toks.alias("toks"),
                         bigr.alias("bigr"))

    def counts(col):
        return (base.select("doc_id", F.explode(col).alias("g"))
                .groupBy("doc_id", "g")
                .agg(F.count("*").alias("c")))

    out = None
    for col, tag in (("toks", "r1"), ("bigr", "r2")):
        cnt = counts(F.col(col))
        ref = (cnt.filter(F.col("doc_id") < 100000)
               .filter(F.col("doc_id") % 2 == 0)
               .select(F.col("doc_id").alias("pair"), "g",
                       F.col("c").alias("rc")))
        cand = (cnt.filter(F.col("doc_id") >= 100000)
                .select((F.col("doc_id") - 100000).alias("pair"), "g",
                        F.col("c").alias("cc")))
        j = (ref.join(cand, ["pair", "g"], "left")
             .groupBy("pair")
             .agg(F.sum("rc").cast("long").alias(f"{tag}_ref"),
                  F.sum(F.least("rc", F.coalesce("cc", F.lit(0))))
                  .cast("long").alias(f"{tag}_clip")))
        out = j if out is None else out.join(j, "pair")
    return (out
            .withColumn("r1_recall_ppm",
                        F.expr("(r1_clip * 1000000) div r1_ref"))
            .withColumn("r2_recall_ppm",
                        F.expr("(r2_clip * 1000000) div r2_ref"))
            .withColumnRenamed("pair", "doc_id"))


ORACLE_TEXT_ROUGE_PAIRS = f"""
WITH {_CORPUS_SQL},
base AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '')
           AS toks
  FROM corpus),
grams AS (
  SELECT doc_id, 1 AS o, unnest(toks) AS g FROM base
  UNION ALL
  SELECT doc_id, 2 AS o,
         unnest(list_transform(range(1, len(toks)),
           i -> toks[CAST(i AS INT)] || ' '
                || toks[CAST(i + 1 AS INT)])) AS g
  FROM base),
cnt AS (
  SELECT doc_id, o, g, count(*) AS c FROM grams GROUP BY ALL),
joined AS (
  SELECT r.doc_id AS pair, r.o,
         sum(r.c) AS ref_n,
         sum(least(r.c, COALESCE(c2.c, 0))) AS clip_n
  FROM cnt r
  LEFT JOIN cnt c2 ON c2.doc_id = r.doc_id + 100000
                  AND c2.g = r.g AND c2.o = r.o
  WHERE r.doc_id < 100000 AND r.doc_id % 2 = 0
  GROUP BY r.doc_id, r.o)
SELECT a.pair AS doc_id,
       CAST(a.ref_n AS BIGINT) AS r1_ref,
       CAST(a.clip_n AS BIGINT) AS r1_clip,
       CAST(b.ref_n AS BIGINT) AS r2_ref,
       CAST(b.clip_n AS BIGINT) AS r2_clip,
       (CAST(a.clip_n AS BIGINT) * 1000000) // a.ref_n
         AS r1_recall_ppm,
       (CAST(b.clip_n AS BIGINT) * 1000000) // b.ref_n
         AS r2_recall_ppm
FROM joined a JOIN joined b ON a.pair = b.pair AND a.o = 1 AND b.o = 2
"""


def q_text_heading_outline(spark, sf_dir):
    """Heading-outline audit over extracted HTML (``<h1>``-``<h6>``
    sequence) — document-structure lint for both SEO-grade page QA
    and RAG chunking (a skipped heading level breaks every
    section-hierarchy chunker that nests by level): heading levels
    are pulled in order by regexp, then audited in the array domain
    for h1 multiplicity, LEVEL SKIPS (a step down the hierarchy
    deeper than one level, e.g. h1 -> h3), and the well-formed flag
    (starts at h1, exactly one h1, no skips).

    Fixture: 4+k%5 headings at level 1+((k·5+i·(1+k%3))%4) —
    step size 1+k%3, so k%3=0 docs are skip-free.

    Plan/scale: regexp + array codegen, zero shuffles."""
    html = F.expr(
        "array_join(transform(sequence(0, cast(4 + doc_id % 5 as int)"
        " - 1), i -> concat('<h', 1 + ((doc_id * 5 + i * (1 + doc_id % 3)) % 4), "
        "'>T', i, '</h', 1 + ((doc_id * 5 + i * (1 + doc_id % 3)) % 4), '>')), '')")
    rows = _t(spark, sf_dir, "documents").select(
        F.col("doc_id"), html.alias("html"))
    levels = F.expr("transform(regexp_extract_all(html, "
                    "'<h([1-6])>', 1), x -> cast(x as int))")
    base = rows.select("doc_id", levels.alias("lv"))
    return base.select(
        "doc_id",
        F.expr("size(lv)").cast("int").alias("n_headings"),
        F.expr("size(filter(lv, x -> x = 1))").cast("int")
        .alias("n_h1"),
        F.expr("array_max(lv)").cast("int").alias("max_level"),
        F.expr("size(filter(sequence(1, size(lv) - 1), "
               "i -> element_at(lv, i + 1) > element_at(lv, i) + 1))")
        .cast("int").alias("n_skips"),
        F.expr("element_at(lv, 1)").cast("int").alias("first_level"),
    ).withColumn(
        "well_formed",
        ((F.col("n_h1") == 1) & (F.col("n_skips") == 0)
         & (F.col("first_level") == 1)).cast("int"))


ORACLE_TEXT_HEADING_OUTLINE = """
WITH rows_ AS (
  SELECT doc_id,
         array_to_string(list_transform(range(4 + doc_id % 5),
           i -> '<h' || (1 + ((doc_id * 5 + i * (1 + doc_id % 3)) % 4)) || '>T' || i
                || '</h' || (1 + ((doc_id * 5 + i * (1 + doc_id % 3)) % 4)) || '>'),
           '') AS html
  FROM documents),
lvl AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(html, '<h([1-6])>', 1),
                        x -> CAST(x AS INT)) AS lv
  FROM rows_)
SELECT doc_id,
       CAST(len(lv) AS INT) AS n_headings,
       CAST(len(list_filter(lv, x -> x = 1)) AS INT) AS n_h1,
       CAST(list_max(lv) AS INT) AS max_level,
       CAST(len(list_filter(range(1, len(lv)),
            i -> lv[CAST(i + 1 AS INT)] > lv[CAST(i AS INT)] + 1))
            AS INT) AS n_skips,
       CAST(lv[1] AS INT) AS first_level,
       CAST(CASE WHEN len(list_filter(lv, x -> x = 1)) = 1
                  AND len(list_filter(range(1, len(lv)),
                      i -> lv[CAST(i + 1 AS INT)]
                           > lv[CAST(i AS INT)] + 1)) = 0
                  AND lv[1] = 1
            THEN 1 ELSE 0 END AS INT) AS well_formed
FROM lvl
"""


def q_text_frontmatter_parse(spark, sf_dir):
    """Markdown front-matter extraction — the metadata channel of
    every docs-site / blog corpus (title, author, tags ride in a
    leading ``---`` YAML block; a curator that ignores it loses the
    only structured labels these documents carry): the block is
    matched non-greedily (``^---\\n([\\s\\S]*?)\\n---\\n`` — the
    [\\s\\S] idiom because '.' crosses no newline in either engine),
    fields pulled by line-anchored regexps, tags split and counted.
    Docs without front matter pass through flagged, fields empty.

    Fixture: k%3 in {0,1} docs carry title/author/tags blocks.

    Plan/scale: map-only regexp codegen."""
    k = F.col("doc_id")
    fm = F.concat(
        F.lit("---\ntitle: Doc "), k.cast("string"),
        F.lit("\nauthor: author"), (k % 20).cast("string"),
        F.lit("\ntags: t"), (k % 5).cast("string"), F.lit(",t"),
        (k % 7 + 10).cast("string"), F.lit("\n---\n"))
    content = (F.when(k % 3 != 2,
                      F.concat(fm, F.lit("# body\nrest of content")))
               .otherwise(F.lit("# body\nrest of content")))
    rows = _t(spark, sf_dir, "documents").select(
        k.alias("doc_id"), content.alias("md"))
    block = F.regexp_extract("md", "^---\n([\\s\\S]*?)\n---\n", 1)
    title = F.regexp_extract(block, "(^|\n)title: ([^\n]*)", 2)
    author = F.regexp_extract(block, "(^|\n)author: ([^\n]*)", 2)
    tags_raw = F.regexp_extract(block, "(^|\n)tags: ([^\n]*)", 2)
    tags = F.expr("filter(split(tags_raw, ','), x -> x <> '')")
    out = rows.select("doc_id", block.alias("block"),
                      title.alias("title"), author.alias("author"),
                      tags_raw.alias("tags_raw"))
    return out.select(
        "doc_id",
        (F.col("block") != "").cast("int").alias("has_frontmatter"),
        "title", "author",
        F.size(tags).cast("int").alias("n_tags"),
        F.coalesce(F.expr("try_element_at(filter(split(tags_raw, ','),"
                          " x -> x <> ''), 1)"), F.lit(""))
        .alias("first_tag"))


ORACLE_TEXT_FRONTMATTER_PARSE = """
WITH rows_ AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 <> 2 THEN
           '---' || chr(10) || 'title: Doc ' || doc_id || chr(10)
           || 'author: author' || (doc_id % 20) || chr(10)
           || 'tags: t' || (doc_id % 5) || ',t' || (doc_id % 7 + 10)
           || chr(10) || '---' || chr(10)
           || '# body' || chr(10) || 'rest of content'
         ELSE '# body' || chr(10) || 'rest of content' END AS md
  FROM documents),
parsed AS (
  SELECT doc_id,
         regexp_extract(md,
           '^---' || chr(10) || '([\\s\\S]*?)' || chr(10) || '---'
           || chr(10), 1) AS block
  FROM rows_),
fields AS (
  SELECT doc_id, block,
         regexp_extract(block, '(^|\n)title: ([^\n]*)', 2) AS title,
         regexp_extract(block, '(^|\n)author: ([^\n]*)', 2)
           AS author,
         list_filter(string_split(
           regexp_extract(block, '(^|\n)tags: ([^\n]*)', 2), ','),
           x -> x <> '') AS tags
  FROM parsed)
SELECT doc_id,
       CAST(block <> '' AS INT) AS has_frontmatter,
       title, author,
       CAST(len(tags) AS INT) AS n_tags,
       COALESCE(tags[1], '') AS first_tag
FROM fields
"""


def q_text_stopword_density(spark, sf_dir):
    """Stopword-density quality signal over the REAL gensim STOPWORDS set
    (the 337-word frozen public list the reference imports at
    helper_method.py:8 and probes per token in is_stop_word :22-26, now
    bundled at genesis_spark/data/stopwords.txt): natural prose keeps
    20-70% of its tokens in the stopword set; keyword-stuffed listings
    and gibberish fall outside. Integer ppm so the verdict hash-compares
    exactly. The 337-literal array is built as ONE SQL parse (the r3
    plan-construction discipline) and membership runs as codegen
    array_contains — at 100 TB the set stays a plan literal (337 strings,
    bytes), never a join."""
    import genesis_spark.functions.text as TX
    words = sorted(TX.load_stopwords(TX.gensim_stopwords_path()))
    stop_arr = "array(" + ",".join(f"'{w}'" for w in words) + ")"
    toks = "filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')"
    return (_t(spark, sf_dir, "documents")
            .selectExpr(
                "doc_id",
                f"cast(size({toks}) as bigint) AS n_tokens",
                f"cast(size(filter({toks}, t -> "
                f"array_contains({stop_arr}, t))) as bigint) AS n_stop")
            .selectExpr(
                "doc_id", "n_tokens", "n_stop",
                "n_stop * 1000000 DIV greatest(n_tokens, 1) AS stop_ppm",
                "n_stop * 1000000 DIV greatest(n_tokens, 1) "
                "BETWEEN 200000 AND 700000 AS prose_like")
            .orderBy("doc_id"))


def _stopword_sql_list() -> str:
    import genesis_spark.functions.text as TX
    words = sorted(TX.load_stopwords(TX.gensim_stopwords_path()))
    return "[" + ",".join(f"'{w}'" for w in words) + "]"


ORACLE_TEXT_STOPWORD_DENSITY = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS ts
  FROM documents
),
counted AS (
  SELECT doc_id,
         CAST(len(ts) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(ts, t -> list_contains(
             {_stopword_sql_list()}, t))) AS BIGINT) AS n_stop
  FROM toks
)
SELECT doc_id, n_tokens, n_stop,
       n_stop * 1000000 // greatest(n_tokens, 1) AS stop_ppm,
       n_stop * 1000000 // greatest(n_tokens, 1)
         BETWEEN 200000 AND 700000 AS prose_like
FROM counted
ORDER BY doc_id
"""
