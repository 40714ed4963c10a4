"""Distributed BPE tokenizer training and application.

The training-data pipeline family's tokenizer gap: SURVEY's token
counting (whitespace + BPE-ish regex, textstats.py) counts tokens but
cannot LEARN a vocabulary. This module adds byte-pair-encoding merge
learning (Sennrich et al. 2016) re-expressed for Spark:

  bpe_train    iterate: count adjacent symbol pairs (weighted by word
               frequency, one map-side-combinable groupBy per round),
               pick the global argmax (count desc, pair asc — fully
               deterministic), rewrite every word with the merge. Words
               live as symbol strings with each token wrapped in its own
               spaces (" h  e  l  l  o ") so a merge is ONE codegen
               replace(' a  b ' -> ' ab ') and leftmost non-overlapping
               replacement equals classical left-to-right greedy BPE
               (see _spaced for why single-space joins would not).
  bpe_apply    apply a FIXED merge list in order — n chained replaces,
               zero shuffles, engine-portable (a DuckDB oracle replays it
               as nested replace() calls).

Scale: each train round is one explode+groupBy over the DISTINCT word
table (vocab, not corpus — at 100 TB the word table is ~10^8 rows vs
10^12 corpus tokens, built once by the initial word-count shuffle).
The per-round driver action collects exactly ONE row (the argmax pair);
lineage is cut with localCheckpoint every ``checkpoint_every`` rounds
(the cc.py pattern) so the plan stays O(1) per round instead of
accreting n_merges nested rewrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _spaced(word):
    """' h  e  l  l  o ' — every token wrapped in ITS OWN spaces (i.e.
    two-space joins), so a merge pattern ' a  b ' -> ' ab ' never shares
    a boundary char with the next potential match. With single-space
    joins, replace() would consume the shared space and skip the second
    of two back-to-back merges ('x a b a b y' -> only one 'ab'),
    diverging from classical greedy BPE; self-contained wrapping makes
    leftmost non-overlapping replace == classical left-to-right greedy."""
    return F.concat(F.lit(" "),
                    F.array_join(F.split(word, "(?!^)"), "  "),
                    F.lit(" "))


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over lowercased whitespace-split text — the corpus-wide
    shuffle that training then never repeats."""
    return (docs
            .select(F.explode(F.split(F.lower(F.col(text_col)),
                                      r"\s+")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("n")))


def _pair_counts(words: DataFrame) -> DataFrame:
    toks = F.split(F.trim(F.col("sym")), "  ")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(toks) - 2),
                    lambda i: F.struct(
                        F.element_at(toks, i + 1).alias("a"),
                        F.element_at(toks, i + 2).alias("b")))
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (words
            .select("n", F.explode(pairs).alias("p"))
            .groupBy("p.a", "p.b").agg(F.sum("n").alias("cnt")))


def bpe_train(docs: DataFrame, n_merges: int, text_col: str = "text",
              checkpoint_every: int = 4) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from ``docs``. Returns the ordered
    merge list [(a, b), ...]; ties at equal count break on (a, b)
    lexicographic ascending so re-runs are bit-identical."""
    words = (word_counts(docs, text_col)
             .select(_spaced(F.col("word")).alias("sym"), "n"))
    words = words.localCheckpoint()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (_pair_counts(words)
               .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
               .limit(1).collect())
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.select(
            F.replace("sym", F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
            .alias("sym"), "n")
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges


def bpe_pair_counts(docs: DataFrame, merges: list[tuple[str, str]],
                    text_col: str = "text") -> DataFrame:
    """ONE training step as a standalone pass: the symbol-pair frequency
    table of the corpus AFTER applying ``merges`` — exactly the table
    whose (cnt desc, a asc, b asc) argmax ``bpe_train`` would pick as
    merge ``len(merges) + 1``. One corpus word-count shuffle + one
    explode + one map-side-combinable groupBy; the merge rewrites are
    chained zero-shuffle codegen replaces."""
    sym = _spaced(F.col("word"))
    for a, b in merges:
        sym = F.replace(sym, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    return _pair_counts(
        word_counts(docs, text_col).select(sym.alias("sym"), "n"))


def bpe_apply(docs: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text") -> DataFrame:
    """Tokenize ``docs`` with a fixed merge list: per word, chars joined
    by spaces, then every merge applied in order as one replace — a pure
    zero-shuffle map (n_merges chained codegen exprs). Returns one row
    per (doc row, token): (token)."""
    sym = _spaced(F.col("word"))
    for a, b in merges:
        sym = F.replace(sym, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    return (docs
            .select(F.explode(F.split(F.lower(F.col(text_col)),
                                      r"\s+")).alias("word"))
            .filter(F.col("word") != "")
            .select(F.explode(F.split(F.trim(sym), " +")).alias("token")))
