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
