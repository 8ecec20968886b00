"""Text-analysis operators: tokenization, quality scoring, language-ID,
fingerprinting.

Pure Column expressions — at 100 TB these run inside whole-stage codegen
over the parquet scan with no Python hop and no shuffle (all per-row).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (single-space split; use :func:`normalize_text`
    first for arbitrary whitespace)."""
    return F.split(_c(text), " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("int")


#: Tiny English stopword core used by quality scoring / language-ID.
STOPWORDS_EN = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "for"]
MARKERS_DE = ["der", "die", "das", "und", "ist", "ein", "mit", "nicht"]
MARKERS_ES = ["el", "la", "los", "las", "y", "es", "un", "con", "por"]


def _hits(toks: Column, words: list[str]) -> Column:
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordset, t))).cast("int")


def quality_metrics(text: Column | str) -> Column:
    """STRUCT of cheap quality signals for corpus filtering:

    n_tokens, n_chars, avg_token_len, stopword_ratio, distinct_ratio
    (type-token ratio).  All doubles are derived with identical operand
    order in the oracle, so they hash-match.
    """
    t = _c(text)
    toks = tokens(t)
    n = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    return F.struct(
        n.cast("int").alias("n_tokens"),
        F.length(t).cast("int").alias("n_chars"),
        (total_len.cast("double") / n).alias("avg_token_len"),
        (_hits(toks, STOPWORDS_EN).cast("double") / n).alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / n).alias("distinct_ratio"),
    )


def lang_scores(text: Column | str) -> Column:
    """STRUCT of marker-word hit counts + predicted language.

    N-gram/marker heuristic language-ID: counts hits from small per-language
    marker sets and predicts the argmax (ties → 'en' > 'de' > 'es', then
    'unknown' when all zero).
    """
    toks = tokens(_c(text))
    en, de, es = (
        _hits(toks, STOPWORDS_EN),
        _hits(toks, MARKERS_DE),
        _hits(toks, MARKERS_ES),
    )
    predicted = (
        F.when((en >= de) & (en >= es) & (en > 0), F.lit("en"))
        .when((de >= es) & (de > 0), F.lit("de"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )
    return F.struct(
        en.alias("en_hits"),
        de.alias("de_hits"),
        es.alias("es_hits"),
        predicted.alias("predicted_lang"),
    )


def normalize_text(text: Column | str) -> Column:
    """Lowercase, collapse all whitespace runs to single spaces, trim."""
    return F.lower(F.trim(F.regexp_replace(_c(text), r"\s+", " ")))


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    Same role as a rolling-hash content fingerprint; md5 keeps it portable
    across engines (oracle reproduces it exactly).
    """
    return F.md5(normalize_text(text))
