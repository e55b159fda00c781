"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

All JVM-side column expressions (regexp + array folds) — these run in
whole-stage codegen over 100 TB; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker vocabularies (n-gram heuristic stand-in; a
# real fastText-style model would slot into a pandas UDF on the same
# column contract)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with"),
    "fr": ("le", "la", "les", "de", "et", "est"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "las", "que", "es"),
}


def _marker_hits(col: Column, words: tuple[str, ...]) -> Column:
    rx = r"\b(?:" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(rx), F.lit(0)))


def lang_id(col: Column) -> Column:
    """Most-hit marker vocabulary wins; 'und' when nothing hits.
    Deterministic tie-break: language name ascending."""
    scores = F.array(
        *[
            F.struct(
                (-_marker_hits(col, words)).alias("neg_hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_min(scores)
    return F.when(best["neg_hits"] < 0, best["lang"]).otherwise(F.lit("und"))


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(col), r"\s+"))
    )


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish subword proxy: word-or-punct pieces (the reference's own
    tokenizer regex, json_convertissor.py:10) counted JVM-side."""
    return F.size(F.regexp_extract_all(col, F.lit(r"\b\w+\b|[^\w\s]"), F.lit(0)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality signals: length, token count, punct ratio,
    stopword ratio, mean word length, upper ratio."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count_ws(c)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), F.lit(0)))
    stop_rx = r"\b(?:the|and|of|is|le|la|de|et|der|und|el|que)\b"
    n_stop = F.size(F.regexp_extract_all(F.lower(c), F.lit(stop_rx), F.lit(0)))
    n_upper = F.size(F.regexp_extract_all(c, F.lit(r"[A-Z]"), F.lit(0)))
    return df.select(
        "*",
        n_chars.alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(n_upper / F.greatest(n_chars, F.lit(1)), 4).alias("upper_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0,1]: a fixed linear blend of the
    signals (heuristic Gopher/C4-style filter stand-in)."""
    feats = quality_features(df, text_col)
    score = (
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.3
        + F.least(F.col("stopword_ratio") * 4, F.lit(1.0)) * 0.3
    )
    return feats.withColumn("quality_score", F.round(score, 4))


def fingerprint64(col: Column) -> Column:
    """Rolling-hash document fingerprint: xxhash64 of the
    whitespace-normalized, lowercased text (content identity robust to
    spacing). For shift-tolerant fingerprints see dedup.simhash64."""
    return F.xxhash64(F.regexp_replace(F.lower(col), r"\s+", " "))
