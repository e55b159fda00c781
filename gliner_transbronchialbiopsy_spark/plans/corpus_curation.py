"""Corpus curation: the canonical training-data cleaning pass, composed
from the engine's text-analysis and dedup operators into ONE declarative
plan (language filter -> quality filter -> exact-dedup keep-first).

This is the pipeline a 100 TB pretraining corpus actually runs before
anything model-shaped touches it (C4/Gopher-style). Plan shape:

- language ID + quality features are pure column expressions
  (operators/textstats.py) — a single whole-stage-codegen projection
  over the scan, no Python, no shuffle;
- the ONLY shuffle is the dedup: a window over sha2(text) keyed
  partitions (keep the lowest id per identical text). Filters run
  BEFORE the shuffle, so rejected rows never move;
- rejection accounting is per-stage and sequential (a doc is charged
  to the FIRST stage that rejects it), computed as one aggregate over
  the same flagged projection — no second pass over the corpus.

Reference analogue: the upload-validation + skip-seen-file checks
(src/streamlit/app/utils/file_handler.py:45-90, app.py:342-346)
generalized to corpus scale; the filters themselves are the standard
public curation heuristics, not reference parity items.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators import textstats

#: rejection stages in charge order (first failing stage wins)
STAGES = ("lang", "quality", "duplicate")


def flag(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: Sequence[str] = ("en",),
    min_quality: float = 0.45,
) -> DataFrame:
    """Annotate every doc with lang_pred, quality_score and its fate:
    reject_stage in {'lang','quality','duplicate'} or NULL for kept.

    Duplicate election is deterministic: within byte-identical texts
    the lowest id survives (the reference's skip-already-seen rule,
    app.py:345, made order-independent). This audit variant ranks every
    row, so its window shuffles the full corpus; the production keep
    path (curate) filters first and shuffles only survivors."""
    scored = textstats.quality_score(df, text_col)
    scored = scored.withColumn(
        "lang_pred", textstats.lang_id(F.col(text_col))
    )
    lang_ok = F.col("lang_pred").isin(*langs)
    quality_ok = F.col("quality_score") >= F.lit(min_quality)
    # byte-identical texts share lang_pred and quality_score (both are
    # pure functions of text_col), so every row of a text partition has
    # the same scalar fate — rank>1 can only ever charge a row whose
    # partition-mates are survivors too, and plain id order suffices
    rank = F.row_number().over(
        W.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(F.col(id_col).asc())
    )
    return scored.withColumn(
        "reject_stage",
        F.when(~lang_ok, F.lit("lang"))
        .when(~quality_ok, F.lit("quality"))
        .when(rank > 1, F.lit("duplicate")),
    )


def curate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: Sequence[str] = ("en",),
    min_quality: float = 0.45,
) -> DataFrame:
    """The kept corpus: original columns + (lang_pred, quality_score)
    retained for downstream sampling.

    Same fate per row as flag(), but the scalar filters run BEFORE the
    dedup window, so only survivors enter the one shuffle — at 100 TB
    the rejected fraction (often >50%) never moves."""
    scored = textstats.quality_score(df, text_col).withColumn(
        "lang_pred", textstats.lang_id(F.col(text_col))
    )
    survivors = scored.filter(
        F.col("lang_pred").isin(*langs)
        & (F.col("quality_score") >= F.lit(min_quality))
    )
    rank = F.row_number().over(
        W.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(F.col(id_col).asc())
    )
    return (
        survivors.withColumn("_rank", rank)
        .filter(F.col("_rank") == 1)
        .drop(
            "_rank", "n_chars_calc", "n_tokens", "punct_ratio",
            "stopword_ratio", "upper_ratio",
        )
    )


def report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: Sequence[str] = ("en",),
    min_quality: float = 0.45,
) -> DataFrame:
    """One-row audit: input size, rejects per stage, kept count. The
    no-silent-caps rule as a first-class output — at 100 TB 'we kept
    61%' must come with WHERE the other 39% went."""
    flagged = flag(df, text_col, id_col, langs, min_quality)
    return flagged.agg(
        F.count(F.lit(1)).alias("n_input"),
        *[
            F.count(F.when(F.col("reject_stage") == s, 1)).alias(f"n_{s}")
            for s in STAGES
        ],
        F.count(F.when(F.col("reject_stage").isNull(), 1)).alias("n_kept"),
    )
