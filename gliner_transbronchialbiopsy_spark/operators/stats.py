"""Aggregation operators (SURVEY.md §2.6 A3-A14) as reusable plan
builders. Each is a single groupBy (one shuffle, map-side partials) or
a window; all expressible to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def label_stats(df: DataFrame, label_col: str, text_col: str, score_col: str) -> DataFrame:
    """A3 per-label stats: count, distinct texts, mean/min/max score
    (entity_processor.py:91-135)."""
    return df.groupBy(label_col).agg(
        F.count("*").alias("n"),
        F.countDistinct(text_col).alias("n_unique"),
        F.round(F.avg(score_col), 4).alias("mean_score"),
        F.round(F.min(score_col), 4).alias("min_score"),
        F.round(F.max(score_col), 4).alias("max_score"),
    )


def count_histogram(df: DataFrame, label_col: str, all_labels: DataFrame) -> DataFrame:
    """A4 counts including zero-count labels (dashboard.py:114-126):
    right join against the static label dimension (broadcast)."""
    counts = df.groupBy(label_col).count()
    return all_labels.join(counts, label_col, "left").select(
        label_col, F.coalesce("count", F.lit(0)).alias("n")
    )


def coverage(df: DataFrame, label_col: str, doc_col: str) -> DataFrame:
    """A5 label coverage: distinct docs carrying each label + share of
    all docs (components.py:56-89 analogue)."""
    total = df.select(F.countDistinct(doc_col).alias("_t"))
    per = df.groupBy(label_col).agg(F.countDistinct(doc_col).alias("n_docs"))
    return per.crossJoin(F.broadcast(total)).select(
        label_col,
        "n_docs",
        F.round(F.col("n_docs") / F.col("_t"), 4).alias("doc_share"),
    )


def global_totals(df: DataFrame, doc_col: str) -> DataFrame:
    """A6: total docs, total rows, mean rows/doc."""
    return df.agg(
        F.countDistinct(doc_col).alias("n_docs"),
        F.count("*").alias("n_rows"),
        F.round(F.count("*") / F.countDistinct(doc_col), 4).alias("rows_per_doc"),
    )


def cooccurrence(df: DataFrame, doc_col: str, label_col: str) -> DataFrame:
    """A7 label x label joint-presence counts within a doc
    (charts.py:226-239): distinct doc-label pairs self-joined on doc."""
    pairs = df.select(doc_col, label_col).distinct()
    a, b = pairs.alias("a"), pairs.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{doc_col}") == F.col(f"b.{doc_col}"))
            & (F.col(f"a.{label_col}") < F.col(f"b.{label_col}")),
        )
        .groupBy(
            F.col(f"a.{label_col}").alias("label_a"),
            F.col(f"b.{label_col}").alias("label_b"),
        )
        .agg(F.count("*").alias("n_docs"))
    )


def score_distribution(df: DataFrame, label_col: str, score_col: str) -> DataFrame:
    """A8 per-label exact quartiles (charts.py:410-445). Exact
    percentile (not approx) so the DuckDB oracle matches bit-for-bit
    modulo rounding; at 100 TB swap to percentile_approx."""
    return df.groupBy(label_col).agg(
        F.round(F.expr(f"percentile({score_col}, 0.25)"), 4).alias("q1"),
        F.round(F.expr(f"percentile({score_col}, 0.5)"), 4).alias("median"),
        F.round(F.expr(f"percentile({score_col}, 0.75)"), 4).alias("q3"),
    )


def daily_counts(df: DataFrame, ts_col: str) -> DataFrame:
    """A9 counts per day (charts.py:354-406)."""
    return (
        df.groupBy(F.to_date(ts_col).alias("day"))
        .agg(F.count("*").alias("n"))
        .orderBy("day")
    )


def threshold_impact(df: DataFrame, score_col: str, n_steps: int = 21) -> DataFrame:
    """A11 threshold-impact curve (charts.py:303-338): explode a
    threshold sequence, conditional count per threshold — one pass."""
    thresholds = F.transform(
        F.sequence(F.lit(0), F.lit(n_steps - 1)),
        lambda i: F.round(i * 0.05, 2),
    )
    return (
        df.select(F.col(score_col), F.explode(thresholds).alias("threshold"))
        .groupBy("threshold")
        .agg(F.sum((F.col(score_col) >= F.col("threshold")).cast("long")).alias("n_kept"))
        .orderBy("threshold")
    )


def last_writer_wins(
    df: DataFrame, key_cols: tuple[str, ...], ts_col: str, tiebreak: str
) -> DataFrame:
    """O4 latest state per key (corrections_manager.py:85-97): window
    row_number desc == 1 with a deterministic tiebreak."""
    w = W.partitionBy(*key_cols).orderBy(F.desc(ts_col), F.desc(tiebreak))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_corrections(
    base: DataFrame,
    corrections: DataFrame,
    key_cols: tuple[str, ...],
    value_col: str,
    corrected_col: str = "corrected_value",
    ts_col: str = "timestamp",
    tiebreak: str = "correction_id",
) -> DataFrame:
    """J2 corrections merge: left join latest correction per key,
    coalesce(corrected, original) (app.py:266-268 semantics as one
    join instead of per-row dict writes)."""
    latest = last_writer_wins(corrections, key_cols, ts_col, tiebreak).select(
        *key_cols, F.col(corrected_col)
    )
    return base.join(latest, list(key_cols), "left").withColumn(
        value_col, F.coalesce(corrected_col, value_col)
    ).drop(corrected_col)


_KFOLD_MULT = 2654435761  # Knuth multiplicative constant (2^32 / phi)


def kfold_assign(df: DataFrame, id_col: str, k: int = 5, seed: int = 42) -> DataFrame:
    """U5 deterministic k-fold bucketing: pmod over a seeded affine map
    of the id (replaces the reference's shuffle+slice split,
    train_cross_validation.py:456-465, with a reproducible, cluster-
    stable rule).

    Overflow safety: `id * 2654435761` wraps int64 in Spark (non-ANSI)
    for ids >= ~3.5e9 while an oracle engine promotes — so the modulus
    is distributed FIRST: ((id % k) * (MULT % k) + seed) % k, which is
    arithmetically identical to (id*MULT+seed) % k for non-negative ids
    at ANY id magnitude and never leaves small-int range. (xxhash64
    would also work Spark-side but has no DuckDB equivalent, which
    would forfeit the oracle check.)"""
    return df.withColumn(
        "fold",
        F.pmod(
            F.pmod(F.col(id_col), k) * F.lit(_KFOLD_MULT % k) + seed, k
        ).cast("int"),
    )


def fold_metrics(df: DataFrame, metric_col: str, value_col: str) -> DataFrame:
    """A13 per-metric mean/std/min/max across folds
    (train_cross_validation.py:92-124)."""
    return df.groupBy(metric_col).agg(
        F.round(F.avg(value_col), 4).alias("mean"),
        F.round(F.stddev_samp(value_col), 4).alias("std"),
        F.round(F.min(value_col), 4).alias("min"),
        F.round(F.max(value_col), 4).alias("max"),
    )
