"""A1 — the doc×label pivot (wide structured row) and its inverse melt
(long triple table).

Reference: entity_processor.process_entities
(src/streamlit/app/data/entity_processor.py:38-89): one wide row per
document, one column per label, multi-values ';'-joined in mention
order, missing labels None, plus a Scores map. The reference builds it
row-at-a-time in Python; here it is one shuffle:
groupBy(doc).pivot(label, LABELS) with FIXED pivot values — no
pivot-value discovery scan, which matters at 10^12 rows.

Determinism: collect_list has no ordering guarantee under parallel
aggregation, so values are collected as (start_idx, end_idx, text)
structs and array_sort'ed before joining — reproducing the reference's
in-document mention order exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import config


def pivot_wide(
    mentions: DataFrame,
    labels: tuple[str, ...] = config.LABELS,
    doc_cols: tuple[str, ...] = ("repo", "path", "commit"),
    with_scores: bool = True,
) -> DataFrame:
    """mentions -> one wide row per document.

    Columns: doc_cols + one string col per label (';'-joined in span
    order, NULL when absent) + scores: map<label, array<double>>.
    The reference stringifies the scores dict (entity_processor.py:80-83)
    and eval()s it back (charts.py:92) — we keep a typed MapType instead.
    """
    ordered_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("start_idx", "end_idx", "text"))
            ),
            lambda s: s["text"],
        ),
        ";",
    )
    wide = (
        mentions.groupBy(*doc_cols)
        .pivot("label", list(labels))
        .agg(ordered_text)
    )
    # absent label -> None, never '' (entity_processor.py:74-77):
    # collect_list over an empty pivot cell yields [] -> array_join ''.
    # The nullif must sit OUTSIDE the pivot agg (pivot requires a bare
    # aggregate expression), so it's a post-pivot projection.
    wide = wide.select(
        *doc_cols,
        *[F.nullif(F.col(f"`{lb}`"), F.lit("")).alias(lb) for lb in labels],
    )
    if with_scores:
        scores = (
            mentions.groupBy(*doc_cols, "label")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("start_idx", "end_idx", "score"))
                    ),
                    lambda s: F.round(s["score"], 3),
                ).alias("label_scores")
            )
            .groupBy(*doc_cols)
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("label", "label_scores"))
                ).alias("scores")
            )
        )
        wide = wide.join(scores, list(doc_cols), "left")
    return wide


def melt_to_triples(
    wide: DataFrame,
    labels: tuple[str, ...] = config.LABELS,
    doc_cols: tuple[str, ...] = ("repo", "path", "commit"),
) -> DataFrame:
    """Inverse of pivot_wide: wide row -> (subj, pred, obj) long rows,
    exploding ';'-joined multi-values. Uses stack() — one narrow pass,
    no shuffle."""
    n = len(labels)
    stack_args = ", ".join(f"'{lb}', `{lb}`" for lb in labels)
    subj = F.concat_ws(
        "", F.col(doc_cols[0]), F.lit("/"), F.col(doc_cols[1]),
        F.lit("@"), F.col(doc_cols[2]),
    )
    return (
        wide.select(
            subj.alias("subj"),
            F.expr(f"stack({n}, {stack_args}) as (pred, cell)"),
        )
        .filter(F.col("cell").isNotNull())
        .select("subj", "pred", F.explode(F.split("cell", ";")).alias("obj"))
    )
