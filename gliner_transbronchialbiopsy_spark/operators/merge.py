"""A2 — overlap-merge of mention spans (per-document interval agg).

Reference: entity_processor.merge_overlapping_entities
(src/streamlit/app/data/entity_processor.py:137-192). Semantics are a
single linear sweep over spans sorted by (start_idx, -end_idx): if
IoU(current, next) > threshold (STRICT >, :179) keep the higher-score
span (STRICT <, :181 — ties keep the earlier one); else emit current.
This is order-dependent and NOT a transitive closure, so it must run
inside one ordered pass per document — applyInPandas per doc group,
never a distributed reduce.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def merge_overlaps(
    mentions: DataFrame,
    group_cols: tuple[str, ...] = ("repo", "path", "commit", "label"),
    overlap_threshold: float = 0.5,
) -> DataFrame:
    """Merge overlapping spans within each group (default: per doc+label).

    Note the reference merges across ALL labels of a document at once
    (entity_processor.py:153-188); pass group_cols without 'label' for
    that exact behavior. Grouping by label as well is the variant its
    pipeline actually needs (overlaps only matter within one label) and
    parallelizes better; tests cover both.
    """
    schema = mentions.schema

    def sweep(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) <= 1:
            return pdf
        pdf = pdf.sort_values(
            ["start_idx", "end_idx"], ascending=[True, False], kind="mergesort"
        ).reset_index(drop=True)
        keep: list[int] = []
        cur = 0
        for nxt in range(1, len(pdf)):
            cs, ce = pdf.at[cur, "start_idx"], pdf.at[cur, "end_idx"]
            ns, ne = pdf.at[nxt, "start_idx"], pdf.at[nxt, "end_idx"]
            overlap = min(ce, ne) - max(cs, ns)
            union = max(ce, ne) - min(cs, ns)
            ratio = overlap / union if union > 0 else 0
            if ratio > overlap_threshold:
                if pdf.at[cur, "score"] < pdf.at[nxt, "score"]:
                    cur = nxt
            else:
                keep.append(cur)
                cur = nxt
        keep.append(cur)
        return pdf.iloc[keep]

    return mentions.groupBy(*group_cols).applyInPandas(sweep, schema=schema)
