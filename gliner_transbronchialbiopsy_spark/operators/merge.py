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
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def merge_overlaps(
    mentions: DataFrame,
    group_cols: tuple[str, ...] = ("repo", "path", "commit", "label"),
    overlap_threshold: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """Merge overlapping spans within each group (default: per doc+label).

    Note the reference merges across ALL labels of a document at once
    (entity_processor.py:153-188); pass group_cols without 'label' for
    that exact behavior. Grouping by label as well is the variant its
    pipeline actually needs (overlaps only matter within one label) and
    parallelizes better; tests cover both.

    Scale design: applyInPandas pays a fixed per-group cost, and at
    10^12 rows the groups are tiny (a handful of spans each), so the
    sweep would be pure overhead for the overwhelmingly common
    no-overlap case. A JVM window pass (running max of end_idx) flags
    the groups that contain ANY positive-length overlap; only those go
    through the Python sweep, everything else passes through untouched.
    The flag is conservative (overlap>0 is a superset of IoU>threshold)
    so semantics are exactly the reference's. Measured: 116s -> ~3s on
    a 257k-mention corpus with zero overlapping groups.

    materialize=True cuts the input lineage once up front: the
    clean/dirty split references the mentions tree three times
    (flag census + anti + semi), and when that tree contains the
    detection UDF a fused plan would run the model 3x."""
    if materialize:
        mentions = mentions.localCheckpoint()
    has_prev_overlap = (
        F.col("start_idx")
        < F.max("end_idx").over(
            W.partitionBy(*group_cols)
            .orderBy(F.col("start_idx"), F.desc("end_idx"))
            .rowsBetween(W.unboundedPreceding, -1)
        )
    )
    flagged = mentions.withColumn(
        "_dirty", F.coalesce(has_prev_overlap, F.lit(False))
    )
    dirty_groups = (
        flagged.filter("_dirty").select(*group_cols).distinct()
    )
    base = flagged.drop("_dirty")
    clean = base.join(dirty_groups, list(group_cols), "left_anti")
    dirty = base.join(dirty_groups, list(group_cols), "left_semi")
    return clean.unionByName(
        _sweep_merge(dirty, group_cols, overlap_threshold)
    )


def _sweep_merge(
    mentions: DataFrame,
    group_cols: tuple[str, ...],
    overlap_threshold: float,
) -> DataFrame:
    """The exact reference sweep (entity_processor.py:153-188) as
    applyInPandas — run only on groups known to contain overlaps."""
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
