"""Export-edge sinks (S7/S8/S9): the reference's wide-row interchange
format, produced ONLY at the boundary.

Inside the engine, multi-values are arrays and scores are a typed
map<label, array<double>>; the reference's ';'-joined cells
(entity_processor.py:76) and stringified scores dict
(entity_processor.py:80-83 — which it later eval()s back,
charts.py:92, a bug class we keep out of the engine) exist here only
so a reference user gets byte-compatible CSV/JSON exports.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import config
from ..operators import pivot


def _stringified_scores(scores_col: Column) -> Column:
    """map<label, array<double>> -> the reference's str(dict) form:
    {'Grade A': [0.9, 0.8], ...} (entity_processor.py:81-83)."""
    entry = lambda e: F.concat(  # noqa: E731
        F.lit("'"),
        e["key"],
        F.lit("': ["),
        F.array_join(
            F.transform(e["value"], lambda v: v.cast("string")), ", "
        ),
        F.lit("]"),
    )
    return F.when(
        scores_col.isNotNull() & (F.size(F.map_keys(scores_col)) > 0),
        F.concat(
            F.lit("{"),
            F.array_join(F.transform(F.map_entries(scores_col), entry), ", "),
            F.lit("}"),
        ),
    )


def reference_wide_rows(
    mentions: DataFrame,
    sectionized: DataFrame,
    structuration_ts: str | None = None,
) -> DataFrame:
    """Mentions -> the reference's structured row, column-for-column
    (entity_processor.process_entities, :56-83): Nom_Document,
    Date_Structuration ('%Y-%m-%d %H:%M:%S'), Conclusion, one column
    per label (';'-joined, NULL when absent), Scores (stringified).

    structuration_ts pins the timestamp for reproducible exports; None
    uses current_timestamp() like the reference (:59)."""
    wide = pivot.pivot_wide(mentions, with_scores=True)
    concl = sectionized.select("repo", "path", "commit", "conclusion")
    ts = (
        F.lit(structuration_ts)
        if structuration_ts
        else F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss")
    )
    return wide.join(concl, ["repo", "path", "commit"], "left").select(
        F.col("path").alias("Nom_Document"),
        ts.alias("Date_Structuration"),
        F.col("conclusion").alias("Conclusion"),
        *[F.col(f"`{lb}`").alias(lb) for lb in config.LABELS],
        _stringified_scores(F.col("scores")).alias("Scores"),
    )


def write_reference_csv(wide: DataFrame, out_dir: str) -> None:
    """S7: the download-CSV edge (components.py:503-506)."""
    wide.coalesce(1).write.mode("overwrite").option("header", True).csv(out_dir)


def write_reference_json(wide: DataFrame, out_dir: str) -> None:
    """S9: JSON edge (ensure_ascii=False equivalent: Spark writes UTF-8
    natively)."""
    wide.write.mode("overwrite").json(out_dir)
