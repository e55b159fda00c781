"""Event-sourced corrections store (reference parity: the human-in-the-
loop correction workflow of data/corrections_manager.py).

Reference model: per-document `history` list of correction events +
materialized `latest_state` (corrections_manager.py:63-97), persisted
as JSON per user/session (:27-40, 105-113). Here the same semantics as
Spark tables:

- an append-only `corrections` event log (parquet append — Iceberg
  append in production), one row per event with the reference's exact
  fields (:71-79);
- `latest_state(base)` — last-writer-wins fold of the log onto the
  wide structured rows, as one window + one join (replacing the
  reference's per-event dict mutation);
- `history(document)` — the per-doc event trail, ordered;
- JSON session export (:105-113) for interchange with the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import stats

CORRECTION_SCHEMA = T.StructType(
    [
        T.StructField("document", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("original_value", T.StringType(), True),
        T.StructField("corrected_value", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("user", T.StringType(), True),
        T.StructField("notes", T.StringType(), True),
        T.StructField("correction_id", T.LongType(), False),
    ]
)


class CorrectionsLog:
    """Append-only corrections log over a parquet directory."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def append(self, events: DataFrame) -> None:
        events.select(*[f.name for f in CORRECTION_SCHEMA]).write.mode(
            "append"
        ).parquet(self.path)

    def events(self) -> DataFrame:
        return self.spark.read.schema(CORRECTION_SCHEMA).parquet(self.path)

    def history(self, document: str) -> DataFrame:
        """Ordered event trail for one document (corrections_manager
        'history', :82)."""
        return (
            self.events()
            .filter(F.col("document") == document)
            .orderBy("timestamp", "correction_id")
        )

    def latest_corrections(self) -> DataFrame:
        """Last correction per (document, entity_type) — O4."""
        return stats.last_writer_wins(
            self.events(), ("document", "entity_type"), "timestamp",
            "correction_id",
        )

    def latest_state(
        self,
        base: DataFrame,
        doc_col: str = "document",
        label_cols: tuple[str, ...] = (),
    ) -> DataFrame:
        """Materialize the corrected wide rows: for each label column,
        coalesce(latest correction, original). One window + one join —
        the distributed restatement of corrections_manager.py:85-97."""
        latest = self.latest_corrections().select(
            F.col("document").alias(doc_col),
            "entity_type",
            "corrected_value",
            F.col("timestamp").alias("last_updated_candidate"),
        )
        out = base
        for label in label_cols:
            lab = latest.filter(F.col("entity_type") == label).select(
                doc_col,
                F.col("corrected_value").alias(f"_corr_{label}"),
                F.col("last_updated_candidate").alias(f"_ts_{label}"),
            )
            out = out.join(lab, doc_col, "left").withColumn(
                label, F.coalesce(f"_corr_{label}", F.col(f"`{label}`"))
            ).drop(f"_corr_{label}")
        ts_cols = [F.col(f"`_ts_{lb}`") for lb in label_cols]
        if ts_cols:
            out = out.withColumn(
                "last_updated", F.greatest(*ts_cols) if len(ts_cols) > 1 else ts_cols[0]
            )
            out = out.drop(*[f"_ts_{lb}" for lb in label_cols])
        return out

    def export_session_json(self, out_dir: str) -> None:
        """S9: JSON interchange with the reference's session files."""
        self.events().write.mode("overwrite").json(out_dir)

    def correction_frequency_by_day(self) -> DataFrame:
        """A9 (charts.py:354-406)."""
        return stats.daily_counts(self.events(), "timestamp")

    def corrections_per_entity_type(self) -> DataFrame:
        """A10 (dashboard_v1.py:864-879)."""
        return (
            self.events()
            .groupBy("entity_type")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "entity_type")
        )
