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
        coalesce(latest correction, original). ONE aggregate + ONE join
        regardless of label count — the distributed restatement of
        corrections_manager.py:85-97. (A per-label join loop would cost
        len(label_cols) shuffles and a 14-deep plan on the reference's
        14-label vocabulary.)

        The per-doc corrections travel as a map<entity_type, struct>
        rather than pivoted columns: map lookup by LITERAL key handles
        any label string (spaces, dots, backticks), where column-name
        round-trips through F.col / df[name] parsing cannot."""
        if not label_cols:
            return base
        missing = [lb for lb in label_cols if lb not in base.columns]
        if missing:
            # fail loudly: silently ignoring a label would drop its
            # corrections while still advancing last_updated
            raise ValueError(
                f"label_cols not present in base: {missing}"
            )
        latest = self.latest_corrections().filter(
            F.col("entity_type").isin(list(label_cols))
        )
        corr_map = latest.groupBy(F.col("document").alias(doc_col)).agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        "entity_type",
                        F.struct("corrected_value", "timestamp").alias("v"),
                    )
                )
            ).alias("_corr_map")
        )
        joined = base.join(corr_map, doc_col, "left")

        def entry(lb: str):
            return F.col("_corr_map")[F.lit(lb)]

        def qcol(name: str):
            # backtick-quoted with embedded backticks doubled: the only
            # escaping F.col's identifier parser accepts for any name
            return F.col("`" + name.replace("`", "``") + "`")

        labels = set(label_cols)
        # drop a pre-existing last_updated: the fresh one is appended
        # below (re-applying latest_state to its own output must not
        # produce a duplicate column)
        projected = [
            F.coalesce(entry(c)["corrected_value"], qcol(c)).alias(c)
            if c in labels
            else qcol(c)
            for c in base.columns
            if c != "last_updated"
        ]
        ts_cols = [entry(lb)["timestamp"] for lb in label_cols]
        last_updated = (
            F.greatest(*ts_cols) if len(ts_cols) > 1 else ts_cols[0]
        ).alias("last_updated")
        return joined.select(*projected, last_updated)

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
