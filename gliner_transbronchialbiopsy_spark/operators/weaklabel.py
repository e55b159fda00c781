"""Weak-supervision labeling — programmatic label functions + a
deterministic vote aggregator (the Snorkel/data-programming pattern,
Ratner et al. VLDB'18, restricted to the deterministic core a
distributed engine can make exactly reproducible).

A label function (LF) is a Column expression over the document row
evaluating to a label string or NULL (= abstain) — regex/keyword/
length heuristics, the same closed-catalog style as the reference's
pattern NER (functions/patterns.py generalizes per-entity regexes;
this generalizes per-DOCUMENT weak labels). ``apply_label_functions``
evaluates every LF in one projection pass (zero shuffles, whole-stage
codegen); ``vote`` aggregates the long-form votes into one label per
doc by weighted majority with a TOTAL-ORDER tie-break, so the output
is bit-identical at any parallelism — unlike the probabilistic label
model, which needs SGD and is out of deterministic-oracle scope (the
docstring of the reference's training pipeline notes the same
determinism constraint for its seeds).

Distributed shape: LF evaluation is a projection on the doc scan;
vote is one explode (rows = docs x LFs, bounded by the LF catalog
size) and one groupBy(doc) aggregate with map-side partial combine.
Per-LF weights ride in the exploded rows as literals. Nothing
collects; the LF catalog is query-literal-sized.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCALE = 1_000_000_000


def apply_label_functions(
    df: DataFrame, lfs: Mapping[str, Column], id_col: str = "doc_id"
) -> DataFrame:
    """-> long-form votes (id_col, lf, label): one row per NON-abstain
    LF firing. NULL label = abstain = no row (Snorkel's convention)."""
    if not lfs:
        raise ValueError("empty label-function catalog")
    votes = F.array(
        *[
            F.struct(F.lit(name).alias("lf"), col.cast("string").alias("label"))
            for name, col in lfs.items()
        ]
    )
    return (
        df.select(F.col(id_col), F.explode(votes).alias("v"))
        .select(id_col, F.col("v.lf").alias("lf"), F.col("v.label").alias("label"))
        .filter(F.col("label").isNotNull())
    )


def vote(
    votes: DataFrame,
    id_col: str = "doc_id",
    weights: Mapping[str, int] | None = None,
) -> DataFrame:
    """Weighted-majority label per doc -> (id_col, label, n_votes,
    weight, n_lfs, confidence_fp).

    weights maps LF name -> integer weight (default 1 each; use e.g.
    per-LF accuracy estimates scaled to ints). The winner is elected
    by (summed weight DESC, label ASC) — a total order, so the choice
    is deterministic and engine-portable. confidence_fp = winner
    weight * 1e9 div total weight over the doc's non-abstaining LFs.
    Docs where every LF abstained have no votes and emit no row (the
    unlabeled pool)."""
    w = (
        F.create_map(
            *[x for k, v in (weights or {}).items() for x in (F.lit(k), F.lit(int(v)))]
        )[F.col("lf")]
        if weights
        else F.lit(1)
    )
    per_label = (
        votes.withColumn("_w", F.coalesce(w, F.lit(1)).cast("long"))
        .groupBy(id_col, "label")
        .agg(F.count("*").alias("n_votes"), F.sum("_w").alias("weight"))
    )
    totals = per_label.groupBy(id_col).agg(
        F.sum("n_votes").alias("n_lfs"), F.sum("weight").alias("_wtot")
    )
    ranked = per_label.withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(
                F.desc("weight"), F.asc("label")
            )
        ),
    )
    return (
        ranked.filter(F.col("_rk") == 1)
        .join(totals, id_col)
        .select(
            id_col,
            "label",
            "n_votes",
            "weight",
            "n_lfs",
            F.expr(f"(weight * {SCALE}) div _wtot").alias("confidence_fp"),
        )
    )
