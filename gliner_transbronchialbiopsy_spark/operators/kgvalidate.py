"""SHACL-lite constraint validation over materialized KG triples.

The reference enforces its closed label catalog and grade shapes at
extraction time (config.py's 14-label whitelist; the A0-A4/B0-B2 grade
regexes in utils/text_normalizer.py) — i.e. constraints live INSIDE
the extractor. At KG scale constraints must also run as a standalone
audit over the emitted (subj, pred, obj) table: triples arrive from
many pipeline versions/backfills, and "which rows violate the ontology
NOW" is a query, not an extractor property.

Two rule families (the functional core of SHACL node/property shapes):

- **object shape**: for a predicate with a declared ``obj_pattern``,
  every object must fully match it (anchored rlike).
- **functional cardinality**: a predicate declared ``functional`` may
  bind at most one DISTINCT object per subject (the classic
  owl:FunctionalProperty audit — e.g. one rejection grade per biopsy
  report).

Plan shape: the rules table is tiny (one row per predicate) and
broadcast onto the triple scan; shape checking is a pure projection
after that map-side join. The cardinality audit is one
groupBy(subj, pred) with a distinct-count — a single wide shuffle on
the (subj, pred) key, map-side partials first. Output is one row per
(subj, pred, violation) with a count, never one row per good triple,
so the result stays audit-sized at 10^12 triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def constraint_violations(
    triples: DataFrame,
    rules: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Audit ``triples`` against ``rules(pred, functional, obj_pattern)``.

    Returns (subj, pred, violation, n_bad):
    - violation='obj_shape': n_bad = number of triple rows whose obj
      fails the anchored pattern (pattern rules only).
    - violation='functional_cardinality': n_bad = number of DISTINCT
      objects bound (>1), for functional predicates only.
    Predicates with no rule row pass silently (open-world default).
    """
    r = F.broadcast(
        rules.select(
            F.col("pred"),
            F.col("functional").cast("boolean").alias("functional"),
            F.col("obj_pattern"),
        )
    )
    t = triples.select(
        F.col(subj).alias("subj"), F.col(pred).alias("pred"), F.col(obj).alias("obj")
    ).join(r, "pred")  # inner: unruled predicates drop out immediately

    anchored = F.concat(F.lit("^(?:"), F.col("obj_pattern"), F.lit(")$"))
    shape = (
        t.filter(
            F.col("obj_pattern").isNotNull()
            & ~F.regexp_like(F.col("obj"), anchored)
        )
        .groupBy("subj", "pred")
        .agg(F.count("*").alias("n_bad"))
        .select("subj", "pred", F.lit("obj_shape").alias("violation"), "n_bad")
    )
    card = (
        t.filter(F.col("functional"))
        .groupBy("subj", "pred")
        .agg(F.countDistinct("obj").alias("n_bad"))
        .filter(F.col("n_bad") > 1)
        .select(
            "subj", "pred", F.lit("functional_cardinality").alias("violation"), "n_bad"
        )
    )
    return shape.unionAll(card)


def triple_diff(
    old: DataFrame,
    new: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Snapshot-to-snapshot KG diff: which assertions appeared and
    which disappeared between two pipeline runs (backfill audits,
    extractor-version regression checks — the KG analogue of the
    reference's corrections timeline, operators/corrections.py).

    Set semantics on (subj, pred, obj): duplicates within a snapshot
    collapse, so the diff is assertion-level, not row-level. Output is
    (subj, pred, obj, change) with change in {'added', 'removed'} —
    diff-sized, never snapshot-sized.

    Plan shape: two left_anti hash joins on the full triple key, each
    a single shuffle of the (already deduped) snapshots; at 10^12
    triples both sides hash-partition on the same key so AQE can
    co-plan them. No window, no Python.
    """
    o = old.select(
        F.col(subj).alias("subj"), F.col(pred).alias("pred"), F.col(obj).alias("obj")
    ).distinct()
    n = new.select(
        F.col(subj).alias("subj"), F.col(pred).alias("pred"), F.col(obj).alias("obj")
    ).distinct()
    key = ["subj", "pred", "obj"]
    added = n.join(o, key, "left_anti").withColumn("change", F.lit("added"))
    removed = o.join(n, key, "left_anti").withColumn("change", F.lit("removed"))
    return added.unionAll(removed)


def characteristic_sets(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
) -> DataFrame:
    """Characteristic sets (Neumann & Moerkotte, ICDE'11) ->
    (cs, n_preds, n_subjects, n_triples): group subjects by the SET of
    predicates they carry — the structural "schema profile" of a
    schemaless triple table. The published use is cardinality
    estimation for SPARQL join ordering; operationally it is also the
    KG-construction audit that surfaces entity shapes (how many
    subjects look like a full document record vs a fragment) without
    any declared schema.

    cs is the sorted distinct predicate list joined with ','
    (predicates are a closed catalog, so the set is tiny and the
    string form is a stable, engine-portable group key). Exact counts
    only — deterministic at any parallelism.

    Plan shape: one distinct on (subj, pred) feeding a per-subject
    collect_set (bounded by the predicate catalog, NOT the corpus — a
    subject cannot repeat a predicate after the distinct), one count
    per subject for n_triples, then a catalog-sized re-aggregation on
    the cs string. Two shuffles on subj, one on cs."""
    t = triples.select(F.col(subj).alias("_s"), F.col(pred).alias("_p"))
    per_subj = (
        t.groupBy("_s")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_set("_p"))
            ).alias("cs"),
            F.size(F.collect_set("_p")).cast("long").alias("n_preds"),
            F.count("*").alias("_n_triples"),
        )
    )
    return (
        per_subj.groupBy("cs", "n_preds")
        .agg(
            F.count("*").alias("n_subjects"),
            F.sum("_n_triples").alias("n_triples"),
        )
    )
