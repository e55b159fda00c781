"""Link-prediction evaluation over scored KG candidates — the ranking
metrics (MRR, Hits@k) that close the embedding-training loop the
engine's corpus generators open (negsample.negative_samples emits the
corrupted candidates, graph.random_walks the context corpus; this
module scores the result).

The reference evaluates its extractor with per-label P/R aggregates
(src/streamlit/app/training pipeline metrics); a KG engine evaluates
its *graph* the standard way instead: corrupt each positive triple,
score positive + corruptions with the model under test, and report
the positive's filtered rank — Bordes et al. NIPS'13 (TransE) protocol,
'filtered' meaning other true triples never push the positive down.

Determinism discipline (shared with pagerank/termstats): the rank is
an integer (a count of strictly-better negatives under the total order
score DESC, candidate ASC), and the reciprocal rank is fixed-point
``scale div rank`` — long sums commute exactly, so the emitted metrics
are bit-identical at any parallelism and restatable in DuckDB. Pass
integer scores (hash surrogates, quantized model logits) when the
oracle must match bit-for-bit; float scores still rank deterministically
thanks to the candidate tiebreak, but their means would be float.

Plan shape: ONE window pass over the candidate table partitioned by
the group key (each group is positive + its k corruptions — tiny), a
filter to positive rows, one global aggregate. No joins, no Python.
At 10^12 triples the candidate table is k+1 times the evaluated slice
and hash-partitions on the triple key — the window never sees a hot
partition because group size is exactly k+1 by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: reciprocal-rank unit = 1/SCALE (same fixed-point discipline as
#: graph.SCALE / termstats.SCALE)
SCALE = 1_000_000_000


def link_prediction_metrics(
    candidates: DataFrame,
    group_cols: tuple = ("subj", "pred", "obj"),
    candidate_col: str = "candidate",
    score_col: str = "score",
    is_pos_col: str = "is_pos",
    ks: tuple = (1, 3, 10),
    scale: int = SCALE,
) -> DataFrame:
    """candidates: one row per (evaluated positive, candidate entity) —
    the positive itself rides as a row with ``is_pos`` true, its
    corruptions false; ``group_cols`` identify the positive.

    Returns ONE row: (n_pos, mrr_fp, hits_<k>...) where
    ``rank = 1 + #negatives strictly ahead`` under (score DESC,
    candidate ASC) — the filtered-rank convention: positives sharing a
    group never depress each other — ``mrr_fp = sum(scale div rank)
    div n_pos`` (fixed-point, exact), and ``hits_k`` counts positives
    with rank <= k.
    """
    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"ks must be >= 1, got {ks!r}")
    gcols = [F.col(c) for c in group_cols]
    w = (
        Window.partitionBy(*gcols)
        .orderBy(F.col(score_col).desc(), F.col(candidate_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    neg_ahead = F.sum(
        F.when(~F.col(is_pos_col), F.lit(1)).otherwise(F.lit(0))
    ).over(w)
    ranked = candidates.select(
        F.col(is_pos_col).alias("_pos"),
        (F.coalesce(neg_ahead, F.lit(0)) + F.lit(1)).alias("rank"),
    ).filter(F.col("_pos"))
    aggs = [
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(F.expr(f"{scale} div rank")).alias("_sum_rr"),
    ] + [
        F.sum(F.when(F.col("rank") <= k, 1).otherwise(0)).alias(f"hits_{k}")
        for k in ks
    ]
    out = ranked.agg(*aggs)
    return out.select(
        "n_pos",
        F.expr("_sum_rr div n_pos").cast("long").alias("mrr_fp"),
        *[F.col(f"hits_{k}").cast("long") for k in ks],
    )


def clustering_metrics(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "node",
    pred_col: str = "cluster",
    gold_col: str = "cluster",
) -> DataFrame:
    """Pairwise clustering evaluation for entity canonicalization ->
    one row (n_items, n_pred_pairs, n_gold_pairs, n_both, precision_fp,
    recall_fp, f1_fp): the standard ER/coreference pairwise metric
    (Menestrina et al. VLDB'10 survey) — precision = |pairs co-clustered
    in BOTH| / |pred pairs|, recall = ... / |gold pairs|, over the
    items present in both assignments.

    The pair counts are computed WITHOUT enumerating pairs: co-cluster
    pairs of a cluster of size s are s*(s-1)/2, so every count is a
    size aggregate — n_pred_pairs from pred cluster sizes, n_gold_pairs
    from gold sizes, and n_both from the sizes of the INTERSECTION
    partition (group by pred-cluster x gold-cluster). Exact longs; the
    fixed-point ratios are integer division by SCALE. A 10^9-entity
    evaluation therefore costs three aggregates — no self-join, no
    quadratic blow-up, hot clusters stay single aggregation keys.
    """
    p = pred.select(F.col(id_col).alias("_id"), F.col(pred_col).alias("_pc"))
    g = gold.select(F.col(id_col).alias("_id"), F.col(gold_col).alias("_gc"))
    both = p.join(g, "_id")

    def pairs_of(df, *keys):
        return df.groupBy(*keys).agg(F.count("*").alias("_s")).agg(
            F.coalesce(
                F.sum(F.expr("_s * (_s - 1) div 2")), F.lit(0)
            ).alias("n")
        )

    n_items = both.agg(F.count("*").alias("n_items"))
    np_ = pairs_of(both, "_pc").withColumnRenamed("n", "n_pred_pairs")
    ng = pairs_of(both, "_gc").withColumnRenamed("n", "n_gold_pairs")
    nb = pairs_of(both, "_pc", "_gc").withColumnRenamed("n", "n_both")
    out = n_items.crossJoin(np_).crossJoin(ng).crossJoin(nb)
    prec = F.when(
        F.col("n_pred_pairs") > 0,
        F.expr(f"(n_both * {SCALE}) div n_pred_pairs"),
    ).otherwise(F.lit(0).cast("long"))
    rec = F.when(
        F.col("n_gold_pairs") > 0,
        F.expr(f"(n_both * {SCALE}) div n_gold_pairs"),
    ).otherwise(F.lit(0).cast("long"))
    out = out.withColumn("precision_fp", prec).withColumn("recall_fp", rec)
    return out.withColumn(
        "f1_fp",
        F.when(
            F.col("precision_fp") + F.col("recall_fp") > 0,
            F.expr("(2 * precision_fp * recall_fp) div (precision_fp + recall_fp)"),
        ).otherwise(F.lit(0).cast("long")),
    )
