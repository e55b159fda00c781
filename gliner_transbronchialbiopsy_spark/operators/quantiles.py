"""Exact distributed quantiles and quantile-clipped (winsorized)
aggregation.

The reference computes score distributions driver-side with pandas
``describe()``/``quantile()`` over the full result frame
(/root/reference/src/streamlit/app/utils/charts.py score-distribution
panels); that is a single-node sort of everything. Here the same
statistics are group-local Spark aggregates:

- ``group_quantiles`` uses Spark's exact ``percentile`` aggregate
  (JVM-side, sort-based within each group) so small-scale results are
  bit-comparable with DuckDB's ``quantile_cont`` — both define the
  p-quantile of n sorted values as linear interpolation at rank
  ``p*(n-1)``.
- At 100 TB an exact per-group sort is only acceptable when groups are
  many and individually modest (the agg is a hash-partitioned shuffle
  on the group key; each group sorts locally). For monster groups the
  production path is ``approx_percentile(col, probs, accuracy)`` —
  same call shape, mergeable sketch, no group-local sort; callers
  switch with ``exact=False``. Oracles pin the exact path.

Winsorized aggregation (clip at [p_lo, p_hi] then aggregate) is the
standard robust-mean used in corpus quality scoring; it composes
``group_quantiles`` with a broadcast join back onto the fact rows —
the quantile side is one row per group, so no second wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    probs: list[float],
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantiles, one output column per requested prob
    (``q_25`` for 0.25 etc.). ``exact=True`` -> Spark ``percentile``
    (linear interpolation at rank p*(n-1), matching DuckDB
    quantile_cont); ``exact=False`` -> mergeable ``approx_percentile``
    sketch for 100 TB groups."""
    fn = (
        (lambda c: F.percentile(c, F.lit(probs)))
        if exact
        else (lambda c: F.approx_percentile(c, F.lit(probs), F.lit(accuracy)))
    )
    agg = df.groupBy(*keys).agg(fn(F.col(value_col)).alias("_qs"))
    cols = [F.col(k) for k in keys] + [
        F.col("_qs")[i].alias(f"q_{int(round(p * 100)):02d}")
        for i, p in enumerate(probs)
    ]
    return agg.select(*cols)


def winsorized_stats(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorized mean/sum: clip ``value_col`` into the
    group's [lo, hi] exact quantile band, then aggregate. Two passes
    over the fact table but only ONE wide shuffle on the group key —
    the quantile frame is one row per group and broadcast back."""
    q = group_quantiles(df, keys, value_col, [lo, hi]).withColumnRenamed(
        f"q_{int(round(lo * 100)):02d}", "_q_lo"
    ).withColumnRenamed(f"q_{int(round(hi * 100)):02d}", "_q_hi")
    clipped = df.join(F.broadcast(q), keys).withColumn(
        "_clipped",
        F.least(F.greatest(F.col(value_col), F.col("_q_lo")), F.col("_q_hi")),
    )
    return clipped.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.round(F.avg("_clipped"), 4).alias("winsor_mean"),
        F.round(F.sum("_clipped"), 2).alias("winsor_sum"),
        F.round(F.first("_q_lo"), 4).alias("q_lo"),
        F.round(F.first("_q_hi"), 4).alias("q_hi"),
    )
