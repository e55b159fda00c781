"""Bucketized time-range join: pairs of rows whose timestamps fall
within a fixed window of each other.

Why this operator exists: Spark plans a pure inequality join
(``abs(a.ts - b.ts) <= w``) as BroadcastNestedLoopJoin — O(n*m)
comparisons, a guaranteed scale-killer (DuckDB, by contrast, runs the
same predicate as an IEJoin, which is exactly why it can serve as the
oracle here). The standard distributed rewrite buckets time into
window-sized cells and turns the range predicate into an equi-join:
a row in bucket b can only be within ``w`` of rows in buckets
{b-1, b, b+1}, so one side explodes into its 3 candidate buckets and
the join key becomes the bucket id — hash-partitioned, AQE-skew-
splittable, no nested loop. The residual exact predicate filters the
3x candidate superset. This is the same block->verify discipline as
the LSH joins in operators/linking.py, with time as the blocking key.

Reference analogue: the corrections-timeline proximity views
(/root/reference/src/streamlit/app/utils/dashboard.py timeline tab)
computed pandas-side; generalized to a distributed two-stream window
match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_window_pairs(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    ts_col: str = "ts",
    window_sec: int = 1800,
) -> DataFrame:
    """All (left, right) pairs with |ts_left - ts_right| <= window_sec.

    The LEFT side explodes into its 3 candidate buckets (3x row fan-out
    on the smaller / filtered stream by convention — pass the smaller
    relation as ``left``); the RIGHT side keeps exactly one bucket row.
    Returns (left_id, right_id, dt_sec) with dt_sec = ts_right -
    ts_left in seconds (signed).
    """
    # ts columns are NTZ in the testdata; cast through LTZ for epoch
    l_epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    r_epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    lb = left.select(
        F.col(left_id).alias("_lid"), l_epoch.alias("_lts")
    ).withColumn(
        "_bucket",
        F.explode(
            F.array(
                (F.col("_lts") / window_sec).cast("long") - 1,
                (F.col("_lts") / window_sec).cast("long"),
                (F.col("_lts") / window_sec).cast("long") + 1,
            )
        ),
    )
    rb = right.select(
        F.col(right_id).alias("_rid"),
        r_epoch.alias("_rts"),
        (r_epoch / window_sec).cast("long").alias("_bucket"),
    )
    return (
        lb.join(rb, "_bucket")
        .filter(F.abs(F.col("_rts") - F.col("_lts")) <= window_sec)
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            (F.col("_rts") - F.col("_lts")).alias("dt_sec"),
        )
        # no distinct needed: the left row's 3 candidate buckets are 3
        # DISTINCT keys and the right row carries exactly one bucket,
        # so any (left, right) pair can join at most once
    )
