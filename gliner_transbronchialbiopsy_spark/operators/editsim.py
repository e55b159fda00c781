"""Edit-distance similarity self-join (PassJoin, Li et al. VLDB'11):
all string pairs within Levenshtein distance d, without the O(n^2)
nested loop Spark would otherwise plan for the inequality predicate.

The pigeonhole blocking: split every string into d+1 contiguous
segments. If ed(a, b) <= d, at least one segment of ``a`` contains no
edit, so it appears VERBATIM in ``b``, shifted by at most the net
length change of the edits before it (<= d). The index side emits
each string's d+1 segments keyed by (its length, segment index,
segment text); the probe side emits, for every candidate partner
length la in [len-d, len+d] and every allowed shift in [-d, +d], the
substring of itself that would align with that segment — an
equi-join on (la, i, chunk) then replaces the edit-distance
inequality, and the exact ``levenshtein() <= d`` predicate filters
the candidate superset. Same block->verify discipline as the LSH
joins (operators/linking.py) and the time-bucket range join
(operators/ranges.time_window_pairs), with the pigeonhole segment as
the blocking key.

Scale shape: per row the index emits d+1 rows and the probe at most
(2d+1)^2 * (d+1) rows — constant fan-out, one hash-partitioned
equi-join on high-entropy segment keys, everything JVM expressions
(substring/levenshtein are codegen builtins; no UDF). Detection is
guaranteed in EACH direction independently (a's untouched segment is
probed in b and vice versa), so the candidate relation finds every
pair twice and the min/max projection dedups. Low-entropy corpora
(shared prefixes — think 'Customer#0000...') degrade the blocking
toward the cross product like any prefix scheme; ``max_bucket``
drops over-popular segment keys with documented lower-bound
semantics, the same cap discipline as the LSH bucket caps.

Reference analogue: the correction UI's fuzzy suggestion matching of
edited entity surfaces against known vocabulary
(/root/reference/src/streamlit/app/utils/dashboard.py corrections
tab); generalized to the standard string-similarity join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seg_bounds(d: int):
    """Segment (start, length) column builders for a given string
    length column L (1-based starts). Balanced split: the first
    ``L % (d+1)`` segments are one char longer."""

    def bounds(L: Column, i: int) -> tuple[Column, Column]:
        n = d + 1
        base = (L / n).cast("int")
        rem = L % n
        # length of segment i
        li = base + F.when(F.lit(i) < rem, 1).otherwise(0)
        # start = 1 + sum of lengths of segments 0..i-1
        #       = 1 + i*base + min(i, rem)
        pi = (
            F.lit(1)
            + F.lit(i) * base
            + F.least(F.lit(i), rem.cast("int"))
        )
        return pi.cast("int"), li.cast("int")

    return bounds


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    d: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """All unordered pairs (id_a < id_b) with levenshtein <= d.
    Returns (id_a, id_b, ed). NULL strings and strings shorter than
    d+1 are excluded: the pigeonhole needs d+1 NON-EMPTY segments (a
    length-1 string at d=1 can have its only content segment edited,
    leaving just the vacuous empty segment — undetectable, and empty
    segment keys would bucket every short string together anyway).
    Strings of length <= d are within d of a bounded trivial set;
    handle them with a direct broadcast check if they matter.

    ``max_bucket``: if set, segment keys indexing more than this many
    strings are dropped BEFORE the join — the result becomes a
    documented lower bound (exactly the LSH bucket-cap semantics);
    leave None for exact results on high-entropy strings."""
    if d < 1:
        raise ValueError("edit_distance_pairs: d must be >= 1")
    bounds = _seg_bounds(d)
    s = (
        df.select(
            F.col(id_col).alias("_id"), F.col(str_col).alias("_s")
        )
        .filter(F.col("_s").isNotNull() & (F.length("_s") >= d + 1))
        .withColumn("_len", F.length("_s").cast("int"))
    )

    # index side: the d+1 segments of each string, keyed by own length
    idx = (
        s.withColumn(
            "_segs",
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("seg"),
                        F.col("_s").substr(*bounds(F.col("_len"), i)).alias(
                            "chunk"
                        ),
                    )
                    for i in range(d + 1)
                ]
            ),
        )
        .select("_id", "_s", "_len", F.explode("_segs").alias("_e"))
        .select(
            F.col("_id").alias("id_a"),
            F.col("_s").alias("s_a"),
            F.col("_len").alias("la"),
            F.col("_e.seg").alias("seg"),
            F.col("_e.chunk").alias("chunk"),
        )
    )
    if max_bucket is not None:
        cen = idx.groupBy("la", "seg", "chunk").agg(
            F.count("*").alias("_n")
        )
        keep = cen.filter(F.col("_n") <= max_bucket).drop("_n")
        idx = idx.join(F.broadcast(keep), ["la", "seg", "chunk"])

    # probe side: for each partner length la in [len-d, len+d], each
    # segment i, each shift in [-d, d]: the aligned substring of b
    probe_structs = []
    for delta in range(-d, d + 1):
        la = F.col("_len") + delta
        for i in range(d + 1):
            pi, li = bounds(la, i)
            for shift in range(-d, d + 1):
                start = pi + shift
                valid = (
                    (la >= 1)
                    & (start >= 1)
                    & (start + li - 1 <= F.col("_len"))
                    & (li >= 1)
                )
                probe_structs.append(
                    F.when(
                        valid,
                        F.struct(
                            la.cast("int").alias("la"),
                            F.lit(i).alias("seg"),
                            F.col("_s").substr(start, li).alias("chunk"),
                        ),
                    )
                )
    probe = (
        s.withColumn(
            "_cands",
            F.array_distinct(
                F.filter(
                    F.array(*probe_structs), lambda c: c.isNotNull()
                )
            ),
        )
        .select("_id", "_s", F.explode("_cands").alias("_c"))
        .select(
            F.col("_id").alias("id_b"),
            F.col("_s").alias("s_b"),
            F.col("_c.la").alias("la"),
            F.col("_c.seg").alias("seg"),
            F.col("_c.chunk").alias("chunk"),
        )
    )

    cand = (
        idx.join(probe, ["la", "seg", "chunk"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.col("s_a"),
            F.col("s_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.withColumn(
        "ed", F.levenshtein("s_a", "s_b")
    ).filter(F.col("ed") <= d).select("id_a", "id_b", "ed")
