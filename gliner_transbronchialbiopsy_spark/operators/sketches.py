"""Count-Min sketch frequency estimation (Cormode & Muthukrishnan,
J. Algorithms 55(1) 2005) — the bounded-memory, MERGEABLE frequency
summary a 100 TB token stream needs: the sketch is a d×w grid of
exact long cell counts, each cell a plain SUM, so per-partition
sketches combine by cell-wise addition (Spark's partial aggregation
IS the sketch merge) and the whole summary broadcasts at d·w longs
regardless of vocabulary size.

Estimates are deterministic: every cell count is an order-free long
sum and the point estimate is min over d cells, so results are
bit-identical at any parallelism and restatable verbatim in SQL. The
classic guarantee holds per sketch: est >= true always (counts only
collide upward), and est <= true + εN with probability 1−δ for
w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Hashing: the d rows use the portable sha256-derived family
(linking.portable_hash60 with per-row seeds — seed appended behind a
separator inside the digest input, so rows are independent; the
xxhash64 seed-ordering trap documented in operators/linking.py does
not arise for a cryptographic family). Production can swap
xxhash64(lit(i), col) per the seed-first discipline; the portable
family is the oracle-checked default here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import linking
from .textstats import word_tokens


def cms_build(
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """One counting pass -> the sketch as (row, bucket, c) cells
    (missing cells are zero). d·w rows — broadcastable."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    rows = None
    for i in range(depth):
        r = items.select(
            F.lit(i).alias("row"),
            F.pmod(linking.portable_hash60(F.col(col), seed=i), F.lit(width))
            .cast("int")
            .alias("bucket"),
        )
        rows = r if rows is None else rows.unionAll(r)
    return rows.groupBy("row", "bucket").agg(F.count("*").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate every candidate against the sketch ->
    candidates + est_c = min over the d cells. The sketch joins
    broadcast (d·w rows); each candidate probes d cells via one
    union-projection + join + min-agg — no per-row Python."""
    probes = None
    for i in range(depth):
        p = candidates.select(
            F.col(col),
            F.lit(i).alias("row"),
            F.pmod(linking.portable_hash60(F.col(col), seed=i), F.lit(width))
            .cast("int")
            .alias("bucket"),
        )
        probes = p if probes is None else probes.unionAll(p)
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est_c")
    )


def heavy_hitters_check(
    df: DataFrame,
    text_col: str = "text",
    k: int = 30,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Demonstration harness: exact top-k tokens by true count vs
    their Count-Min estimates -> (token, true_c, est_c, overcount).
    overcount = est_c − true_c is >= 0 ALWAYS (the one-sided CMS
    guarantee — asserted by the oracle row-for-row); its size shows
    the ε·N collision noise at the chosen width."""
    toks = df.select(
        F.explode(word_tokens(F.col(text_col))).alias("token")
    )
    true_counts = toks.groupBy("token").agg(F.count("*").alias("true_c"))
    top = true_counts.orderBy(
        F.desc("true_c"), F.col("token").asc()
    ).limit(int(k))
    sketch = cms_build(toks, "token", depth=depth, width=width)
    est = cms_estimate(sketch, top.select("token"), "token",
                       depth=depth, width=width)
    return (
        top.join(est, "token")
        .select(
            "token",
            "true_c",
            "est_c",
            (F.col("est_c") - F.col("true_c")).cast("long").alias("overcount"),
        )
        .orderBy(F.desc("true_c"), F.col("token").asc())
    )


def linear_counting(
    items: DataFrame,
    col: str,
    group: str | None = None,
    m: int = 1024,
) -> DataFrame:
    """Linear-counting distinct estimation (Whang, Vander-Zanden &
    Taylor, TODS 15(2) 1990) -> per group: (n_occupied,
    est_distinct): hash every value into an m-bucket bitmap and
    estimate n ≈ −m·ln(V) from the empty fraction V — the
    bounded-memory cardinality sketch that predates HLL and, unlike
    HLL, has an EXACTLY restatable state: the occupied-bucket set is
    a plain distinct aggregate (deterministic integers, mergeable by
    union — per-partition bitmaps combine exactly like the Count-Min
    cells), and only the derived estimate is a double (same IEEE ln
    on identical integer inputs on any engine).

    Accuracy holds while the bitmap stays unsaturated (standard
    guidance m >~ n; the estimate diverges as n_occupied -> m and is
    returned as NULL at full saturation, where ln(0) is undefined).
    Portable sha256 bucket hash (the sketch family discipline);
    production swaps xxhash64."""
    if m < 1:
        raise ValueError("m must be >= 1")
    keys = [group] if group else []
    occ = (
        items.select(
            *keys,
            F.pmod(linking.portable_hash60(F.col(col)), F.lit(m))
            .cast("int")
            .alias("bucket"),
        )
        .groupBy(*keys)
        .agg(F.countDistinct("bucket").alias("n_occupied"))
    )
    md = float(m)
    return occ.select(
        *keys,
        "n_occupied",
        F.when(
            F.col("n_occupied") < m,
            F.round(
                -F.lit(md)
                * F.log((F.lit(md) - F.col("n_occupied")) / F.lit(md)),
                4,
            ),
        ).alias("est_distinct"),
    )
