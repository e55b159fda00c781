"""Weighted sampling without replacement (Efraimidis-Spirakis 2006),
in the exactly-portable integer formulation.

ES draws a weighted sample of size k by giving every item the key
``u_i ** (1 / w_i)`` (u_i uniform) and keeping the k largest keys.
For INTEGER weights that key is distributionally identical to the
maximum of w_i independent uniforms — ``P(max <= x) = x ** w`` —
so the float-free restatement is::

    key_i = max_{j in 1..w_i} hash60(id_i, j)

with hash60 the engine-portable 60-bit sha256 prefix the repo already
uses everywhere a DuckDB oracle must restate hash values bit-for-bit
(operators/linking.portable_hash60). No ln/pow, no float rounding at
the rank boundary: the sample is an exact integer computation any
engine reproduces, which is what makes the full value oracle possible
(the same discipline as mixture_sample's portable keep decision and
rrf's integer-only fusion).

Scale shape: the key is a pure PROJECTION (zero shuffle — one
``transform`` + ``array_max`` per row, w sha256 rounds), and the
global top-k is Spark's TakeOrdered (per-partition heap + driver
merge of k rows per partition), never a full sort exchange. At 10^12
rows the cost is the scan plus k*n_partitions rows of driver merge.
Weights are capped (default 64) because work is O(sum w); a corpus
needing huge dynamic range should log-bucket weights first — at
web scale sampling temperature is what the weights encode, not
precision (Gopher / The Pile mix corpora with single-digit weight
ratios).

Reference analogue: the training scripts' class-balance resampling of
annotation records before fine-tune splits
(/root/reference/src/train/train.py data preparation); generalized to
the standard streaming weighted-sample operator a mixture pipeline
needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: replica-count guard: work is O(sum(w)), so force callers to
#: log-bucket pathological weights instead of silently exploding
MAX_WEIGHT = 64


def es_key(id_col: Column, weight_col: Column) -> Column:
    """The integer ES key: max over ``weight`` replica hashes of the
    portable 60-bit family (replica index appended behind \\x1f, the
    same seed framing as linking.portable_hash60)."""
    return F.array_max(
        F.transform(
            F.sequence(F.lit(1), weight_col.cast("int")),
            lambda j: F.conv(
                F.substring(
                    F.sha2(
                        F.concat_ws(
                            "\x1f", id_col.cast("string"), j.cast("string")
                        ),
                        256,
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
        )
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Top-k weighted sample without replacement: df's columns plus
    ``es_key``, the k rows with the largest keys (ties broken by id —
    a 60-bit collision, never observed, would otherwise make the
    boundary row engine-dependent). Weights must be integers in
    [1, MAX_WEIGHT]; rows with NULL / out-of-range weights raise via
    an assert-style filter so a bad weight column fails loudly rather
    than silently skewing the sample."""
    w = F.col(weight_col)
    guarded = df.withColumn(
        "_es_w",
        F.when(
            w.isNull() | (w < 1) | (w > MAX_WEIGHT),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"weighted_sample: weight out of [1, {MAX_WEIGHT}]: "
                    ),
                    w.cast("string"),
                )
            ).cast("long"),
        ).otherwise(w.cast("long")),
    )
    keyed = guarded.withColumn(
        "es_key", es_key(F.col(id_col), F.col("_es_w"))
    ).drop("_es_w")
    return keyed.orderBy(F.desc("es_key"), F.col(id_col).asc()).limit(k)


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Stratified ES sample: the top-k weighted sample WITHIN each
    group (the per-source quota form a mixture pipeline uses — k
    docs per source, weight-proportional within the source). Same
    integer key as weighted_sample; rank via row_number over ONE
    hash exchange on the group column. Returns df's columns +
    es_key + rk (1-based rank within the group)."""
    from pyspark.sql import Window

    w = F.col(weight_col)
    guarded = df.withColumn(
        "_es_w",
        F.when(
            w.isNull() | (w < 1) | (w > MAX_WEIGHT),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"weighted_sample: weight out of [1, {MAX_WEIGHT}]: "
                    ),
                    w.cast("string"),
                )
            ).cast("long"),
        ).otherwise(w.cast("long")),
    )
    keyed = guarded.withColumn(
        "es_key", es_key(F.col(id_col), F.col("_es_w"))
    ).drop("_es_w")
    win = Window.partitionBy(group_col).orderBy(
        F.desc("es_key"), F.col(id_col).asc()
    )
    return keyed.withColumn("rk", F.row_number().over(win)).filter(
        F.col("rk") <= k
    )
