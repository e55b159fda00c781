"""Domain-mixture sampling: temperature-weighted downsampling across
corpus sources (the multilingual/multi-domain rebalancing rule from
public LLM data pipelines — raising rare sources, damping dominant
ones, via w_s proportional to n_s^alpha).

Scale shape: the per-source statistics are one bounded aggregate
(n_sources rows), turned into per-source keep RATES on the driver and
broadcast-joined back; the keep decision itself is a pure per-row
expression — a deterministic 60-bit uniform from sha2(id:source)
compared against the source's rate. No sampleBy, no RNG state: the
same doc is kept or dropped on ANY cluster size, any partitioning,
and any engine with a sha256 builtin (the DuckDB oracle restates the
u-value bit-for-bit, same construction as linking.portable_hash60).

Not a reference-parity item: standard public practice (temperature
sampling in multilingual corpora, Conneau et al. 2020 §3; data-source
weighting in Gopher/Chinchilla), composed from the engine's portable
hash machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^60 — the u-value denominator (portable 60-bit hash range)
_U_DENOM = float(1 << 60)


def uniform_u(id_col: Column, source_col: Column) -> Column:
    """Deterministic uniform in [0, 1): the 60-bit prefix of
    sha256(id || ':' || source) over 2^60. Engine-portable: DuckDB
    restates it as CAST('0x' || substr(sha256(...), 1, 15) AS BIGINT)
    / 2^60."""
    digest = F.sha2(
        F.concat_ws(":", id_col.cast("string"), source_col), 256
    )
    return (
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("long") / _U_DENOM
    )


def source_rates(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """(source, n_docs, keep_rate): w_s = n_s^alpha / sum(n^alpha),
    target_s = target_frac * N * w_s docs, rate_s = min(1, target_s /
    n_s). Rates are rounded to 6 decimals so both engines compare the
    u-value against the exact same literal (pow() is libm-dependent in
    its last bits; the rounding makes the decision boundary portable).

    Bounded: one aggregate, n_sources rows — broadcast material."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("n_total"),
        F.sum(F.pow("n_docs", F.lit(alpha))).alias("pow_sum"),
    )
    rate = F.least(
        F.lit(1.0),
        F.round(
            F.lit(target_frac)
            * F.col("n_total")
            * F.pow("n_docs", F.lit(alpha))
            / (F.col("pow_sum") * F.col("n_docs")),
            6,
        ),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        source_col, "n_docs", rate.alias("keep_rate")
    )


def mixture_sample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """The sampled corpus: df rows whose deterministic u-value falls
    under their source's keep_rate (columns of df + keep_rate)."""
    rates = F.broadcast(
        source_rates(df, source_col, alpha, target_frac).drop("n_docs")
    )
    u = uniform_u(F.col(id_col), F.col(source_col))
    return df.join(rates, source_col).filter(u < F.col("keep_rate"))
