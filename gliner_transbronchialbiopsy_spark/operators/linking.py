"""Stage 2 — entity linking via MinHash-LSH blocking (J4).

The reference links implicitly by exact string collection per label
(entity_processor.py:68-71). At 10^12 rows exact grouping misses
near-identical surface variants, so we generalize: block candidate
pairs with banded MinHash over char-3-gram shingles (an equi-join on
(label, band_id, band_hash) — a plain shuffle-hash join Catalyst can
pick), then verify candidates with exact Jaccard computed from the
shingle sets. All pair generation is join-shaped; no cartesian product
ever materializes.

Skew notes: duplicate/boilerplate surfaces collapse to one row by
dropDuplicates before signatures (the M3 discipline), and residual hot
bands are handled by AQE skew-join (session default) — banding itself
already splits one hot surface across `bands` different join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_shingles(col, n: int = 3):
    """Distinct char n-grams of lower(col) as an array column (JVM-side:
    sequence + transform + substring — no Python)."""
    lowered = F.lower(col)
    length = F.length(lowered)
    idx = F.sequence(F.lit(1), F.greatest(length - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: lowered.substr(i, F.lit(n)))
    )


def minhash_signatures(
    surfaces: DataFrame,
    text_col: str = "text",
    key_cols: tuple[str, ...] = ("label",),
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """One row per distinct (key_cols, text) with `sig: array<bigint>`.

    MinHash h_i(S) = min over shingles s of xxhash64(s, i) — computed by
    exploding shingles once and taking num_hashes mins in a single
    aggregation (one shuffle)."""
    base = surfaces.select(*key_cols, text_col).dropDuplicates(
        [*key_cols, text_col]
    )
    exploded = base.select(
        *key_cols,
        F.col(text_col),
        F.explode(char_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = exploded.groupBy(*key_cols, text_col).agg(*aggs)
    return sig.select(
        *key_cols,
        text_col,
        F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    text_col: str = "text",
    key_cols: tuple[str, ...] = ("label",),
    bands: int = 4,
) -> DataFrame:
    """Banded LSH: split each signature into `bands` slices, equi-join on
    (key_cols, band_id, band_hash). Returns distinct candidate pairs
    (key_cols, text_a, text_b) with text_a < text_b."""
    num_hashes = bands  # re-derived below from actual array length
    _ = num_hashes
    sig_len = F.size("sig")
    rows_per_band = (sig_len / bands).cast("int")
    banded = signatures.select(
        *key_cols,
        F.col(text_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    "sig", b * rows_per_band + 1, rows_per_band
                                ),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select(*key_cols, text_col, "band.band_id", "band.band_hash")

    left = banded
    right = banded.select(
        *[F.col(c).alias(f"_r_{c}") for c in (*key_cols, text_col)],
        F.col("band_id").alias("_r_band_id"),
        F.col("band_hash").alias("_r_band_hash"),
    )
    cond = (
        (F.col("band_id") == F.col("_r_band_id"))
        & (F.col("band_hash") == F.col("_r_band_hash"))
        & (F.col(text_col) < F.col(f"_r_{text_col}"))
    )
    for c in key_cols:
        cond = cond & (F.col(c) == F.col(f"_r_{c}"))
    return (
        left.join(right, cond, "inner")
        .select(
            *key_cols,
            F.col(text_col).alias("text_a"),
            F.col(f"_r_{text_col}").alias("text_b"),
        )
        .dropDuplicates([*key_cols, "text_a", "text_b"])
    )


def verified_edges(
    pairs: DataFrame,
    key_cols: tuple[str, ...] = ("label",),
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Exact char-n-gram Jaccard on candidate pairs (JVM array ops),
    keeping pairs >= threshold as similarity edges."""
    a = char_shingles(F.col("text_a"), shingle_n)
    b = char_shingles(F.col("text_b"), shingle_n)
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return pairs.withColumn("jaccard", jac).filter(
        F.col("jaccard") >= jaccard_threshold
    )


def link_surfaces(
    mentions: DataFrame,
    text_col: str = "text",
    key_cols: tuple[str, ...] = ("label",),
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """End-to-end blocking+verification: mentions -> similarity edges
    (key_cols, text_a, text_b, jaccard)."""
    sigs = minhash_signatures(
        mentions, text_col, key_cols, num_hashes=num_hashes, shingle_n=shingle_n
    )
    pairs = lsh_candidate_pairs(sigs, text_col, key_cols, bands=bands)
    return verified_edges(
        pairs, key_cols, shingle_n=shingle_n, jaccard_threshold=jaccard_threshold
    )
