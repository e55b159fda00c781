"""Deterministic negative sampling for KG-embedding training data.

Every KG-embedding trainer (TransE/DistMult/ComplEx lineage, Bordes et
al. NeurIPS 2013) consumes (positive triple, corrupted triple) pairs:
the object is replaced by a random object drawn from the same
predicate's object pool. At 10^12 triples the naive formulations both
fail: per-row Python RNG is irreproducible AND slow, and collecting a
per-predicate object array to the driver explodes on entity-valued
predicates (billions of distinct objects). The scalable shape:

1. index the object pool ONCE — distinct (pred, obj) with a dense
   row_number per predicate (one vocab-sized window);
2. draw = hash, not RNG: idx0 = H(subj, pred, obj, i) mod n_obj(pred)
   — deterministic, seedable by the sample index i, identical at any
   parallelism (the same discipline as mixture sampling's
   portable-hash keep decision);
3. resolve the draw with an equi-join on (pred, idx) — a hash join
   against the index table, never a broadcast array;
4. collision with the true object shifts to (idx0+1) mod n_obj — the
   second candidate is fetched by the SAME join pattern, and with
   n_obj > 1 at most one candidate can collide, so every emitted
   negative is guaranteed != the positive object.

Predicates with a single distinct object admit no negative and are
dropped (n_obj > 1 filter). Production hash is xxhash64 (seed-FIRST:
xxhash64(lit(i), ...) — value-first seeding correlates the family);
portable_hash=True swaps in the sha256-derived 60-bit family so the
contract query has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import linking

_SEP = "\x1f"


def negative_samples(
    triples: DataFrame,
    k: int = 1,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    portable_hash: bool = False,
) -> DataFrame:
    """k corrupted objects per distinct positive triple.

    Returns (subj, pred, obj, i, neg_obj): i in [0, k) is the sample
    index, neg_obj a same-predicate object != obj, chosen by
    deterministic hashing. Triples whose predicate has one distinct
    object emit nothing.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    t = triples.select(
        F.col(subj).alias("subj"), F.col(pred).alias("pred"), F.col(obj).alias("obj")
    ).distinct()

    pool = t.select("pred", "obj").distinct()
    w = Window.partitionBy("pred").orderBy("obj")
    idx = pool.select(
        "pred", F.col("obj").alias("pool_obj"), (F.row_number().over(w) - 1).alias("idx")
    )
    sizes = idx.groupBy("pred").agg(F.count("*").alias("n_obj"))

    base = (
        t.join(sizes, "pred")
        .filter(F.col("n_obj") > 1)
        .withColumn("i", F.explode(F.array(*[F.lit(i) for i in range(k)])))
    )
    if portable_hash:
        h = linking.portable_hash60(
            F.concat_ws(_SEP, "subj", "pred", "obj", F.col("i").cast("string"))
        )
    else:
        h = F.xxhash64(F.col("i"), F.col("subj"), F.col("pred"), F.col("obj"))
    base = base.withColumn("idx0", F.pmod(h, F.col("n_obj")))

    c0 = base.join(
        idx.withColumnRenamed("idx", "idx0").withColumnRenamed("pool_obj", "obj0"),
        ["pred", "idx0"],
    )
    c0 = c0.withColumn("idx1", F.pmod(F.col("idx0") + 1, F.col("n_obj")))
    c1 = c0.join(
        idx.withColumnRenamed("idx", "idx1").withColumnRenamed("pool_obj", "obj1"),
        ["pred", "idx1"],
    )
    return c1.select(
        "subj",
        "pred",
        "obj",
        "i",
        F.when(F.col("obj0") == F.col("obj"), F.col("obj1"))
        .otherwise(F.col("obj0"))
        .alias("neg_obj"),
    )
