"""Similarity search over an embedding column (array<float>).

Two paths, per the scale doctrine:
- brute_force_topk: exact cosine top-k — the correctness baseline; one
  narrow pass + a top-k (TakeOrdered, no full sort). Fine when the
  query side is small (broadcast) even if the corpus is 100 TB.
- ivf_topk: IVF-style pruning — assign vectors to deterministic
  centroid buckets, probe only the closest buckets. The scale path:
  turns an all-pairs scan into an equi-join on bucket id.

All arithmetic is JVM-side (zip_with/aggregate folds) — no Python in
the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def brute_force_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of a single query vector against the corpus.
    Deterministic tie-break on id. The plan is scan -> project ->
    TakeOrderedAndProject: no shuffle of the corpus."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        corpus.select(
            F.col(id_col),
            cosine(F.col(vec_col), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def knn_join_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k per query via broadcast of the (small) query side + window
    rank. Returns (query_id, vec_id, cosine, rank)."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_assign(
    corpus: DataFrame,
    n_buckets: int = 16,
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF bucketing: centroid c_j has components
    sign(xxhash64(dim, j)) (random-hyperplane style); each vector joins
    its argmax-dot bucket. Pure JVM expressions."""
    dim = F.size(vec_col)

    def centroid_dot(j: int) -> Column:
        return F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.sequence(F.lit(0), dim - 1),
                lambda v, i: v.cast("double")
                * F.when(F.xxhash64(i, F.lit(j)) % 2 == 0, F.lit(1.0)).otherwise(
                    F.lit(-1.0)
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dots = F.array(*[centroid_dot(j) for j in range(n_buckets)])
    best = F.array_position(dots, F.array_max(dots)) - 1
    return corpus.withColumn("ivf_bucket", best.cast("int"))


def ivf_topk(
    corpus_assigned: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    n_buckets: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the n_probe closest IVF buckets for one query, exact cosine
    within them. Recall < 1 by construction; the bench compares it to
    brute_force_topk for recall@k."""
    dim = len(query_vec)
    # compute query->centroid dots with the same xxhash64 sign convention
    # via a 1-row DataFrame (keeps hash semantics identical to assignment)
    spark = corpus_assigned.sparkSession
    qdf = spark.createDataFrame(
        [(list(map(float, query_vec)),)], f"{vec_col}: array<double>"
    )

    def centroid_dot_for(j: int):
        return F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda v, i: v
                * F.when(F.xxhash64(i, F.lit(j)) % 2 == 0, F.lit(1.0)).otherwise(
                    F.lit(-1.0)
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dots_col = F.array(*[centroid_dot_for(j) for j in range(n_buckets)])
    row = qdf.select(dots_col.alias("dots")).head()
    order = sorted(range(n_buckets), key=lambda j: -row["dots"][j])
    probe = order[:n_probe]
    pruned = corpus_assigned.filter(F.col("ivf_bucket").isin(probe))
    return brute_force_topk(pruned, query_vec, k=k, vec_col=vec_col, id_col=id_col)
