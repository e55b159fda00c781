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


def ivf_assign_centroids(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared-L2 argmin;
    first-match tie-break toward the lower bucket index). Centroids are
    tiny relative to the corpus, so they travel as broadcast array
    LITERALS inside one JVM expression — the corpus itself never
    shuffles for the assignment (a narrow map). For very large
    n_buckets*dim (>~100k literal nodes) switch to a crossJoin against
    a broadcast centroid DataFrame instead; at IVF-typical sizes the
    literal form keeps everything in whole-stage codegen."""

    def dist2(c: list[float]) -> Column:
        arr = F.array(*[F.lit(float(x)) for x in c])
        return F.aggregate(
            F.zip_with(
                F.col(vec_col), arr,
                lambda v, w: (v.cast("double") - w) * (v.cast("double") - w),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dists = F.array(*[dist2(c) for c in centroids])
    best = F.array_position(dists, F.array_min(dists)) - 1
    return corpus.withColumn("ivf_bucket", best.cast("int"))


def ivf_train_kmeans(
    corpus: DataFrame,
    n_buckets: int = 16,
    iterations: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Lloyd's k-means over the embedding column as an iterative
    DataFrame loop (the same driver-loop discipline as the star-CC
    operator): per round, one narrow assignment pass (broadcast
    centroid literals) and one aggregation computing per-bucket
    element-wise means via posexplode -> groupBy(bucket, pos).avg. Only
    n_buckets x dim aggregated means ever reach the driver; the corpus
    stays distributed. Deterministic end to end: init is the n_buckets
    vectors with the smallest ids, assignment ties break toward the
    lower bucket, empty buckets retain their previous centroid.

    Trained centroids replace ivf_assign's hash-sign pseudo-centroids
    where recall matters: real centroids track the data distribution,
    so the same n_probe probes capture more of the true neighbors."""
    init_rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(n_buckets).collect()
    )
    centroids = [list(map(float, r[vec_col])) for r in init_rows]
    for _ in range(iterations):
        assigned = ivf_assign_centroids(corpus, centroids, vec_col)
        means = (
            assigned.select(
                "ivf_bucket", F.posexplode(vec_col).alias("pos", "val")
            )
            .groupBy("ivf_bucket", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty buckets keep old
        by_bucket: dict[int, dict[int, float]] = {}
        for r in means:
            by_bucket.setdefault(r["ivf_bucket"], {})[r["pos"]] = r["m"]
        for b, comp in by_bucket.items():
            new_centroids[b] = [comp[i] for i in range(len(comp))]
        centroids = new_centroids
    return centroids


def ivf_topk_kmeans(
    corpus_assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the n_probe centroids nearest the query (plain-python
    distance over the tiny centroid list — no Spark job), then exact
    cosine within the probed buckets. Full probe (n_probe =
    len(centroids)) is provably exact top-k, which is what the
    sim_ivf_kmeans contract oracle checks; partial-probe recall is
    pytest-checked against brute force."""
    q = [float(x) for x in query_vec]

    def d2(c: list[float]) -> float:
        return sum((a - b) * (a - b) for a, b in zip(c, q))

    order = sorted(range(len(centroids)), key=lambda j: (d2(centroids[j]), j))
    probe = order[:n_probe]
    pruned = corpus_assigned.filter(F.col("ivf_bucket").isin(probe))
    return brute_force_topk(pruned, q, k=k, vec_col=vec_col, id_col=id_col)


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
