"""Multinomial Naive Bayes over hashed token buckets — the classic
one-pass scalable text classifier (McCallum & Nigam, AAAI-98 workshop
"A comparison of event models for Naive Bayes text classification"),
the supervised sibling of the DSIR importance scorer
(operators/dsir.py): DSIR scores "looks like THIS corpus" from two
unlabeled piles; NB learns k labeled classes with priors and emits an
argmax prediction — the shape of the fastText-style quality/domain
classifiers production curation pipelines gate on (CCNet, GPT-3's
WebText classifier), minus the learned embeddings: training is ONE
counting pass, no gradient loop, which is what makes it viable as a
same-job stage over a 100 TB corpus.

Model: score(d, c) = ln p(c) + Σ_buckets n_b(d) · ln p(b | c), with
tokens HASHED into ``n_buckets`` buckets so the model is
O(k · n_buckets) — broadcastable — never O(vocab); α-smoothing keeps
unseen buckets finite. Everything is fixed-point (termstats.SCALE
longs via quantize_ln): per-class log-priors and per-bucket
log-likelihoods are longs, a document's score is an exact long
dot-product (order-free ⇒ partitioning/parallelism-invariant), and
the argmax is a min over (−score, class) structs — a total order, so
predictions are bit-identical at any parallelism and restatable in
DuckDB (ROW_NUMBER over (score DESC, class ASC)).

Plan shape at scale: one token→(class, bucket) count aggregation over
the TRAIN set (shuffle key cardinality k·n_buckets, map-side
combine), the dense k×n_buckets model grid broadcast onto per-doc
bucket counts of the TEST set (docs never shuffle text — only
(doc, bucket, n) triples move), one groupBy(doc, class) long-sum, one
groupBy(doc) argmax agg. Zero-token docs fall back to the prior
argmax via the (doc × class) prior grid.

Hashing: production default xxhash64; portable_hash=True switches to
linking.portable_hash60 so the contract query gains an exact SQL
oracle (the dsir/simhash discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import linking
from .termstats import quantize_ln
from .textstats import word_tokens


def _bucket(col, n_buckets: int, portable: bool):
    h = linking.portable_hash60(col) if portable else F.xxhash64(col)
    return F.pmod(h, F.lit(n_buckets)).cast("int")


def nb_train(
    train: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = 256,
    alpha: int = 1,
    portable_hash: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """One counting pass -> (model, priors).

    model: (label, bucket, llh_fp) — the DENSE k×n_buckets grid,
    llh_fp = quantize_ln((c(label,bucket)+α) / (tot(label)+α·B));
    priors: (label, prior_fp) = quantize_ln(n_docs(label)/N).
    Both are model-sized relations meant to be broadcast."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if alpha < 1:
        raise ValueError("alpha must be >= 1 (integer Laplace smoothing)")
    spark = train.sparkSession
    lab = F.col(label_col).alias("label")

    cls = train.groupBy(lab).agg(F.count("*").alias("n_docs"))
    n_total = cls.agg(F.sum("n_docs").alias("n_total"))
    priors = cls.crossJoin(F.broadcast(n_total)).select(
        "label", quantize_ln(F.col("n_docs") / F.col("n_total")).alias("prior_fp")
    )

    toks = train.select(
        lab, F.explode(word_tokens(F.col(text_col))).alias("token")
    )
    cb = (
        toks.select(
            "label", _bucket(F.col("token"), n_buckets, portable_hash).alias("bucket")
        )
        .groupBy("label", "bucket")
        .agg(F.count("*").alias("c"))
    )
    tot = cb.groupBy("label").agg(F.sum("c").alias("tot"))
    grid = cls.select("label").crossJoin(
        spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    )
    model = (
        grid.join(cb, ["label", "bucket"], "left")
        .join(tot, "label", "left")
        .select(
            "label",
            "bucket",
            quantize_ln(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("tot"), F.lit(0)) + F.lit(alpha * n_buckets))
            ).alias("llh_fp"),
        )
    )
    return model, priors


def nb_classify(
    test: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    portable_hash: bool = False,
) -> DataFrame:
    """Score and argmax -> (id_col, pred, score_fp). ``n_buckets`` and
    ``portable_hash`` must match the training call (the bucket hash is
    part of the model contract)."""
    tb = (
        test.select(
            F.col(id_col),
            F.explode(word_tokens(F.col(text_col))).alias("token"),
        )
        .select(
            id_col, _bucket(F.col("token"), n_buckets, portable_hash).alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("n"))
    )
    tok_scores = (
        tb.join(F.broadcast(model), "bucket")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("n") * F.col("llh_fp")).alias("tok_fp"))
    )
    # the (doc × class) prior grid scores zero-token docs uniformly
    scores = (
        test.select(id_col)
        .crossJoin(F.broadcast(priors))
        .join(tok_scores, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            (F.col("prior_fp") + F.coalesce(F.col("tok_fp"), F.lit(0)))
            .cast("long")
            .alias("score_fp"),
        )
    )
    best = scores.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("score_fp")).alias("_neg"), F.col("label").alias("pred")
            )
        ).alias("_b")
    )
    return best.select(
        id_col,
        F.col("_b.pred").alias("pred"),
        (-F.col("_b._neg")).cast("long").alias("score_fp"),
    )


def naive_bayes_classify(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    alpha: int = 1,
    portable_hash: bool = False,
) -> DataFrame:
    """Train on ``train`` and classify ``test`` in one call ->
    (id_col, pred, score_fp). See :func:`nb_train` /
    :func:`nb_classify`."""
    model, priors = nb_train(
        train, label_col=label_col, text_col=text_col,
        n_buckets=n_buckets, alpha=alpha, portable_hash=portable_hash,
    )
    return nb_classify(
        test, model, priors, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets, portable_hash=portable_hash,
    )
