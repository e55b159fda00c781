"""DSIR-style data selection: hashed unigram importance weights.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023):
score every raw-corpus document by how much more likely its tokens are
under a (small) target corpus than under the raw corpus itself,
log w(doc) = Σ_tokens [ln p_target(tok) − ln p_raw(tok)], with both
unigram models HASHED into a fixed bucket table so the model size is
O(n_buckets), never O(vocab) — the trick that lets the scorer run over
a 100 TB raw corpus with a broadcastable model.

Everything is fixed-point (termstats.quantize_ln, SCALE=1e9): each
bucket's log-ratio is a long, a document's weight is an exact long sum
(order-free ⇒ partitioning/parallelism-invariant), and the DuckDB
oracle restates the identical arithmetic. Laplace-α smoothing keeps
buckets unseen in the target finite.

Plan shape at scale: two token→bucket count aggregations (one over the
raw corpus, one over the target — shuffles on the bucket id with
map-side combine, key cardinality = n_buckets), the joined bucket
table (n_buckets rows) BROADCAST onto the exploded raw token stream,
one groupBy(doc) long-sum. The raw corpus text shuffles zero times;
only (doc_id, bucket) pairs move.

Hashing: production default is xxhash64 (JVM intrinsic);
portable_hash=True switches to linking.portable_hash60 so the contract
query gains an exact SQL oracle (same pattern as the MinHash/SimHash
families). Reference analogue: the reference filters its corpus by
fixed keyword/section heuristics (utils/text_normalizer.py) — DSIR is
the scalable generalization: "keep what looks like THESE documents".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import linking
from .termstats import SCALE, quantize_ln, round_keep_sign
from .textstats import word_tokens


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # the one shared tokenizer contract (textstats.word_tokens)
    return df.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("token")
    )


def _bucket(col, n_buckets: int, portable: bool):
    h = linking.portable_hash60(col) if portable else F.xxhash64(col)
    return F.pmod(h, F.lit(n_buckets)).cast("int")


def _bucket_counts(
    toks: DataFrame, n_buckets: int, portable: bool, out: str
) -> DataFrame:
    return (
        toks.select(_bucket(F.col("token"), n_buckets, portable).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias(out))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: int = 1,
    portable_hash: bool = False,
) -> DataFrame:
    """Score every ``raw`` document against the ``target`` distribution.

    Returns (id_col, n_tokens, w_fp, avg_w): w_fp is the exact
    fixed-point log importance weight Σ [lp_target − lp_raw] (long;
    positive = looks more like the target than like the average raw
    doc), avg_w = round(w_fp / n_tokens / SCALE, 4) its per-token
    normalization (the resampling score; empty docs get 0). Both
    models are α-smoothed over the same ``n_buckets`` hash buckets:
    lp(b) = quantize_ln((c(b)+α) / (total+α·n_buckets)).
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    raw_toks = _tokens(raw, text_col, id_col)
    tgt_toks = _tokens(target, text_col, id_col)

    rc = _bucket_counts(raw_toks, n_buckets, portable_hash, "c_raw")
    tc = _bucket_counts(tgt_toks, n_buckets, portable_hash, "c_tgt")
    rt = rc.agg(F.sum("c_raw").alias("t_raw"))
    tt = tc.agg(F.coalesce(F.sum("c_tgt"), F.lit(0)).alias("t_tgt"))

    # model over the raw corpus's buckets (a scored token always has
    # c_raw >= 1); target counts left-joined, smoothed. n_buckets rows.
    denom_r = F.col("t_raw") + F.lit(alpha) * F.lit(n_buckets)
    denom_t = F.col("t_tgt") + F.lit(alpha) * F.lit(n_buckets)
    model = (
        rc.join(tc, "bucket", "left")
        .crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(tt))
        .select(
            "bucket",
            (
                quantize_ln(
                    (F.coalesce(F.col("c_tgt"), F.lit(0)) + F.lit(alpha)) / denom_t
                )
                - quantize_ln((F.col("c_raw") + F.lit(alpha)) / denom_r)
            ).alias("lr_fp"),
        )
    )

    scored = (
        raw_toks.select(
            id_col, _bucket(F.col("token"), n_buckets, portable_hash).alias("bucket")
        )
        .join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_tokens"), F.sum("lr_fp").alias("w_fp"))
    )
    # signed-zero discipline (termstats.round_keep_sign): a small
    # NEGATIVE w_fp whose per-token quotient rounds to zero must read
    # out as -0.0, matching SQL round semantics — found by the round-5
    # driver gate: one doc at sf0.01 with w_fp < 0 and
    # |w_fp|/n_tokens < 5e-5*SCALE read back +0.0 here vs -0.0 in the
    # oracle, a bit-pattern (hash) mismatch on value-identical output.
    signed = round_keep_sign(
        F.col("w_fp") / F.col("n_tokens") / F.lit(float(SCALE)), 4
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("w_fp"), F.lit(0)).cast("long").alias("w_fp"),
            F.when(F.coalesce(F.col("n_tokens"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(signed)
            .alias("avg_w"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Top-``n`` raw documents by per-token importance (avg_w desc,
    id asc — the deterministic greedy variant of DSIR's resampling
    step; TakeOrdered, never a full sort)."""
    w = dsir_weights(raw, target, text_col=text_col, id_col=id_col, **kwargs)
    return w.orderBy(F.desc("avg_w"), F.col(id_col).asc()).limit(n)
