"""Sequence packing for training-data pipelines: the GPT-style
concat-and-chunk layout — documents are concatenated in a global
deterministic order (ascending id) into one token stream, which is cut
into fixed-length chunks of seq_len tokens; each doc is assigned the
chunk span it lands in.

Scale shape — a global running sum is the textbook case where the
naive plan (one Window over an empty partitionBy) collapses to a
SINGLE task. This implements the distributed two-phase prefix sum
instead:

  phase 1: docs are range-bucketed by id (floor(id / span), span from
           one min/max aggregate); per-bucket token sums — a bounded
           aggregate (n_buckets rows) — are collected, cumulated on
           the driver, and broadcast back as per-bucket offsets;
  phase 2: the running sum is a Window PER BUCKET (partitionBy bucket,
           orderBy id) plus the bucket's broadcast offset. Every
           bucket computes in parallel; no single-task stage at any
           corpus size, and n_buckets scales with the cluster, not
           the data.

Not a reference-parity item: standard public pretraining practice
(packing in GPT-3 / T5 data pipelines), built on the engine's
JVM token counting (textstats.token_count_ws).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from . import textstats


def pack_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 512,
    n_buckets: int = 64,
) -> DataFrame:
    """(id_col, n_tokens, token_start, first_chunk, last_chunk,
    n_chunks) per doc — the chunk ids of the seq_len-token windows the
    doc occupies in the id-ordered concatenated stream. token_start is
    the doc's offset into the stream (the exclusive prefix sum).
    A doc spans floor(start/L) .. floor((end-1)/L); zero-token docs
    occupy no chunk (first=last=the chunk at their offset, n_chunks=0).

    Requires a numeric id_col; ids need not be dense — sparse ids only
    make buckets uneven, never incorrect."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    toks = df.select(
        F.col(id_col),
        textstats.token_count_ws(F.col(text_col)).alias("n_tokens"),
    )
    lo, hi = toks.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        return toks.select(
            id_col,
            "n_tokens",
            F.lit(None).cast("long").alias("token_start"),
            F.lit(None).cast("long").alias("first_chunk"),
            F.lit(None).cast("long").alias("last_chunk"),
            F.lit(None).cast("long").alias("n_chunks"),
        ).limit(0)
    span = max(1, (int(hi) - int(lo)) // n_buckets + 1)
    bucketed = toks.withColumn(
        "_b", F.floor((F.col(id_col) - F.lit(int(lo))) / F.lit(span))
    )
    # phase 1: bounded per-bucket sums -> driver cumsum -> broadcast
    sums = {
        r["_b"]: r["s"]
        for r in bucketed.groupBy("_b")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    }
    offsets, acc = [], 0
    for b in range(n_buckets + 1):
        offsets.append((b, acc))
        acc += int(sums.get(b, 0))
    off_df = F.broadcast(
        bucketed.sparkSession.createDataFrame(
            offsets, "_b long, _offset long"
        )
    )
    # phase 2: per-bucket running sum + offset = global running sum
    w = W.partitionBy("_b").orderBy(F.col(id_col).asc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    out = bucketed.join(off_df, "_b").select(
        id_col,
        "n_tokens",
        (F.sum("n_tokens").over(w) + F.col("_offset")).alias("_cum"),
    )
    start = F.col("_cum") - F.col("n_tokens")
    first = F.floor(start / F.lit(seq_len))
    last = F.when(F.col("n_tokens") <= 0, first).otherwise(
        F.floor((F.col("_cum") - 1) / F.lit(seq_len))
    )
    return out.select(
        id_col,
        "n_tokens",
        start.alias("token_start"),
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        F.when(F.col("n_tokens") <= 0, F.lit(0).cast("long"))
        .otherwise(last - first + 1)
        .alias("n_chunks"),
    )


def chunk_sliding(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Per-document sliding-window chunking -> (id_col, chunk_idx,
    start_tok, n_tok, chunk_text): the RAG/embedding-index layout
    (fixed-size windows, fixed overlap so no boundary sentence is cut
    from both sides), complementing pack_chunks' cross-doc concat
    layout for pretraining.

    Windows start at stride = chunk_tokens - overlap: 0, stride,
    2*stride, ... while start < n_tokens, each window min(chunk_tokens,
    n_tokens - start) long — so every token lands in >=1 chunk, the
    final (possibly short) tail is kept, and an empty doc emits no
    rows. Whitespace tokenization (textstats.word_tokens) keeps parity
    with the rest of the suite.

    Distributed shape: pure per-row compute — tokenize, F.sequence for
    the start offsets, slice + explode. No shuffle, no Python; chunk
    counts are data-derived, so the explode fan-out is bounded by
    ceil(n_tokens/stride) per row."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be > 0")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = df.select(
        F.col(id_col),
        textstats.word_tokens(F.col(text_col)).alias("_tk"),
    ).withColumn("_n", F.size("_tk").cast("long"))
    starts = F.when(F.col("_n") <= 0, F.array().cast("array<bigint>")).otherwise(
        F.sequence(
            F.lit(0).cast("long"),
            F.col("_n") - 1,
            F.lit(int(stride)).cast("long"),
        )
    )
    out = (
        toks.select(
            id_col,
            "_tk",
            "_n",
            F.posexplode(starts).alias("chunk_idx", "start_tok"),
        )
        .withColumn(
            "n_tok",
            F.least(F.lit(int(chunk_tokens)).cast("long"), F.col("_n") - F.col("start_tok")),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            "start_tok",
            "n_tok",
            F.concat_ws(
                " ",
                F.slice(
                    F.col("_tk"),
                    (F.col("start_tok") + 1).cast("int"),
                    F.col("n_tok").cast("int"),
                ),
            ).alias("chunk_text"),
        )
    )
    return out
