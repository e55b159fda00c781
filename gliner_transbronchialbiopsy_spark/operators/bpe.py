"""BPE tokenizer induction over the corpus — the vocabulary-training
step of an LLM data pipeline (Sennrich et al. 2016), distributed the
way it must be at 100 TB.

The classic trick that makes BPE tractable at corpus scale: merges
never touch the corpus. One corpus-wide aggregation builds the
(word, cnt) frequency table — the ONLY pass over the text — and every
merge round then operates on that vocab-sized table: count adjacent
symbol pairs weighted by word frequency, elect the best pair, rewrite
the segmentations. The per-round reduction is a groupBy over at most
|vocab| × max_word_len rows, and the elected pair is a single driver
row per round (bounded by n_merges, never corpus-sized).

Determinism: the election is a total order (count DESC, pair ASC) and
the rewrite is the standard greedy left-to-right non-overlapping
replace, expressed as an F.aggregate fold over the symbol array — a
pure JVM projection, bit-identical at any parallelism. (Real BPE
implementations break count ties arbitrarily; pinning the tie makes
the trained merges reproducible run-to-run, which a data pipeline
needs for cache/lineage integrity.)

Simplification vs sentencepiece-style trainers: symbols start as raw
characters with no end-of-word marker and no byte fallback — the
Spark-side structure (one text pass, vocab-sized rounds, broadcastable
merge table) is the point; a marker is one column away.

Reference analogue: the reference tokenizes with a fixed pretrained
vocab (models/model_handler.py); training-data pipelines must also
TRAIN vocabularies from the corpus they curate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words(text_col, lowercase: bool):
    """Word array under the shared tokenizer contract
    (textstats.word_tokens); lowercase=False keeps case but the same
    trim/split/empty-guard shape."""
    from .textstats import word_tokens

    if lowercase:
        return word_tokens(F.col(text_col))
    t = F.trim(F.col(text_col))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def word_counts(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """One pass over the corpus -> (word, cnt). The only text scan in
    BPE training; everything after is vocab-sized."""
    return (
        docs.select(F.explode(_words(text_col, lowercase)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _adjacent_pairs(sym_col):
    """All adjacent pairs of a symbol array, as 'a b' strings (space
    cannot occur inside a symbol: words come from a \\s+ split)."""
    n = F.size(sym_col)
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(sym_col, i), F.element_at(sym_col, i + 1)
            ),
        )
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """(word, cnt) or (syms, cnt) -> (pair, n): adjacent-pair counts
    weighted by word frequency. With a `syms` column, pairs come from
    the current segmentation; else words split into characters."""
    if "syms" in words.columns:
        syms = F.col("syms")
    else:
        syms = F.split(F.col("word"), "")
    return (
        words.select(F.explode(_adjacent_pairs(syms)).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
    )


def _merge_fold(sym_col, a, b):
    """Greedy left-to-right non-overlapping merge of (a, b) -> a+b over
    a symbol array, as a single F.aggregate fold (the array is
    referenced once — robust against Catalyst re-inlining, see
    textstats._run_stats)."""
    merged = F.lit(a + b)

    def step(acc, x):
        tail_is_a = (F.size(acc) > 0) & (
            F.element_at(acc, -1) == F.lit(a)
        ) & (x == F.lit(b))
        return F.when(
            tail_is_a,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(sym_col, F.array().cast("array<string>"), step)


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train ``n_merges`` BPE merges on the corpus.

    Returns (merges, segmented): merges is the ordered rule list
    [(left, right, count), ...] (driver-side, bounded by n_merges);
    segmented is the final (word, cnt, syms) vocabulary table. Stops
    early when no pair occurs twice.
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    vocab = word_counts(docs, text_col=text_col, lowercase=lowercase)
    seg = vocab.select(
        "word", "cnt", F.split(F.col("word"), "").alias("syms")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            pair_counts(seg)
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < 2:
            break
        pair, n = best[0]["pair"], best[0]["n"]
        a, b = pair.split(" ", 1)
        merges.append((a, b, n))
        seg = seg.select(
            "word", "cnt", _merge_fold(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=True)
    return merges, seg


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Apply a trained merge list to a corpus: per word, chars are
    folded through the merges in training order (the standard BPE
    encoder); output is the flattened per-document token array. The
    merge list is a driver-side literal chain (bounded by n_merges) —
    nothing shuffles, the encode is a pure projection.

    The expression tree nests one fold per merge, so this JVM encoder
    is for SMALL merge lists (tests, probes); a production-size vocab
    (30k+ merges) encodes through an Arrow-batched pandas UDF wrapping
    a real tokenizer instead — same pipeline position, different
    kernel."""
    if len(merges) > 64:
        raise ValueError(
            "bpe_apply nests one fold per merge and is meant for small "
            f"merge lists (got {len(merges)}); encode production vocabs "
            "with an Arrow-batched pandas UDF tokenizer kernel"
        )
    words = _words(text_col, lowercase)

    def encode(word):
        syms = F.split(word, "")
        for m in merges:
            syms = _merge_fold(syms, m[0], m[1])
        return syms

    return df.withColumn(out_col, F.flatten(F.transform(words, encode)))
