"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

All JVM-side column expressions (regexp + array folds) — these run in
whole-stage codegen over 100 TB; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker vocabularies (n-gram heuristic stand-in; a
# real fastText-style model would slot into a pandas UDF on the same
# column contract)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with"),
    "fr": ("le", "la", "les", "de", "et", "est"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "las", "que", "es"),
}


def _marker_hits(col: Column, words: tuple[str, ...]) -> Column:
    rx = r"\b(?:" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(rx), F.lit(0)))


def lang_id(col: Column) -> Column:
    """Most-hit marker vocabulary wins; 'und' when nothing hits.
    Deterministic tie-break: language name ascending."""
    scores = F.array(
        *[
            F.struct(
                (-_marker_hits(col, words)).alias("neg_hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_min(scores)
    return F.when(best["neg_hits"] < 0, best["lang"]).otherwise(F.lit("und"))


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(col), r"\s+"))
    )


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish subword proxy: word-or-punct pieces (the reference's own
    tokenizer regex, json_convertissor.py:10) counted JVM-side."""
    return F.size(F.regexp_extract_all(col, F.lit(r"\b\w+\b|[^\w\s]"), F.lit(0)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality signals: length, token count, punct ratio,
    stopword ratio, mean word length, upper ratio."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count_ws(c)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), F.lit(0)))
    stop_rx = r"\b(?:the|and|of|is|le|la|de|et|der|und|el|que)\b"
    n_stop = F.size(F.regexp_extract_all(F.lower(c), F.lit(stop_rx), F.lit(0)))
    n_upper = F.size(F.regexp_extract_all(c, F.lit(r"[A-Z]"), F.lit(0)))
    return df.select(
        "*",
        n_chars.alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(n_upper / F.greatest(n_chars, F.lit(1)), 4).alias("upper_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0,1]: a fixed linear blend of the
    signals (heuristic Gopher/C4-style filter stand-in)."""
    feats = quality_features(df, text_col)
    score = (
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.3
        + F.least(F.col("stopword_ratio") * 4, F.lit(1.0)) * 0.3
    )
    return feats.withColumn("quality_score", F.round(score, 4))


def word_tokens(col: Column) -> Column:
    """Lowercased whitespace tokens as an array column; empty/blank
    text yields an empty array."""
    return F.when(
        F.trim(col) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.lower(col)), r"\s+"))


def ngrams_of(toks: Column, n: int) -> Column:
    """Word n-grams from a token-array column. PASS A MATERIALIZED
    COLUMN (a plain F.col over a projected token array), not a nested
    expression: every element_at inside the lambda embeds a full copy
    of its argument tree, and Catalyst's common-subexpression
    elimination does not cross lambda boundaries — an inline split()
    here gets re-evaluated once per gram per position (measured 80s vs
    <2s on 500 docs). Fewer than n tokens -> empty array."""
    n_toks = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n_toks - (n - 1), F.lit(0)))
    return F.when(n_toks < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + k) for k in range(n)]
            ),
        )
    )


def word_ngrams(col: Column, n: int) -> Column:
    """Word n-grams of lower(col) as an array column (JVM-side). Only
    for one-shot use on a text column; anything that references the
    gram array more than once should project word_tokens first and use
    ngrams_of (see its docstring for why)."""
    return ngrams_of(word_tokens(col), n)


def _run_stats(arr: Column) -> Column:
    """struct(best, ndup) over arr in ONE aggregate pass on its sorted
    copy: best = longest run of equal elements (== max value
    frequency), ndup = number of elements belonging to runs of length
    >= 2 (== occurrences whose value appears more than once).

    Why a fold and not nested filter-counting: a nested HOF (count
    each element's frequency by filtering the array per element)
    references the array O(n) times, and Catalyst inlines a fresh copy
    of the array expression at every reference when predicate pushdown
    substitutes the projection into a filter — the O(n^2) count
    becomes O(n^3) re-evaluation (measured 264s vs 15s on a 500-doc
    curation pass). The fold references the array ONCE, so the plan
    survives any inlining Catalyst does."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("ndup"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1).otherwise(
            F.lit(1)
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            (
                acc["ndup"]
                + F.when(run == 2, 2).when(run > 2, 1).otherwise(0)
            ).alias("ndup"),
        )

    return F.aggregate(
        F.array_sort(arr),
        init,
        step,
        lambda acc: F.struct(
            acc["best"].alias("best"), acc["ndup"].alias("ndup")
        ),
    )


def repetition_features(
    df: DataFrame, text_col: str = "text", dup_gram_n: int = 5
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    table A1, adapted to single-line text: sentence segments stand in
    for lines). Pure per-row projections — each doc's arrays never
    leave the row, so this is whole-stage codegen with zero shuffles at
    any corpus size; the duplicate counts are single-pass folds over
    the sorted gram arrays (see _run_stats for why NOT nested
    filter-counts).

    - dup_segment_frac: fraction of '.'-delimited segments that are
      byte-duplicates of another segment in the same doc;
    - top_bigram_frac: occurrences of the most frequent word 2-gram
      over total 2-grams;
    - dup_ngram_frac: fraction of word dup_gram_n-grams occurring
      more than once in the doc (Gopher uses 5..10; short synthetic
      docs need 2-3 for any signal)."""
    c = F.col(text_col)
    staged = df.select(
        "*",
        F.filter(
            F.transform(F.split(F.lower(c), r"\.\s*"), lambda s: F.trim(s)),
            lambda s: s != "",
        ).alias("_segs"),
        word_tokens(c).alias("_tk"),
    ).select(
        "*",
        ngrams_of(F.col("_tk"), 2).alias("_bi"),
        ngrams_of(F.col("_tk"), dup_gram_n).alias("_gn"),
    ).select(
        "*",
        _run_stats(F.col("_bi")).alias("_bi_rs"),
        _run_stats(F.col("_gn")).alias("_gn_rs"),
    )
    segs = F.col("_segs")
    n_segs = F.size(segs)
    dup_seg = F.when(n_segs <= 0, F.lit(0.0)).otherwise(
        (n_segs - F.size(F.array_distinct(segs)))
        / n_segs.cast("double")
    )
    n_bi = F.size(F.col("_bi"))
    top_bi = F.when(n_bi <= 0, F.lit(0.0)).otherwise(
        F.col("_bi_rs")["best"] / n_bi.cast("double")
    )
    n_gn = F.size(F.col("_gn"))
    dup_gn = F.when(n_gn <= 0, F.lit(0.0)).otherwise(
        F.col("_gn_rs")["ndup"] / n_gn.cast("double")
    )
    return staged.select(
        *df.columns,
        F.round(dup_seg, 4).alias("dup_segment_frac"),
        F.round(top_bi, 4).alias("top_bigram_frac"),
        F.round(dup_gn, 4).alias("dup_ngram_frac"),
    )


def fingerprint64(col: Column) -> Column:
    """Rolling-hash document fingerprint: xxhash64 of the
    whitespace-normalized, lowercased text (content identity robust to
    spacing). For shift-tolerant fingerprints see dedup.simhash64."""
    return F.xxhash64(F.regexp_replace(F.lower(col), r"\s+", " "))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    portable_hash: bool = False,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS local fingerprinting algorithm): hash every
    character k-gram, slide a window of ``w`` consecutive hashes, and
    select each window's RIGHTMOST minimum. The guarantee that makes
    this the code-corpus near-dup primitive (vs one hash per doc or a
    global MinHash): any shared substring of length >= k + w - 1
    yields at least one IDENTICAL selected fingerprint in both
    documents, at a bounded density (~2/(w+1)) — insert a line in the
    middle of a copied file and the untouched regions still collide.

    Adds ``fps``: array<struct<pos:int, fp:long>> of selected
    fingerprints (ascending pos). Implementation note — this is a
    single flat pass, NOT nested gram arrays: position i is selected
    iff L + R >= w-1, or i is the rightmost minimum of a
    shorter-than-w hash array (L = run of left neighbors with hash >=
    h_i, R = run of right neighbors with hash > h_i, both capped at
    w-1; the rule is the positional restatement of "rightmost min of
    some window", so ties break rightward exactly as the paper
    specifies). Each L/R is a bounded fold of w-1 steps — O(n*w) work
    inside whole-stage codegen, no per-row Python, and no
    quadratic-gram intermediate (the Catalyst-inlining lesson in
    _run_stats applies: keep the gram array FLAT and fold over it).

    portable_hash=True derives gram hashes from sha256
    (linking.portable_hash60) so a SQL oracle can restate every
    selected fingerprint bit-exactly; production default is xxhash64.
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    from .linking import portable_hash60

    text = F.col(text_col)
    n_grams = F.greatest(F.length(text) - F.lit(k - 1), F.lit(0))
    # guard: F.sequence(0, -1) DESCENDS ([0, -1]), so an empty gram
    # set must short-circuit to an empty array, not a sequence call
    idx = F.when(n_grams > 0, F.sequence(F.lit(0), n_grams - 1)).otherwise(
        F.array().cast("array<int>")
    )
    # build the flat hash array once; hashes[i] = H(text[i .. i+k-1])
    if portable_hash:
        hashes = F.transform(
            idx, lambda i: portable_hash60(text.substr(i + 1, F.lit(k)))
        )
    else:
        hashes = F.transform(
            idx, lambda i: F.xxhash64(text.substr(i + 1, F.lit(k)))
        )
    df = df.withColumn("_wh", hashes)
    h = F.col("_wh")
    n = F.size(h)

    def run_count(i, cmp_ge: bool, direction: int):
        # bounded fold: longest run of neighbors (toward `direction`)
        # satisfying h[j] >= h[i] (left) / h[j] > h[i] (right)
        def step(acc, d):
            j = i + d * direction
            ok = (
                (j >= 0)
                & (j < n)
                & (
                    F.element_at(h, j + 1) >= F.element_at(h, i + 1)
                    if cmp_ge
                    else F.element_at(h, j + 1) > F.element_at(h, i + 1)
                )
            )
            return F.when(
                acc["go"] & ok,
                F.struct(
                    F.lit(True).alias("go"),
                    (acc["cnt"] + 1).alias("cnt"),
                ),
            ).otherwise(
                F.struct(F.lit(False).alias("go"), acc["cnt"].alias("cnt"))
            )

        init = F.struct(F.lit(True).alias("go"), F.lit(0).alias("cnt"))
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(w - 1)), init, step
        )["cnt"]

    pos = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    sel = F.filter(
        pos,
        lambda i: (
            (run_count(i, True, -1) + run_count(i, False, 1) >= w - 1)
            | (
                (run_count(i, True, -1) == i)
                & (run_count(i, False, 1) == n - 1 - i)
            )
        ),
    )
    fps = F.transform(
        sel,
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.element_at(h, i + 1).alias("fp"),
        ),
    )
    return df.withColumn(
        "fps", F.when(n > 0, fps).otherwise(F.array())
    ).drop("_wh")


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_fp_docs: int = 50,
    portable_hash: bool = False,
) -> DataFrame:
    """Cross-document near-dup candidate pairs from shared winnowing
    fingerprints -> (doc_a, doc_b, n_shared): document pairs sharing
    at least ``min_shared`` selected fingerprints. The winnowing
    guarantee makes this the EDIT-ROBUST complement of
    dedup.duplicate_passages' verbatim token windows: any shared run
    of >= k+w-1 characters yields a collision however the surrounding
    text was edited, and only ~2/(w+1) of positions carry a
    fingerprint, so the joined relation is a bounded fraction of the
    corpus (MOSS runs exactly this shape over all submissions).

    Scale discipline (the LSH-bucket-cap pattern of
    operators/linking.py): fingerprints shared by more than
    ``max_fp_docs`` documents are dropped BEFORE the self-join —
    boilerplate license headers are the corpus hot keys, and an
    uncapped fp group fans out quadratically. Results are therefore
    lower-bound semantics, documented like every capped pair miner in
    this engine. Pair order is canonical (doc_a < doc_b).
    """
    fps = winnow_fingerprints(
        df.select(id_col, text_col), text_col, k=k, w=w,
        portable_hash=portable_hash,
    )
    ex = (
        fps.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.transform(F.col("fps"), lambda x: x["fp"])
            ).alias("fp"),
        )
        .distinct()
    )
    census = ex.groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
    keep = census.filter(
        (F.col("_n") >= 2) & (F.col("_n") <= max_fp_docs)
    ).select("fp")
    keyed = ex.join(keep, "fp", "left_semi")
    a = keyed.select(F.col("fp"), F.col("_id").alias("doc_a"))
    b = keyed.select(F.col("fp"), F.col("_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
