"""Corpus-level term statistics for training-data pipelines: document
frequencies, TF-IDF term weighting, and unigram-LM perplexity quality
scoring (the classic "perplexity filter" signal from CCNet/Gopher-style
curation, with a corpus-trained unigram model standing in for KenLM —
a real 5-gram LM would slot into the same lp_fp column contract).

All scores are FIXED-POINT longs: per-token log-probabilities and IDF
weights are quantized once (floor(ln(x) * SCALE)) and every downstream
combination is integer arithmetic. Long addition is exactly associative
and commutative, so per-doc sums are bit-identical at ANY partitioning
or executor count — reproducible scores on a 1000-executor cluster, and
restatable in DuckDB for the value oracle (double summation order would
differ between engines and between Spark runs; integers cannot).

Distributed shape (both operators):
  tokens exploded -> one groupBy(token) with map-side partial combine
  (shuffle volume is O(vocab x partitions), not O(corpus tokens)) ->
  the small vocab/DF table broadcasts back onto the exploded tokens ->
  one groupBy(doc) re-aggregate. Two shuffles total at any corpus size;
  the text column itself never shuffles (only tokens and ids travel).

Reference analogue: the per-label frequency/coverage statistics the
reference computes over its results table (src/streamlit/app/app.py
stats tab); here generalized to corpus-scale term statistics.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from . import textstats

#: fixed-point scale for quantized log values (1e9 keeps ln() products
#: with corpus-sized counts far inside long range: |ln| < 40 -> lp_fp
#: < 4e10; a 1e6-token doc sums to < 4e16 << 2^63)
SCALE = 1_000_000_000


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, token) exploded view of the lowercased whitespace
    tokens; blank docs contribute no rows (handled by the left join in
    the callers)."""
    return df.select(
        F.col(id_col),
        F.posexplode(textstats.word_tokens(F.col(text_col))).alias(
            "pos", "token"
        ),
    )


def quantize_ln(x: Column) -> Column:
    """floor(ln(x) * SCALE) as a long — the one place floating point is
    touched. Both engines feed ln the same exact rational (a ratio of
    two longs), and the result is immediately floored onto the SCALE
    grid, so a platform ulp difference only matters when ln lands
    within ~2 ulp of a grid line (~1e-6 relative odds per DISTINCT
    ratio; the gate datasets are fixed, so green once is green
    forever)."""
    return F.floor(F.log(x) * F.lit(SCALE)).cast("long")


def round_keep_sign(x: Column, digits: int) -> Column:
    """Sign-preserving round at the fixed-point -> double readout
    boundary. SQL engines' round() keeps IEEE signed zero (DuckDB:
    round(-2e-10, 4) = -0.0), while Spark's Round goes through
    BigDecimal — which has no negative zero — and returns +0.0 for the
    same input. Value-identical, but bit-pattern different, so any
    exact (hash) output comparison flags it; the round-5 driver gate
    did exactly that on dsir_weights. Use this wherever a readout
    divides a SIGN-CAPABLE exact quantity and rounds; readouts of
    nonnegative quantities (counts, tf-idf, BM25, Katz) cannot produce
    a negative zero and stay on plain F.round."""
    r = F.round(x, digits)
    return F.when((r == 0.0) & (x < 0), F.lit(-0.0)).otherwise(r)


def doc_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(token, tf_corpus, df_docs): corpus-wide occurrence count and
    document frequency per token. One explode + one groupBy; the
    partial combine collapses per-partition counts before the
    shuffle."""
    toks = _tokens(df, text_col, id_col)
    return toks.groupBy("token").agg(
        F.count("*").alias("tf_corpus"),
        F.countDistinct(id_col).alias("df_docs"),
    )


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document -> (id, term, score_fp, tfidf).

    score_fp = (c * idf_fp) div n_tok  with  idf_fp = floor(ln(N/df) *
    SCALE): term count and doc length are exact longs, so the score is
    an exact long and the per-doc top-k ordering (score desc, term asc)
    is total and engine-portable — no float comparison anywhere near
    the cut line. tfidf is the same value as a readable double
    (score_fp / SCALE), derived AFTER selection.

    The DF table is the one corpus-wide aggregate; it broadcasts onto
    the per-doc term counts (vocab is orders of magnitude smaller than
    the corpus — at 100 TB of natural text the distinct-token table is
    GBs, still broadcastable after a min-df cut; pass the join through
    without the hint if not)."""
    toks = df.select(
        F.col(id_col),
        F.size(textstats.word_tokens(F.col(text_col))).alias("n_tok"),
        F.explode(textstats.word_tokens(F.col(text_col))).alias("token"),
    )
    per_doc = toks.groupBy(id_col, "token").agg(
        F.count("*").alias("c"), F.max("n_tok").alias("n_tok")
    )
    dfreq = per_doc.groupBy("token").agg(F.count("*").alias("df_docs"))
    n_docs = df.select(
        F.countDistinct(id_col).alias("_n_docs")
    )  # one-row frame, crossJoin-broadcast: no driver collect
    dfreq = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "token",
        quantize_ln(F.col("_n_docs") / F.col("df_docs")).alias("idf_fp"),
    )
    scored = per_doc.join(F.broadcast(dfreq), "token").select(
        id_col,
        F.col("token").alias("term"),
        F.expr("(c * idf_fp) div n_tok").alias("score_fp"),
    )
    rn = F.row_number().over(
        W.partitionBy(id_col).orderBy(
            F.desc("score_fp"), F.col("term").asc()
        )
    )
    return (
        scored.withColumn("_rn", rn)
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .withColumn(
            "tfidf", F.round(F.col("score_fp") / F.lit(SCALE), 6)
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    k: int = 20,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information ->
    (w1, w2, c_xy, pmi_fp, pmi). The classic phrase-mining signal
    (Church & Hanks 1990) a tokenizer/vocab-curation pass runs before
    merging multiword units: PMI = ln(p(xy) / (p(x) p(y))) with p(xy)
    from bigram occurrences and p(x) from unigram occurrences.

    pmi_fp = floor(ln((c_xy * N_uni * N_uni) / (c_x * c_y * N_bi)) *
    SCALE): the argument is built from exact long counts cast to
    double in ONE fixed association order, so both engines evaluate
    the identical IEEE expression tree and quantize_ln's grid-line
    caveat is the only (fixed-dataset-safe) float exposure. The top-k
    order (pmi_fp desc, w1 asc, w2 asc) is total — (w1, w2) is the
    group key — so the cut line is engine-portable.

    Distributed shape: two explode+groupBy aggregates (unigrams,
    bigrams) with map-side partial combine; the unigram vocab
    BROADCASTS back onto the min_count-filtered bigram table (twice,
    once per side) and the two one-row totals crossJoin-broadcast —
    no driver collect, text never shuffles, and the final top-k is a
    TakeOrderedAndProject (per-partition heads + driver merge of k
    rows), not a single-partition sort. min_count prunes the bigram
    tail BEFORE the joins, which is also the PMI-vs-rare-pair variance
    guard the literature applies.

    Reference analogue: the label co-occurrence matrix the reference
    renders (src/streamlit/app/app.py stats tab), generalized from
    label pairs per document to token pairs per adjacency position."""
    toks = df.select(textstats.word_tokens(F.col(text_col)).alias("tk"))
    uni = (
        toks.select(F.explode("tk").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    n_uni = uni.agg(F.sum("c").alias("_nu"))
    bi_all = (
        toks.select(
            F.explode(textstats.ngrams_of(F.col("tk"), 2)).alias("g")
        )
        .groupBy("g")
        .agg(F.count("*").alias("c_xy"))
    )
    # total bigram mass over the WHOLE corpus (pre-filter: min_count
    # prunes candidates, not the probability denominator)
    n_bi = bi_all.agg(F.sum("c_xy").alias("_nb"))
    parts = F.split(F.col("g"), " ")
    cand = (
        bi_all.filter(F.col("c_xy") >= F.lit(int(min_count)))
        .select(
            parts.getItem(0).alias("w1"),
            parts.getItem(1).alias("w2"),
            "c_xy",
        )
    )
    u1 = uni.select(F.col("token").alias("w1"), F.col("c").alias("_cx"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("c").alias("_cy"))
    scored = (
        cand.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
    )
    arg = (
        F.col("c_xy").cast("double")
        * F.col("_nu").cast("double")
        * F.col("_nu").cast("double")
    ) / (
        F.col("_cx").cast("double")
        * F.col("_cy").cast("double")
        * F.col("_nb").cast("double")
    )
    return (
        scored.select(
            "w1",
            "w2",
            "c_xy",
            quantize_ln(arg).alias("pmi_fp"),
        )
        .withColumn(
            "pmi", round_keep_sign(F.col("pmi_fp") / F.lit(SCALE), 6)
        )
        .orderBy(F.desc("pmi_fp"), F.col("w1").asc(), F.col("w2").asc())
        .limit(int(k))
    )


def perplexity_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram-LM negative log-likelihood per document -> original
    columns + (n_tokens, nll_fp, avg_nll).

    The model is trained on the scored corpus itself (classic
    leave-nothing-out unigram baseline): lp_fp(t) = floor(ln(count(t) /
    total) * SCALE) <= 0. nll_fp = -sum(lp_fp over the doc's tokens) is
    an EXACT long (order-free), avg_nll = round(nll_fp / n / SCALE, 4)
    is derived from it. Empty docs score 0 by definition.

    High avg_nll = tokens rare in the corpus = the
    out-of-distribution/noise signal a perplexity filter thresholds on.
    To score against a FROZEN reference LM instead, pass that corpus's
    doc_frequencies-derived (token, lp_fp) table to score_with_lm."""
    toks = _tokens(df, text_col, id_col)
    vocab = toks.groupBy("token").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("_total"))
    lm = vocab.crossJoin(F.broadcast(total)).select(
        "token", quantize_ln(F.col("c") / F.col("_total")).alias("lp_fp")
    )
    # the LM is trained on the scored corpus, so OOV is impossible —
    # pass a dead literal floor to skip score_with_lm's min-lp derivation
    # (it would re-derive the whole vocab subtree a second time: two
    # extra scans + aggs measured in the physical plan)
    return score_with_lm(df, lm, text_col, id_col, oov_lp_fp=0)


def score_with_lm(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_lp_fp: int | None = None,
) -> DataFrame:
    """Score df against a (token, lp_fp) unigram table (e.g. from a
    frozen reference corpus). Tokens absent from lm get oov_lp_fp
    (default: the table's minimum lp_fp minus one SCALE unit — one nat
    worse than the rarest known token; pass an explicit floor for a
    real OOV model)."""
    if oov_lp_fp is None:
        floor_df = lm.agg(
            (F.min("lp_fp") - F.lit(SCALE)).alias("_oov")
        )
    else:
        floor_df = None
    toks = _tokens(df, text_col, id_col)
    joined = toks.join(F.broadcast(lm), "token", "left")
    if floor_df is not None:
        joined = joined.crossJoin(F.broadcast(floor_df))
        lp = F.coalesce(F.col("lp_fp"), F.col("_oov"))
    else:
        lp = F.coalesce(F.col("lp_fp"), F.lit(int(oov_lp_fp)))
    per_doc = joined.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (-F.sum(lp)).alias("nll_fp"),
    )
    return (
        df.join(per_doc, id_col, "left")
        .withColumn("n_tokens", F.coalesce("n_tokens", F.lit(0)))
        .withColumn("nll_fp", F.coalesce("nll_fp", F.lit(0)))
        .withColumn(
            "avg_nll",
            F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
                F.round(
                    F.col("nll_fp")
                    / F.col("n_tokens")
                    / F.lit(float(SCALE)),
                    4,
                )
            ),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    probs: tuple = (1 / 3, 2 / 3),
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020) ->
    non-empty docs + (n_tokens, m_fp, bucket in head/middle/tail):
    score every document with the unigram LM (perplexity_score), cut
    the corpus at the requested quantiles of the per-token NLL, and
    label the cleanest third 'head', then 'middle', then 'tail' — the
    standard pretraining-data triage that keeps head/middle and drops
    or downsamples tail.

    m_fp = nll_fp div n_tokens is an exact long per doc (integer
    division of the fixed-point NLL sum), so the bucketing input is
    engine-portable by construction. The two cut points are
    percentile() interpolations over those longs — measured
    bit-identical to DuckDB quantile_cont on this corpus (same IEEE
    inputs, same correctly-rounded interpolation); like quantize_ln's
    grid lines, a doc whose m_fp sits EXACTLY on a cut is
    fixed-dataset-safe rather than universally portable. Empty docs
    carry no perplexity signal and are excluded (a curation pass
    drops them earlier anyway).

    Distributed shape: perplexity_score's two aggregates, then ONE
    extra single-row aggregate for both cuts (percentile is a
    mergeable ObjectHashAggregate — no global sort, no window), which
    crossJoin-broadcasts back onto the scored docs as a pure
    projection. The 100 TB path swaps percentile for
    approx_percentile (same mergeable shape); the exact form is the
    oracle-checkable contract."""
    scored = (
        perplexity_score(df, text_col, id_col)
        .filter(F.col("n_tokens") > 0)
        .withColumn("m_fp", F.expr("nll_fp div n_tokens"))
    )
    cuts = scored.agg(F.percentile("m_fp", F.lit(list(probs))).alias("_qs"))
    return (
        scored.crossJoin(F.broadcast(cuts))
        .withColumn(
            "bucket",
            F.when(F.col("m_fp") <= F.col("_qs")[0], F.lit("head"))
            .when(F.col("m_fp") <= F.col("_qs")[1], F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .drop("_qs")
    )


#: floor(ln(0.4) * SCALE) — the Stupid Backoff discount as ONE
#: fixed-point constant, so the backoff score is defined as
#: lp_uni_fp + ALPHA_LN_FP (a sum of two floors, exactly restatable)
#: rather than floor(ln(0.4 * p) * SCALE)
STUPID_BACKOFF_ALPHA_LN_FP = math.floor(math.log(0.4) * SCALE)


def stupid_backoff_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha_ln_fp: int = STUPID_BACKOFF_ALPHA_LN_FP,
) -> DataFrame:
    """Bigram-LM document scoring with Stupid Backoff (Brants, Popat,
    Xu, Och & Dean, EMNLP 2007 "Large language models in machine
    translation") -> (id_col, n_tokens, nll_fp, m_fp, avg_nll).

    S(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1}) when the bigram was
    seen, else α · c(w_i)/N with α = 0.4 — no discounting, no
    normalization, which is exactly why it was THE MapReduce-scale LM:
    training is counting, scoring is two table lookups. The backoff
    term is DEFINED here as lp_uni_fp + alpha_ln_fp (two floors summed,
    engine-portable) and a document's first token scores by its
    unigram alone (no ``<s>`` context, so no backoff penalty). nll_fp
    = −Σ lp over the doc's tokens is an exact long; m_fp = nll_fp div
    n_tokens is the exact per-token mean the ranking/bucketing cut
    uses; avg_nll is its rounded display form. Empty docs score 0.

    Distributed shape (the Brants design): the unigram table
    broadcasts (vocab-sized, twice: cur-lookup and context counts);
    the bigram count table is corpus-vocabulary-sized and therefore
    SHARDED — the one shuffle joins (doc, prev, cur) pairs against it
    keyed on the bigram, with map-side combine on both count aggs.
    Document text never shuffles; only token pairs move. The pair
    stream is built by posexplode over the materialized token array
    (prev = _toks[pos-1], a projection — no self-join, no window)."""
    base = df.select(
        F.col(id_col), textstats.word_tokens(F.col(text_col)).alias("_toks")
    )
    pairs = base.select(
        id_col,
        F.posexplode("_toks").alias("_pos", "cur"),
        F.col("_toks"),
    ).select(
        id_col,
        F.expr("CASE WHEN _pos = 0 THEN NULL ELSE _toks[_pos-1] END").alias(
            "prev"
        ),
        "cur",
    )
    uni = pairs.groupBy("cur").agg(F.count("*").alias("c_uni"))
    total = uni.agg(F.sum("c_uni").alias("_total"))
    uni_lp = uni.crossJoin(F.broadcast(total)).select(
        "cur",
        "c_uni",
        quantize_ln(F.col("c_uni") / F.col("_total")).alias("lp_uni"),
    )
    bi = (
        pairs.filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("c_bi"))
    )
    ctx = uni_lp.select(
        F.col("cur").alias("prev"), F.col("c_uni").alias("c_prev")
    )
    scored = (
        pairs.join(F.broadcast(uni_lp.select("cur", "lp_uni")), "cur")
        .join(F.broadcast(ctx), "prev", "left")
        .join(bi, ["prev", "cur"], "left")
        .select(
            id_col,
            F.when(F.col("prev").isNull(), F.col("lp_uni"))
            .when(
                F.col("c_bi").isNotNull(),
                quantize_ln(F.col("c_bi") / F.col("c_prev")),
            )
            .otherwise(F.lit(int(alpha_ln_fp)) + F.col("lp_uni"))
            .alias("_lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (-F.sum("_lp")).cast("long").alias("nll_fp"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("nll_fp", F.lit(0)).cast("long").alias("nll_fp"),
            F.when(F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0))
            .otherwise(F.expr("nll_fp div n_tokens"))
            .cast("long")
            .alias("m_fp"),
            F.when(F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("nll_fp") / F.col("n_tokens") / F.lit(float(SCALE)),
                    4,
                )
            )
            .alias("avg_nll"),
        )
    )


#: IDF quantization scale for the sparse-cosine weights — deliberately
#: SMALL (100, not 1e9): w = tf · idf_q must keep Σ w_a·w_b inside
#: int64 across a pair's shared tokens. tf <= 1e3, idf_q <= ~2.4e3
#: (ln of any realistic N/df times 100) -> w <= 2.4e6, per-token
#: product <= 5.8e12, and 10^5 shared tokens still sit at 5.8e17.
TFIDF_IDF_SCALE = 100


def bm25_constants(k1_x10: int = 12, b_x100: int = 75) -> tuple[float, float, int]:
    """The three BM25 constants DERIVED ONCE from integer-encoded
    parameters (k1 = k1_x10/10, b = b_x100/100) and shared verbatim by
    the Spark plan and the SQL oracle generator: c0 = k1*(1-b),
    c1 = k1*b, tf_num = (k1+1)*10 exactly. Deriving both sides from
    the same Python floats (and embedding their repr in the SQL) is
    what makes the mirrored double arithmetic bit-identical — writing
    '0.3' in SQL while Spark computes 1.2*0.25 = 0.30000000000000004
    would diverge on the floor grid."""
    k1 = k1_x10 / 10.0
    b = b_x100 / 100.0
    return k1 * (1.0 - b), k1 * b, k1_x10 + 10


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1_x10: int = 12,
    b_x100: int = 75,
    k: int = 20,
) -> DataFrame:
    """BM25 retrieval (Robertson & Walker, SIGIR 1994; the Okapi
    weighting) -> top-k documents for a bag-of-words query:
    (id, n_terms, score_fp, bm25).

    Fixed-point contract (the module discipline): per-term
      idf_fp   = floor(ln((N - df + 0.5)/(df + 0.5) + 1) * SCALE)
      denom_fp = floor((tf + c0 + c1 * dl * N / sum_dl) * 1000)
      score_fp = (idf_fp * tf * tf_num) div (denom_fp * 10)
    with c0 = k1(1-b), c1 = k1*b, tf_num = (k1+1)*10 from
    :func:`bm25_constants`. tf, dl, N, df, sum_dl are exact longs;
    the two floor() calls are the only float touch-points and both
    engines evaluate the SAME expression tree on the same exact
    inputs, so per-term scores are identical longs and the per-doc
    sum (exact long addition) is bit-identical at any partitioning.
    score_fp sits at SCALE/1000 = 1e6 x bm25 (the tf_num*10 and
    denom*10 factors cancel to k1+1); `bm25` is the readable double
    derived AFTER the cut.

    Distributed shape: the exploded token stream filters to the query
    vocabulary BEFORE any shuffle (a broadcastable isin over a few
    terms — at 100 TB only query-term hits travel); doc lengths and
    corpus totals come from one groupBy(id) aggregate; the per-term
    df / idf table is query-sized and broadcasts back. Docs matching
    no query term are absent (standard retrieval semantics). Top-k by
    (score_fp DESC, id ASC) — a total order."""
    qt = sorted({t.lower() for t in query_terms})
    if not qt:
        raise ValueError("bm25_topk needs at least one query term")
    c0, c1, tf_num = bm25_constants(k1_x10, b_x100)

    lens = df.select(
        F.col(id_col),
        F.size(textstats.word_tokens(F.col(text_col))).alias("dl"),
    )
    totals = lens.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    hits = (
        _tokens(df, text_col, id_col)
        .filter(F.col("token").isin(qt))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("c"))
    )
    dfreq = hits.groupBy("token").agg(F.count("*").alias("df_docs"))
    idf = (
        dfreq.crossJoin(F.broadcast(totals))
        .select(
            "token",
            F.floor(
                F.log(
                    (F.col("n_docs") - F.col("df_docs") + F.lit(0.5))
                    / (F.col("df_docs") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * F.lit(SCALE)
            )
            .cast("long")
            .alias("idf_fp"),
        )
    )
    scored = (
        hits.join(lens, id_col)
        .join(F.broadcast(idf), "token")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            "token",
            (
                F.col("idf_fp") * F.col("c") * F.lit(int(tf_num))
            ).alias("_num"),
            F.floor(
                (
                    F.col("c").cast("double")
                    + F.lit(c0)
                    + F.lit(c1)
                    * (
                        (F.col("dl").cast("double") * F.col("n_docs"))
                        / F.col("sum_dl")
                    )
                )
                * F.lit(1000.0)
            )
            .cast("long")
            .alias("_den"),
        )
        .select(
            id_col,
            "token",
            F.expr("_num div (_den * 10)").alias("term_fp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.countDistinct("token").cast("long").alias("n_terms"),
            F.sum("term_fp").cast("long").alias("score_fp"),
        )
        .orderBy(F.desc("score_fp"), F.col(id_col).asc())
        .limit(int(k))
        .withColumn(
            "bm25",
            F.round(F.col("score_fp") / F.lit(SCALE / 1000.0), 6),
        )
    )


def tfidf_cosine_topk(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_token_df: int | None = None,
) -> DataFrame:
    """Top-k most similar document pairs under TF-IDF cosine, computed
    through an INVERTED INDEX (the classic sparse IR join: Bayardo,
    Ma & Srikant WWW'07 "Scaling up all pairs similarity search") ->
    (id_a, id_b, dot_fp, norm2_a, norm2_b, cosine).

    Weights are exact longs: w(d, t) = tf(d, t) · floor(ln(N/df(t)) ·
    100) — the deliberately small IDF scale keeps every pair dot
    product inside int64 (see TFIDF_IDF_SCALE). dot_fp and the squared
    norms are exact long sums, so ``cosine = dot_fp / (sqrt(norm2_a) ·
    sqrt(norm2_b))`` is the same IEEE double on any engine (sqrt /
    mul / div are correctly rounded on identical inputs) and the
    (cosine DESC, id_a, id_b) cut is engine-portable. Tokens present
    in EVERY document get idf 0 and drop out — the stopword kill falls
    out of the weighting.

    This is the sparse sibling of operators/similarity.py's dense
    embedding cosine: no vectors are materialized — the dot product is
    a self-equi-join of the inverted index keyed on the token with a
    long-sum agg, which is how similarity search scales when the
    vocabulary is huge but documents are sparse. ``max_token_df``
    drops tokens whose document frequency exceeds the cap from the
    INDEX ONLY (norms stay full), the standard hot-posting guard: a
    token in f docs emits f(f−1)/2 join rows, and high-df tokens carry
    near-zero idf weight anyway. Under a cap, dot products are lower
    bounds (same documented discipline as the n-gram DF cap)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = df.select(
        F.col(id_col),
        F.explode(textstats.word_tokens(F.col(text_col))).alias("token"),
    )
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("_df"))
    ndocs = df.agg(F.countDistinct(id_col).alias("_n"))
    w = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(ndocs))
        .select(
            id_col,
            "token",
            "_df",
            (
                F.col("tf")
                * F.floor(
                    F.log(F.col("_n") / F.col("_df"))
                    * F.lit(TFIDF_IDF_SCALE)
                ).cast("long")
            ).cast("long").alias("w"),
        )
    )
    norms = w.groupBy(id_col).agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("norm2")
    )
    index = w.filter(F.col("w") > 0)
    if max_token_df is not None:
        index = index.filter(F.col("_df") <= int(max_token_df))
    ia = index.select(F.col(id_col).alias("id_a"), "token", F.col("w").alias("wa"))
    ib = index.select(F.col(id_col).alias("id_b"), "token", F.col("w").alias("wb"))
    pairs = (
        ia.join(ib, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).cast("long").alias("dot_fp"))
        .filter(F.col("dot_fp") > 0)
    )
    return (
        pairs.join(
            norms.select(F.col(id_col).alias("id_a"), F.col("norm2").alias("norm2_a")),
            "id_a",
        )
        .join(
            norms.select(F.col(id_col).alias("id_b"), F.col("norm2").alias("norm2_b")),
            "id_b",
        )
        .withColumn(
            "cosine",
            F.col("dot_fp")
            / (F.sqrt(F.col("norm2_a")) * F.sqrt(F.col("norm2_b"))),
        )
        .orderBy(F.desc("cosine"), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(int(k))
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k0: int = 60,
    k: int = 20,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR
    2009) -> top-k fused documents: (id, n_lists, rrf_fp, rrf). Each
    input carries (id_col, rank) with rank starting at 1 in its own
    retrieval order; the fused score is Σ_lists 1/(k0 + rank), the
    standard way to combine a lexical (BM25) and a dense (embedding
    cosine) arm without score calibration — only RANKS cross the
    fusion boundary, so arms with incommensurable score scales
    compose safely.

    Fixed-point contract: each contribution is the pure-integer
    scale DIV (k0 + rank) — no float enters the fusion at all (unlike
    BM25's floor()'d grids there isn't a single float touch-point);
    the per-doc sum is exact long addition and the top-k cut
    (rrf_fp DESC, id ASC) is a total order, so the result is
    bit-identical at any parallelism and restatable verbatim in SQL.
    `rrf` is the readable double derived AFTER the cut. k0=60 per the
    paper. Distributed shape: the inputs are already top-k lists
    (bounded), so the union + groupBy is a few-row job — the heavy
    lifting stays in the arms."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k0 < 0 or scale < 1:
        raise ValueError("k0 must be >= 0 and scale >= 1")
    contribs = None
    for r in rankings:
        c = r.select(
            F.col(id_col),
            F.expr(f"CAST({int(scale)} DIV ({int(k0)} + rank) AS BIGINT)")
            .alias("c"),
        )
        contribs = c if contribs is None else contribs.unionAll(c)
    fused = contribs.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_lists"),
        F.sum("c").cast("long").alias("rrf_fp"),
    )
    return (
        fused.select(
            id_col,
            "n_lists",
            "rrf_fp",
            F.round(F.col("rrf_fp") / F.lit(float(scale)), 6).alias("rrf"),
        )
        .orderBy(F.desc("rrf_fp"), F.col(id_col).asc())
        .limit(int(k))
    )
