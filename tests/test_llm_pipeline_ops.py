"""Tests for the round-4 LLM-training-pipeline operators: within-doc
repetition signals, PII redaction, train/eval n-gram decontamination,
concat-and-chunk sequence packing, and temperature-weighted domain
mixture sampling."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from gliner_transbronchialbiopsy_spark.operators import (
    decontam,
    dedup,
    graph,
    mixture,
    packing,
    pii,
    termstats,
    textstats,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# --- textstats.repetition_features ----------------------------------------
def test_repetition_duplicated_segments(spark):
    """'a b. a b. c d.' -> 3 segments, 1 duplicate -> 1/3."""
    out = textstats.repetition_features(
        _docs(spark, ["a b. a b. c d."]), dup_gram_n=2
    ).collect()[0]
    assert out["dup_segment_frac"] == pytest.approx(1 / 3, abs=1e-4)


def test_repetition_top_and_dup_bigrams(spark):
    """tokens: x y x y z -> bigrams [x y, y x, x y, y z]: top 'x y'
    twice / 4 = 0.5; duplicated grams = the two 'x y' -> 0.5."""
    out = textstats.repetition_features(
        _docs(spark, ["x y x y z"]), dup_gram_n=2
    ).collect()[0]
    assert out["top_bigram_frac"] == pytest.approx(0.5, abs=1e-4)
    assert out["dup_ngram_frac"] == pytest.approx(0.5, abs=1e-4)


def test_repetition_clean_and_empty_docs_zero(spark):
    rows = textstats.repetition_features(
        _docs(spark, ["alpha beta gamma delta.", "", "   "]), dup_gram_n=2
    ).collect()
    for r in rows:
        assert r["dup_segment_frac"] == 0.0
        assert r["dup_ngram_frac"] == 0.0


def test_repetition_whole_stage_no_shuffle(spark):
    """Pure per-row projections: zero exchanges in the plan."""
    df = textstats.repetition_features(_docs(spark, ["a b c"] * 5))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- pii.redact -----------------------------------------------------------
def test_pii_redact_all_patterns(spark):
    t = (
        "write to jane.doe+x@mail.example.org from 192.168.001.004 "
        "or call +33 612 345 678, case 123456789."
    )
    out = pii.redact(_docs(spark, [t])).collect()[0]
    assert out["n_email"] == 1
    assert out["n_ip"] == 1
    # counts are pattern-by-pattern on the RAW text (documented): the
    # phone regex also matches the IP and the digit run -> 3
    assert out["n_phone"] == 3
    assert out["n_idnum"] == 1
    assert out["n_pii_total"] == 6
    red = out["text"]
    assert "<EMAIL>" in red and "<IP>" in red and "<PHONE>" in red
    assert "jane" not in red and "192.168" not in red
    assert "123456789" not in red


def test_pii_counts_each_pattern_alone(spark):
    """One doc per pattern, crafted so no other pattern co-matches."""
    cases = [
        ("mail me at a.b@example.fr today", "n_email", "<EMAIL>"),
        ("server at 10.0.0.7 is up", "n_ip", "<IP>"),
        ("call 06 12 34 56 78 now", "n_phone", "<PHONE>"),
        ("dossier 987654 closed", "n_idnum", "<ID>"),
    ]
    rows = pii.redact(_docs(spark, [t for t, _, _ in cases])).collect()
    for r, (_, count_col, token) in zip(sorted(rows, key=lambda r: r["doc_id"]), cases):
        assert r[count_col] >= 1 and token in r["text"]
        # redaction replaced the sensitive span exactly once
        assert r["text"].count(token) == 1


def test_pii_email_shadows_digit_run(spark):
    """An email containing a long digit run redacts as <EMAIL> once;
    the digit-run count still sees it on the raw text (documented
    counts-on-original semantics)."""
    out = pii.redact(_docs(spark, ["box.1234567@ex.com"])).collect()[0]
    assert out["text"] == "<EMAIL>"
    # the '.' gives the digit run a word boundary, so it counts on the
    # raw text — but the email redacted first, so no <ID> in the output
    assert out["n_email"] == 1 and out["n_idnum"] == 1
    assert "<ID>" not in out["text"]


def test_pii_clean_text_untouched(spark):
    t = "no identifiers here, just prose with the number 42."
    out = pii.redact(_docs(spark, [t])).collect()[0]
    assert out["text"] == t and out["n_pii_total"] == 0


def test_pii_no_shuffle(spark):
    plan = (
        pii.redact(_docs(spark, ["x"]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# --- decontam.contamination -----------------------------------------------
def test_decontam_flags_planted_overlap(spark):
    leak = "the quick brown fox jumps"
    train = _docs(
        spark,
        [
            f"intro words then {leak} and a tail",  # contaminated
            "totally unrelated training text here now",  # clean
            f"{leak} {leak} again",  # contaminated, repeated gram
        ],
    )
    ev = spark.createDataFrame(
        [(100, f"benchmark asks about {leak} indeed")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in decontam.contamination(train, ev, n=5).collect()
    }
    assert set(got) == {0, 2}  # the clean doc is absent
    assert got[0]["n_hit_grams"] == 1
    # doc 2: 'fox jumps the quick brown' etc. cross-repeat grams also
    # hit only if present in eval; the leaked 5-gram counts ONCE
    # (distinct semantics) even though it occurs twice in the doc
    assert got[2]["n_hit_grams"] >= 1
    for r in got.values():
        assert r["contamination_frac"] == pytest.approx(
            r["n_hit_grams"] / r["n_grams"], abs=1e-4
        )


def test_decontam_short_docs_no_grams(spark):
    """Docs shorter than n tokens produce no grams and never appear."""
    train = _docs(spark, ["a b c", ""])
    ev = _docs(spark, ["a b c d e f"])
    assert decontam.contamination(train, ev, n=5).count() == 0


def test_decontam_eval_side_broadcasts(spark):
    train = _docs(spark, ["a b c d e f g h"] * 3)
    ev = _docs(spark, ["a b c d e"])
    plan = (
        decontam.contamination(train, ev, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


# --- packing.pack_chunks --------------------------------------------------
def test_pack_chunks_matches_single_window_cumsum(spark):
    """The distributed two-phase prefix sum must equal the naive
    single-window global cumsum on every row, including zero-token
    docs and sparse ids."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(200):
        doc_id = i * rng.choice([1, 3, 11])  # sparse, non-dense ids
        n_words = rng.choice([0, 1, 5, 50, 513])
        rows.append((doc_id, " ".join(["w"] * n_words)))
    # dedupe ids (sparse multipliers can collide)
    seen, uniq = set(), []
    for d, t in rows:
        if d not in seen:
            seen.add(d)
            uniq.append((d, t))
    df = spark.createDataFrame(uniq, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in packing.pack_chunks(df, seq_len=64, n_buckets=7).collect()
    }
    naive = df.select(
        "doc_id",
        textstats.token_count_ws(F.col("text")).alias("n_tokens"),
    ).withColumn(
        "cum",
        F.sum("n_tokens").over(
            W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    for r in naive.collect():
        g = got[r["doc_id"]]
        start = r["cum"] - r["n_tokens"]
        assert g["token_start"] == start
        assert g["first_chunk"] == start // 64
        if r["n_tokens"] > 0:
            assert g["last_chunk"] == (r["cum"] - 1) // 64
            assert g["n_chunks"] == g["last_chunk"] - g["first_chunk"] + 1
        else:
            assert g["n_chunks"] == 0


def test_pack_chunks_no_single_partition_window(spark):
    """The scale point: no Window over a SinglePartition exchange —
    the running sum is per-bucket."""
    df = _docs(spark, ["w " * 20] * 50)
    plan = (
        packing.pack_chunks(df, seq_len=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_pack_chunks_empty_and_bad_seq_len(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert packing.pack_chunks(empty).count() == 0
    with pytest.raises(ValueError):
        packing.pack_chunks(empty, seq_len=0)


# --- mixture.mixture_sample -----------------------------------------------
def _sourced(spark, counts):
    rows, i = [], 0
    for src, n in counts.items():
        for _ in range(n):
            rows.append((i, src, f"text {i}"))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_mixture_rates_formula(spark):
    """alpha=0.5, two sources 400/100: w = 20/(20+10), 10/30;
    rate_a = min(1, 0.5*500*(2/3)/400), rate_b = min(1, 0.5*500*(1/3)/100)."""
    df = _sourced(spark, {"a": 400, "b": 100})
    rates = {
        r["source"]: r["keep_rate"]
        for r in mixture.source_rates(df, alpha=0.5, target_frac=0.5).collect()
    }
    assert rates["a"] == pytest.approx(0.5 * 500 * (2 / 3) / 400, abs=1e-6)
    assert rates["b"] == pytest.approx(0.5 * 500 * (1 / 3) / 100, abs=1e-6)


def test_mixture_alpha_one_is_uniform_rate(spark):
    """alpha=1 -> w_s = n_s/N -> every source keeps target_frac."""
    df = _sourced(spark, {"a": 300, "b": 60, "c": 10})
    for r in mixture.source_rates(df, alpha=1.0, target_frac=0.25).collect():
        assert r["keep_rate"] == pytest.approx(0.25, abs=1e-6)


def test_mixture_sample_deterministic_and_near_target(spark):
    df = _sourced(spark, {"a": 500, "b": 125})
    s1 = sorted(
        r["doc_id"]
        for r in mixture.mixture_sample(df, alpha=0.5, target_frac=0.5).collect()
    )
    s2 = sorted(
        r["doc_id"]
        for r in mixture.mixture_sample(
            df.repartition(13), alpha=0.5, target_frac=0.5
        ).collect()
    )
    assert s1 == s2  # partitioning-independent determinism
    # kept fraction within sampling noise of the target
    assert 0.35 < len(s1) / 625 < 0.65


def test_mixture_rare_source_rate_caps_at_one(spark):
    """A very rare source's boost can exceed 1 -> capped."""
    df = _sourced(spark, {"big": 1000, "tiny": 2})
    rates = {
        r["source"]: r["keep_rate"]
        for r in mixture.source_rates(df, alpha=0.3, target_frac=0.9).collect()
    }
    assert rates["tiny"] == 1.0


# --- termstats: unigram-LM perplexity + TF-IDF ----------------------------
def _py_unigram_nll(texts):
    """Pure-python restatement of the fixed-point unigram NLL."""
    import math
    from collections import Counter

    toks = [t.strip().lower().split() for t in texts]
    counts = Counter(tok for tk in toks for tok in tk)
    total = sum(counts.values())
    lp = {
        t: math.floor(math.log(c / total) * 1_000_000_000)
        for t, c in counts.items()
    }
    return [
        (-sum(lp[tok] for tok in tk), len(tk)) for tk in toks
    ]


def test_perplexity_matches_python_oracle(spark):
    texts = [
        "the cat sat on the mat",
        "the the the rare rare word",
        "zebra quux",
        "",
    ]
    out = {
        r["doc_id"]: (r["nll_fp"], r["n_tokens"], r["avg_nll"])
        for r in termstats.perplexity_score(_docs(spark, texts)).collect()
    }
    want = _py_unigram_nll([t for t in texts if t.strip()])
    assert out[0][:2] == want[0]
    assert out[1][:2] == want[1]
    assert out[2][:2] == want[2]
    # empty doc: defined as zero
    assert out[3] == (0, 0, 0.0)
    # rare-token doc scores strictly worse (higher NLL) than common-token doc
    assert out[2][2] > out[0][2]


def test_perplexity_deterministic_across_partitioning(spark):
    texts = [f"tok{i % 7} tok{i % 3} shared common words" for i in range(50)]
    docs = _docs(spark, texts)
    a = sorted(
        (r["doc_id"], r["nll_fp"])
        for r in termstats.perplexity_score(docs.repartition(1)).collect()
    )
    b = sorted(
        (r["doc_id"], r["nll_fp"])
        for r in termstats.perplexity_score(docs.repartition(16)).collect()
    )
    assert a == b  # exact long equality, not approx


def test_perplexity_buckets_tertiles(spark):
    """9 docs with three distinct quality tiers land 3/3/3 in
    head/middle/tail; empty docs are excluded; buckets ordered by
    per-token NLL (head = lowest)."""
    texts = (
        ["common words only"] * 3          # all high-frequency tokens
        + ["common words rare%d" % i for i in range(3)]   # one rare each
        + ["odd%d odd%d odd%d" % (i, i + 10, i + 20) for i in range(3)]
        + [""]
    )
    out = termstats.perplexity_buckets(_docs(spark, texts)).collect()
    assert len(out) == 9  # empty doc excluded
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["m_fp"])
    assert {k: len(v) for k, v in by_bucket.items()} == {
        "head": 3, "middle": 3, "tail": 3
    }
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    # docs 0-2 are the all-common tier
    heads = {r["doc_id"] for r in out if r["bucket"] == "head"}
    assert heads == {0, 1, 2}


def test_perplexity_buckets_deterministic_across_partitioning(spark):
    texts = [f"tok{i % 7} tok{i % 3} shared common words x{i % 5}" for i in range(60)]
    docs = _docs(spark, texts)
    a = sorted(
        (r["doc_id"], r["bucket"], r["m_fp"])
        for r in termstats.perplexity_buckets(docs.repartition(1)).collect()
    )
    b = sorted(
        (r["doc_id"], r["bucket"], r["m_fp"])
        for r in termstats.perplexity_buckets(docs.repartition(16)).collect()
    )
    assert a == b


def test_score_with_lm_frozen_reference_and_oov(spark):
    ref = _docs(spark, ["common words common words", "common stuff"])
    toks = ref.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("_total"))
    lm = vocab.crossJoin(F.broadcast(total)).select(
        "token",
        termstats.quantize_ln(F.col("c") / F.col("_total")).alias("lp_fp"),
    )
    scored = {
        r["doc_id"]: r["nll_fp"]
        for r in termstats.score_with_lm(
            _docs(spark, ["common words", "utterly unseen"]), lm
        ).collect()
    }
    # OOV default: one SCALE unit worse than the rarest known token —
    # the all-OOV doc must score strictly worse than the in-vocab doc
    assert scored[1] > scored[0]


def test_tfidf_topk_unique_term_wins(spark):
    texts = [
        "shared shared shared unique1",
        "shared shared shared unique2",
        "shared shared shared unique3",
    ]
    top1 = {
        r["doc_id"]: r["term"]
        for r in termstats.tfidf_topk(_docs(spark, texts), k=1).collect()
    }
    # 'shared' has idf=ln(1)=0 -> score 0; the unique term wins each doc
    assert top1 == {0: "unique1", 1: "unique2", 2: "unique3"}


def test_tfidf_topk_exact_scores(spark):
    import math

    texts = ["a a b", "b c"]
    rows = termstats.tfidf_topk(_docs(spark, texts), k=3).collect()
    got = {(r["doc_id"], r["term"]): r["score_fp"] for r in rows}
    idf_a = math.floor(math.log(2 / 1) * 1e9)  # df(a)=1, N=2
    idf_b = 0  # df(b)=2 -> ln(1)=0
    idf_c = math.floor(math.log(2 / 1) * 1e9)
    assert got[(0, "a")] == (2 * idf_a) // 3
    assert got[(0, "b")] == 0 * idf_b
    assert got[(1, "c")] == (1 * idf_c) // 2


def _py_pmi(texts, min_count, k):
    """Pure-python restatement of the fixed-point bigram PMI top-k."""
    import math
    from collections import Counter

    toks = [t.strip().lower().split() for t in texts if t.strip()]
    uni = Counter(tok for tk in toks for tok in tk)
    bi = Counter(
        (tk[i], tk[i + 1]) for tk in toks for i in range(len(tk) - 1)
    )
    nu, nb = sum(uni.values()), sum(bi.values())
    rows = []
    for (w1, w2), c in bi.items():
        if c < min_count:
            continue
        arg = (float(c) * nu * nu) / (
            float(uni[w1]) * uni[w2] * nb
        )
        rows.append((w1, w2, c, math.floor(math.log(arg) * 1_000_000_000)))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:k]


def test_pmi_collocations_matches_python_oracle(spark):
    texts = [
        "new york is a big city and new york never sleeps",
        "los angeles and new york host the games",
        "the cat and the dog and the bird",
        "machine learning and machine learning again",
        "",
        "solo",
    ]
    got = [
        (r["w1"], r["w2"], r["c_xy"], r["pmi_fp"])
        for r in termstats.pmi_collocations(
            _docs(spark, texts), min_count=2, k=10
        ).collect()
    ]
    assert got == _py_pmi(texts, 2, 10)
    # a genuine collocation must outrank a chance pairing of common words
    ranks = {(w1, w2): i for i, (w1, w2, _, _) in enumerate(got)}
    assert ranks[("machine", "learning")] < ranks[("and", "the")]


def test_pmi_collocations_min_count_prunes(spark):
    texts = ["alpha beta alpha beta", "gamma delta"]
    got = termstats.pmi_collocations(
        _docs(spark, texts), min_count=2, k=10
    ).collect()
    # only (alpha, beta) reaches min_count=2; (gamma, delta) et al pruned
    assert [(r["w1"], r["w2"]) for r in got] == [("alpha", "beta")]


# --- dedup.line_dedup -----------------------------------------------------
def test_line_dedup_removes_cross_doc_boilerplate(spark):
    rows = [
        (1, ["COOKIE BANNER", "real content one", "footer x"]),
        (2, ["COOKIE BANNER", "real content two", "footer x"]),
        (3, ["only original lines here"]),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lines array<string>"
    )
    out = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["lines_kept"])
        for r in dedup.line_dedup(docs, "lines").collect()
    }
    # COOKIE BANNER and footer x occur twice -> dropped everywhere;
    # order of survivors preserved
    assert out[1] == (3, 2, ["real content one"])
    assert out[2] == (3, 2, ["real content two"])
    assert out[3] == (1, 0, ["only original lines here"])


def test_line_dedup_doc_fully_boilerplate_and_empty(spark):
    rows = [
        (1, ["dup line", "dup line2"]),
        (2, ["dup line", "dup line2"]),
        (3, []),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lines array<string>"
    )
    out = {
        r["doc_id"]: (r["n_removed"], r["lines_kept"])
        for r in dedup.line_dedup(docs, "lines").collect()
    }
    assert out[1] == (2, [])  # every line was boilerplate
    assert out[3] == (0, [])  # no lines in, none out


def test_line_dedup_max_occurrences_threshold(spark):
    rows = [(i, ["twice" if i < 2 else "thrice"]) for i in range(5)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lines array<string>"
    )
    # cap 2: 'twice' (2 occurrences) survives, 'thrice' (3) is dropped
    out = {
        r["doc_id"]: r["n_removed"]
        for r in dedup.line_dedup(docs, "lines", max_occurrences=2).collect()
    }
    assert out[0] == 0 and out[1] == 0
    assert out[2] == 1 and out[3] == 1 and out[4] == 1


def test_token_windows_shapes(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, ""), (3, "x")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["w"]
        for r in df.select(
            "doc_id", dedup.token_windows(F.col("text"), 2).alias("w")
        ).collect()
    }
    assert out[1] == ["a b", "c d", "e"]
    assert out[2] == []
    assert out[3] == ["x"]


# --- graph.pagerank -------------------------------------------------------
def test_pagerank_star_center_dominates(spark):
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub")],
        "src string, dst string",
    )
    e = graph.pagerank_edges_from(edges, "src", "dst", symmetric=True)
    ranks = {
        r["node"]: r["rank_fp"]
        for r in graph.pagerank(e, weight="w", iterations=8).collect()
    }
    assert ranks["hub"] > ranks["a"]
    assert ranks["a"] == ranks["b"] == ranks["c"] == ranks["d"]
    # total mass conserved up to integer flooring (never exceeds SCALE)
    assert sum(ranks.values()) <= graph.SCALE
    assert sum(ranks.values()) > graph.SCALE * 0.98


def test_ppr_mass_concentrates_near_seed(spark):
    """Barbell: two 3-cliques joined by one bridge. Seeding in clique
    A ranks A's members above the mirror-image members of clique B —
    plain PageRank would tie them by symmetry."""
    a = [("a1", "a2"), ("a1", "a3"), ("a2", "a3")]
    b = [("b1", "b2"), ("b1", "b3"), ("b2", "b3")]
    bridge = [("a1", "b1")]
    e = graph.pagerank_edges_from(
        spark.createDataFrame(a + b + bridge, "src string, dst string"),
        "src", "dst", symmetric=True,
    )
    seeds = spark.createDataFrame([("a2",)], "node string")
    ppr = {
        r["node"]: r["rank_fp"]
        for r in graph.pagerank(e, weight="w", iterations=8, seeds=seeds).collect()
    }
    assert ppr["a2"] > ppr["a1"] or ppr["a2"] > ppr["a3"]
    assert ppr["a3"] > ppr["b3"] and ppr["a1"] > ppr["b1"]
    plain = {
        r["node"]: r["rank_fp"]
        for r in graph.pagerank(e, weight="w", iterations=8).collect()
    }
    assert plain["a3"] == plain["b3"]  # the symmetry PPR breaks


def test_ppr_seed_validation(spark):
    e = graph.pagerank_edges_from(
        spark.createDataFrame([("x", "y")], "src string, dst string"),
        "src", "dst", symmetric=True,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="seed"):
        graph.pagerank(
            e, weight="w", iterations=2,
            seeds=spark.createDataFrame([("zzz",)], "node string"),
        )
    # seeds outside the graph are ignored when at least one is inside
    ranks = graph.pagerank(
        e, weight="w", iterations=2,
        seeds=spark.createDataFrame([("x",), ("zzz",)], "node string"),
    )
    assert ranks.count() == 2


def test_pagerank_deterministic_across_parallelism(spark):
    import random

    rng = random.Random(7)
    rows = [
        (f"n{rng.randrange(200)}", f"n{rng.randrange(200)}")
        for _ in range(2000)
    ]
    edges = spark.createDataFrame(rows, "src string, dst string")
    e = graph.pagerank_edges_from(edges, "src", "dst")
    a = sorted(
        map(tuple, graph.pagerank(e.repartition(1), weight="w").collect())
    )
    b = sorted(
        map(tuple, graph.pagerank(e.repartition(32), weight="w").collect())
    )
    assert a == b  # bit-identical longs at any partitioning


def test_pagerank_zero_iterations_is_uniform_init(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    e = graph.pagerank_edges_from(edges, "src", "dst")
    ranks = {
        r["node"]: r["rank_fp"]
        for r in graph.pagerank(e, weight="w", iterations=0).collect()
    }
    assert set(ranks.values()) == {graph.SCALE // 3}


def test_pagerank_validates_args(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        graph.pagerank(edges, iterations=-1)
    with pytest.raises(ValueError):
        graph.pagerank(edges, damping_pct=101)


# --- dedup.incremental_dedup ----------------------------------------------
def test_incremental_dedup_exact_near_and_kept(spark):
    seen = _docs(spark, [
        "the quick brown fox jumps over the lazy dog every single day",
        "completely different historical content about spark engines",
    ])
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog every single day"),
            (11, "the quick brown fox jumps over the lazy dog every single NIGHT"),
            (12, "entirely novel text that matches nothing in the history at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["reject_reason"]
        for r in dedup.incremental_dedup(
            new, seen, jaccard_threshold=0.5, portable_hash=True
        ).collect()
    }
    assert out == {10: "exact", 11: "near_duplicate", 12: None}


def test_incremental_dedup_exact_charges_before_near(spark):
    """A new doc byte-identical to history is 'exact' even though it
    would also be a trivial near-dup; its signature is never computed
    (survivors exclude it) so it cannot double-charge."""
    text = "shared byte identical document text goes right here okay"
    seen = _docs(spark, [text])
    new = spark.createDataFrame(
        [(5, text)], "doc_id long, text string"
    )
    out = dedup.incremental_dedup(
        new, seen, jaccard_threshold=0.1, portable_hash=True
    ).collect()
    assert out[0]["reject_reason"] == "exact"


def test_incremental_dedup_within_batch_dups_not_flagged(spark):
    """Two identical NEW docs with no history match both pass — the
    operator's contract is history-only (intra-batch dedup is
    exact_duplicates/minhash_near_duplicates)."""
    seen = _docs(spark, ["some unrelated history document content here"])
    t = "twin new documents that only duplicate each other not history"
    new = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id long, text string"
    )
    out = dedup.incremental_dedup(
        new, seen, jaccard_threshold=0.5, portable_hash=True
    ).collect()
    assert all(r["reject_reason"] is None for r in out)


def test_incremental_dedup_near_dup_off(spark):
    seen = _docs(spark, ["alpha beta gamma delta epsilon zeta eta theta"])
    new = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta IOTA")],
        "doc_id long, text string",
    )
    out = dedup.incremental_dedup(new, seen, near_dup=False).collect()
    assert out[0]["reject_reason"] is None


# --- dsir (hashed unigram importance weights) -------------------------------
def test_dsir_weights_ranks_target_like_docs_higher(spark):
    from gliner_transbronchialbiopsy_spark.operators import dsir

    raw = _docs(
        spark,
        [
            "chat chat chat chat",          # pure target-style
            "news news news news",          # pure raw-majority style
            "chat news chat news",          # mixed
            "",                              # empty -> 0
        ],
    )
    target = _docs(spark, ["chat chat chat chat chat"])
    out = dsir.dsir_weights(raw, target, n_buckets=64)
    w = {r["doc_id"]: (r["n_tokens"], r["w_fp"], r["avg_w"]) for r in out.collect()}
    assert set(w) == {0, 1, 2, 3}
    assert w[3] == (0, 0, 0.0)                 # empty doc
    assert w[0][2] > w[2][2] > w[1][2]         # target-like > mixed > off-target
    # exact long arithmetic: mixed doc = average of the two pure docs
    assert w[2][1] * 2 == w[0][1] + w[1][1]


def test_round_keep_sign_negative_zero_readout(spark):
    """Regression pin for the round-5 driver red on dsir_weights: a
    tiny NEGATIVE fixed-point quantity must read out as -0.0 (SQL
    round keeps IEEE signed zero; Spark's BigDecimal round alone
    returns +0.0 — value-identical, hash-fatal)."""
    import math

    from gliner_transbronchialbiopsy_spark.operators.termstats import (
        round_keep_sign,
    )

    df = spark.createDataFrame(
        [(-1, 5_000_000_000), (1, 5_000_000_000), (0, 5),
         (-600_000, 1), (600_000, 1)],
        "w_fp long, n long",
    )
    rows = df.select(
        "w_fp",
        round_keep_sign(
            F.col("w_fp") / F.col("n") / F.lit(1e9), 4
        ).alias("avg_w"),
    ).collect()
    got = {r["w_fp"]: r["avg_w"] for r in rows}
    assert got[-1] == 0.0 and math.copysign(1.0, got[-1]) == -1.0
    assert got[1] == 0.0 and math.copysign(1.0, got[1]) == 1.0
    assert got[0] == 0.0 and math.copysign(1.0, got[0]) == 1.0
    # non-zero results pass through the plain round unchanged
    assert got[-600_000] == -0.0006 and got[600_000] == 0.0006


def test_dsir_portable_and_production_agree_on_ranking(spark):
    from gliner_transbronchialbiopsy_spark.operators import dsir

    raw = _docs(spark, ["chat chat", "news news", "chat news"])
    target = _docs(spark, ["chat chat chat"])
    rank = []
    for portable in (False, True):
        out = dsir.dsir_weights(raw, target, n_buckets=4096, portable_hash=portable)
        rank.append(
            [r["doc_id"] for r in out.orderBy(F.desc("w_fp"), "doc_id").collect()]
        )
    # hash family changes bucket values, not the induced ordering
    # (no collisions at 4096 buckets over a 2-type vocab)
    assert rank[0] == rank[1] == [0, 2, 1]


def test_dsir_select_top_n_deterministic(spark):
    from gliner_transbronchialbiopsy_spark.operators import dsir

    raw = _docs(spark, ["chat chat", "news news", "chat news", "chat"])
    target = _docs(spark, ["chat"])
    top = dsir.dsir_select(raw, target, n=2, n_buckets=64)
    ids = sorted(r["doc_id"] for r in top.collect())
    assert ids == [0, 3]  # the two pure-chat docs, tie broken by id


def test_dsir_empty_target_is_uniform_smoothing_only(spark):
    from gliner_transbronchialbiopsy_spark.operators import dsir

    raw = _docs(spark, ["a a", "b b"])
    target = _docs(spark, [])
    out = dsir.dsir_weights(raw, target, n_buckets=64)
    rows = {r["doc_id"]: r["w_fp"] for r in out.collect()}
    # with an empty target every bucket gets the same smoothed target
    # lp; both docs have 2 tokens of one type -> equal weights
    assert rows[0] == rows[1]


# --- BPE tokenizer induction -------------------------------------------------
def _bpe_reference(word_cnt: dict, n_merges: int):
    """Pure-python BPE with the same total-order tie-break."""
    seg = {w: list(w) for w in word_cnt}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, syms in seg.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_cnt[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((a, b, n))
        for w, syms in seg.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seg[w] = out
    return merges, seg


def test_bpe_train_matches_pure_python_reference(spark):
    from gliner_transbronchialbiopsy_spark.operators import bpe

    texts = [
        "low low low lower lowest",
        "new newer newest low widest wide",
        "wider wide low newer",
    ]
    docs = _docs(spark, texts)
    merges, seg = bpe.bpe_train(docs, 8)

    wc = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    ref_merges, ref_seg = _bpe_reference(wc, 8)
    assert merges == ref_merges
    got_seg = {r["word"]: r["syms"] for r in seg.collect()}
    assert got_seg == ref_seg


def test_bpe_train_early_stop_when_no_repeated_pair(spark):
    from gliner_transbronchialbiopsy_spark.operators import bpe

    docs = _docs(spark, ["ab cd ef"])  # every pair occurs once
    merges, seg = bpe.bpe_train(docs, 10)
    assert merges == []
    assert {tuple(r["syms"]) for r in seg.collect()} == {
        ("a", "b"), ("c", "d"), ("e", "f")
    }


def test_bpe_apply_matches_trained_segmentation(spark):
    from gliner_transbronchialbiopsy_spark.operators import bpe

    docs = _docs(spark, ["banana bandana", "ban ban banana"])
    merges, seg = bpe.bpe_train(docs, 4)
    enc = bpe.bpe_apply(docs, merges)
    seg_map = {r["word"]: r["syms"] for r in seg.collect()}
    for row in enc.select("doc_id", "text", "bpe_tokens").collect():
        expect = [s for w in row["text"].split() for s in seg_map[w]]
        assert row["bpe_tokens"] == expect


def test_bpe_apply_guards_oversized_merge_lists(spark):
    from gliner_transbronchialbiopsy_spark.operators import bpe

    docs = _docs(spark, ["x"])
    with pytest.raises(ValueError, match="pandas UDF"):
        bpe.bpe_apply(docs, [("a", "b")] * 65)


def test_bpe_word_counts_follows_shared_tokenizer_contract(spark):
    # regression: BPE's text scan must use the one shared tokenizer
    # (textstats.word_tokens) — tabs/newlines/runs of spaces split,
    # blank text yields no words, lowercase=False keeps case
    from gliner_transbronchialbiopsy_spark.operators import bpe

    docs = _docs(spark, ["  Foo\tbar\n\nfoo  ", "   ", ""])
    lower = {
        r["word"]: r["cnt"] for r in bpe.word_counts(docs).collect()
    }
    assert lower == {"foo": 2, "bar": 1}
    kept = {
        r["word"]: r["cnt"]
        for r in bpe.word_counts(docs, lowercase=False).collect()
    }
    assert kept == {"Foo": 1, "foo": 1, "bar": 1}


def test_bpe_merge_overlapping_run_is_left_greedy(spark):
    from gliner_transbronchialbiopsy_spark.operators import bpe
    from pyspark.sql import functions as F2

    # 'aaaa' + merge (a,a) -> [aa, aa]; 'aaa' -> [aa, a]
    df = spark.createDataFrame([("aaaa", 1), ("aaa", 1)], "word string, cnt long")
    seg = df.select(
        "word", bpe._merge_fold(F2.split(F2.col("word"), ""), "a", "a").alias("syms")
    )
    got = {r["word"]: r["syms"] for r in seg.collect()}
    assert got == {"aaaa": ["aa", "aa"], "aaa": ["aa", "a"]}


def test_bpe_train_batched_parity_on_disjoint_pairs(spark):
    """batch=k equals batch=1 equals pure python when every elected
    pair is symbol-disjoint (counts of disjoint pairs are invariant
    under each other's merges — the batching precondition)."""
    from gliner_transbronchialbiopsy_spark.operators import bpe

    texts = ["ab ab cd cd ef ef gh gh ij ij kl kl"]
    docs = _docs(spark, texts)
    wc = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    ref_merges, ref_seg = _bpe_reference(wc, 6)
    m1, s1 = bpe.bpe_train(docs, 6, batch=1)
    m4, s4 = bpe.bpe_train(docs, 6, batch=4)
    assert m1 == m4 == ref_merges
    assert (
        {r["word"]: r["syms"] for r in s1.collect()}
        == {r["word"]: r["syms"] for r in s4.collect()}
        == ref_seg
    )


def test_bpe_train_batched_round_count(spark, monkeypatch):
    """VERDICT r4 #3: a 256-merge vocabulary trains in O(merges/batch)
    Spark rounds, not 256 — counted by intercepting the per-round
    pair_counts call."""
    from gliner_transbronchialbiopsy_spark.operators import bpe

    # 256 symbol-disjoint two-char words (caseless CJK codepoints so
    # lowercase=True cannot collapse symbols), each occurring twice
    words = [chr(0x4E00 + 2 * i) + chr(0x4E01 + 2 * i) for i in range(256)]
    text = " ".join(words + words)
    docs = _docs(spark, [text])
    calls = {"n": 0}
    real = bpe.pair_counts

    def counting(df):
        calls["n"] += 1
        return real(df)

    monkeypatch.setattr(bpe, "pair_counts", counting)
    merges, _ = bpe.bpe_train(docs, 256, batch=32)
    assert len(merges) == 256
    assert {(a, b) for a, b, _ in merges} == {(w[0], w[1]) for w in words}
    assert all(n == 2 for _, _, n in merges)
    # 256/32 = 8 full rounds; allow the +1 safety round shape but pin
    # the order of magnitude (sequential would be 256 calls)
    assert calls["n"] <= 10, calls["n"]


def test_bpe_train_batched_divergence_case_documented(spark):
    """The documented divergence: sequential BPE recounts after every
    merge and so can elect a pair CREATED by the previous merge;
    batched election works from one snapshot and elects the best
    disjoint pair instead. th/the corpora show exactly that."""
    from gliner_transbronchialbiopsy_spark.operators import bpe

    # counts: (t,h)=9, (h,e)=4, (x,y)=3
    texts = ["th th th th th the the the the xy xy xy"]
    docs = _docs(spark, texts)
    seq, _ = bpe.bpe_train(docs, 2, batch=1)
    bat, _ = bpe.bpe_train(docs, 2, batch=2)
    # sequential: after t+h, the created ('th','e') pair outranks (x,y)
    assert seq == [("t", "h", 9), ("th", "e", 4)]
    # batched: ('h','e') conflicts with ('t','h') inside one snapshot,
    # so the best DISJOINT pair (x,y) fills the batch
    assert bat == [("t", "h", 9), ("x", "y", 3)]


# --- dedup.duplicate_passages ------------------------------------------------
def test_duplicate_passages_detects_shared_windows(spark):
    from gliner_transbronchialbiopsy_spark.operators import dedup

    shared = "one two three four five six seven eight"  # 8 tokens
    docs = _docs(spark, [
        f"alpha {shared} omega",
        f"beta gamma {shared}",
        "totally different words here with no overlap at all ok",
    ])
    out = {r["doc_id"]: r for r in
           dedup.duplicate_passages(docs, n=8).collect()}
    assert set(out) == {0, 1}
    # doc 0: 10 tokens -> 3 windows; only the exact shared window dups
    assert out[0]["n_tokens"] == 10 and out[0]["n_windows"] == 3
    assert out[0]["n_dup_windows"] == 1
    assert out[0]["dup_covered_tokens"] == 8
    assert out[1]["n_dup_windows"] == 1
    assert out[1]["dup_covered_tokens"] == 8


def test_duplicate_passages_merges_overlapping_coverage(spark):
    from gliner_transbronchialbiopsy_spark.operators import dedup

    # two docs share a 5-token run -> with n=4, two overlapping dup
    # windows each; union coverage = 5 tokens, not 8
    run = "p q r s t"
    docs = _docs(spark, [f"{run} xx1 yy1", f"zz2 {run} ww2"])
    out = {r["doc_id"]: r for r in
           dedup.duplicate_passages(docs, n=4).collect()}
    assert out[0]["n_dup_windows"] == 2
    assert out[0]["dup_covered_tokens"] == 5
    assert out[1]["dup_covered_tokens"] == 5


def test_duplicate_passages_case_and_whitespace_follow_tokenizer(spark):
    from gliner_transbronchialbiopsy_spark.operators import dedup

    docs = _docs(spark, ["Foo  Bar\tBaz qux", "foo bar baz QUX"])
    out = dedup.duplicate_passages(docs, n=4).collect()
    assert {r["doc_id"] for r in out} == {0, 1}
    assert all(r["n_dup_windows"] == 1 for r in out)


def test_duplicate_passages_validation(spark):
    from gliner_transbronchialbiopsy_spark.operators import dedup

    docs = _docs(spark, ["a b c"])
    with pytest.raises(ValueError, match="min_docs"):
        dedup.duplicate_passages(docs, min_docs=1)
    with pytest.raises(ValueError, match="n must"):
        dedup.duplicate_passages(docs, n=0)


def test_winnow_matches_bruteforce_and_guarantee(spark):
    import hashlib
    import random

    from gliner_transbronchialbiopsy_spark.operators import textstats

    def py_winnow(t, k, w):
        if len(t) < k:
            return []
        hs = [
            int(hashlib.sha256(t[i:i + k].encode()).hexdigest()[:15], 16)
            for i in range(len(t) - k + 1)
        ]
        if len(hs) <= w - 1:
            m = min(hs)
            i = max(j for j, v in enumerate(hs) if v == m)
            return [(i, hs[i])]
        sel = set()
        for j in range(len(hs) - w + 1):
            win = hs[j:j + w]
            m = min(win)
            i = j + max(q for q, v in enumerate(win) if v == m)
            sel.add((i, hs[i]))
        return sorted(sel)

    rng = random.Random(13)
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaa",          # all-ties: rightmost-min rule matters
        "abcabcabcabc",          # periodic
        "xy",                    # shorter than k -> no fingerprints
        "hello",                 # fewer hashes than w -> global min
        "",                      # empty
    ] + [
        "".join(rng.choice("abcdef ") for _ in range(rng.randint(3, 80)))
        for _ in range(20)
    ]
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: [(x["pos"], x["fp"]) for x in r["fps"]]
        for r in textstats.winnow_fingerprints(
            df, k=3, w=4, portable_hash=True
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[str(i)] == py_winnow(t, 3, 4), (i, t)

    # the winnowing guarantee: a shared substring of length >= k+w-1
    # produces at least one identical fingerprint in both documents
    shared = "zqvwxzyqpr"  # length 10 >= 3+4-1
    a, b = "AAA" + shared + "BBBB", "cc" + shared + "ddddddd"
    df2 = spark.createDataFrame(
        [("a", a), ("b", b)], "doc_id string, text string"
    )
    fps = {
        r["doc_id"]: {x["fp"] for x in r["fps"]}
        for r in textstats.winnow_fingerprints(
            df2, k=3, w=4, portable_hash=True
        ).collect()
    }
    assert fps["a"] & fps["b"]


def test_winnow_pairs_finds_edited_copy(spark):
    from gliner_transbronchialbiopsy_spark.operators import textstats

    shared = "def compute_totals(rows): return sum(r.value for r in rows)"
    docs = [
        ("a", "HEADER V1\n" + shared + "\nfooter alpha"),
        ("b", "completely different preamble. " + shared + " trailing z"),
        ("c", "nothing in common with the others at all, truly."),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in textstats.winnow_pairs(
            df, k=8, w=4, min_shared=2, portable_hash=True
        ).collect()
    }
    assert ("a", "b") in got and got[("a", "b")] >= 2
    assert all({p} <= {("a", "b")} for p in got)

    # hot-key cap: a fingerprint shared by every doc is dropped when
    # max_fp_docs excludes it
    boiler = [("d%d" % i, "LICENSE APACHE 2.0 common header")
              for i in range(5)]
    df2 = spark.createDataFrame(boiler, "doc_id string, text string")
    n = textstats.winnow_pairs(
        df2, k=8, w=4, min_shared=1, max_fp_docs=4, portable_hash=True
    ).count()
    assert n == 0  # every fp hits 5 docs > cap 4


# --- ES weighted sampling without replacement ---------------------------------
def _py_es_key(ident: int, weight: int) -> int:
    """Pure-python restatement of sampling.es_key (hashlib sha256)."""
    import hashlib

    best = -1
    for j in range(1, weight + 1):
        h = hashlib.sha256(f"{ident}\x1f{j}".encode()).hexdigest()
        best = max(best, int(h[:15], 16))
    return best


def test_weighted_sample_matches_pure_python_exactly(spark):
    from gliner_transbronchialbiopsy_spark.operators import sampling
    import pyspark.sql.functions as F

    rows = [(i, 1 + (i * 7) % 5) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, weight long")
    got = [
        (r["doc_id"], r["es_key"])
        for r in sampling.weighted_sample(df, "doc_id", "weight", k=25)
        .orderBy(F.desc("es_key"), "doc_id").collect()
    ]
    expect = sorted(
        ((i, _py_es_key(i, w)) for i, w in rows),
        key=lambda t: (-t[1], t[0]),
    )[:25]
    assert got == expect


def test_weighted_sample_k1_inclusion_proportional_to_weight():
    """For k=1 the ES inclusion probability is exactly w_i / sum(w);
    check the integer construction statistically over 4000 independent
    2-item universes (weight 4 vs 1 -> winner ratio ~= 4). Pure-python
    arithmetic, exact-parity with Spark via the test above."""
    wins = 0
    trials = 4000
    for t in range(trials):
        a = _py_es_key(t * 2, 4)
        b = _py_es_key(t * 2 + 1, 1)
        wins += a > b
    # expected 0.8 +/- 4.75 sigma band (sigma ~= 0.0063)
    assert 0.77 <= wins / trials <= 0.83


def test_weighted_sample_rejects_out_of_range_weights(spark):
    from gliner_transbronchialbiopsy_spark.operators import sampling
    import pytest as _pytest

    df = spark.createDataFrame([(1, 0)], "doc_id long, weight long")
    with _pytest.raises(Exception, match="weight out of"):
        sampling.weighted_sample(df, "doc_id", "weight", k=1).collect()
    df2 = spark.createDataFrame(
        [(1, sampling.MAX_WEIGHT + 1)], "doc_id long, weight long"
    )
    with _pytest.raises(Exception, match="weight out of"):
        sampling.weighted_sample(df2, "doc_id", "weight", k=1).collect()


def test_weighted_sample_plan_is_takeordered_no_exchange(spark):
    from gliner_transbronchialbiopsy_spark.operators import sampling
    import pyspark.sql.functions as F

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (1 + F.col("id") % 8).alias("weight")
    )
    out = sampling.weighted_sample(df, "doc_id", "weight", k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_weighted_sample_per_group_matches_pure_python(spark):
    from gliner_transbronchialbiopsy_spark.operators import sampling

    rows = [(i, f"g{i % 3}", 1 + (i * 5) % 4) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, src string, weight long")
    got = sorted(
        (r["src"], r["rk"], r["doc_id"])
        for r in sampling.weighted_sample_per_group(
            df, "src", "doc_id", "weight", k=4
        ).collect()
    )
    exp = []
    for g in ("g0", "g1", "g2"):
        members = [(i, _py_es_key(i, w)) for i, gg, w in rows if gg == g]
        members.sort(key=lambda t: (-t[1], t[0]))
        exp += [(g, rk + 1, i) for rk, (i, _) in enumerate(members[:4])]
    assert got == sorted(exp)
