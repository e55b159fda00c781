"""Cost-based join ordering (operators/kgstats.py).

The estimator and the greedy orderer are pure functions — unit-tested
without Spark; collect_stats and the compose(stats=...) integration
run on a seeded random KG and must produce results bit-identical to
the stats-free plan (inner joins commute; only the ORDER may change).
"""

import random

import pytest
from pyspark.sql import functions as F

from gliner_transbronchialbiopsy_spark.operators import composer, kgstats
from gliner_transbronchialbiopsy_spark.operators.kgstats import (
    PredStat,
    TripleStats,
    estimate_pattern,
    estimate_path,
    order_group,
)


def _stats():
    # a skewed toy snapshot: 'mention' dominates, 'grade' is rare
    return TripleStats(
        total=110_000,
        ndv_subj=10_000,
        ndv_obj=6_000,
        pred={
            "mention": PredStat(100_000, 10_000, 5_000),
            "link": PredStat(9_000, 3_000, 3_000),
            "grade": PredStat(1_000, 1_000, 5),
        },
    )


def test_estimate_pattern_math():
    st = _stats()
    est, ndvs = estimate_pattern(("?d", "mention", "?m"), st)
    assert est == 100_000 and ndvs == {"d": 10_000, "m": 5_000}
    # ground object divides by the object NDV of that predicate
    est, ndvs = estimate_pattern(("?d", "grade", "A2"), st)
    assert est == pytest.approx(1_000 / 5)
    # var NDV is capped by the row estimate
    assert ndvs == {"d": pytest.approx(200)}
    # unknown predicate -> empty scan, ordered first
    est, _ = estimate_pattern(("?d", "nope", "?x"), st)
    assert est == 0.0
    # variable predicate falls back to global stats
    est, ndvs = estimate_pattern(("?d", "?p", "?o"), st)
    assert est == 110_000 and ndvs["p"] == 3


def test_estimate_path_ground_endpoint_is_image_sized():
    st = _stats()
    var_var, _ = estimate_path("?a", ("pred", "link"), "?b", st)
    seeded, _ = estimate_path("spark", ("pred", "link"), "?b", st)
    assert seeded == pytest.approx(var_var / st.ndv_subj)
    closure, _ = estimate_path("?a", ("plus", ("pred", "link")), "?b", st)
    assert closure > var_var  # closures estimate bigger than one hop


def test_order_group_seeds_with_rarest_and_chains():
    st = _stats()
    pats = [("?d", "mention", "?m"), ("?m", "link", "?e"),
            ("?d", "grade", "A2")]
    metas = [estimate_pattern(p, st) for p in pats]
    order = order_group(metas)
    # the rare ground 'grade' pattern seeds despite being listed last;
    # 'mention' joins next (shares ?d), the disconnected-from-grade
    # 'link' pattern waits until ?m is bound
    assert order == [2, 0, 1]


def test_order_group_disconnected_contract():
    metas = [(10.0, {"a": 5.0}), (20.0, {"b": 5.0})]
    with pytest.raises(ValueError, match="disconnected query group"):
        order_group(metas)
    assert order_group(metas, allow_cartesian=True) == [0, 1]


def _random_triples(spark, seed=7, n_docs=400):
    rng = random.Random(seed)
    rows = []
    engines = [f"eng{i}" for i in range(6)]
    ops = [f"op{i}" for i in range(30)]
    for d in range(n_docs):
        doc = f"doc{d}"
        for _ in range(rng.randint(1, 6)):
            rows.append((doc, "mention", rng.choice(ops)))
        rows.append((doc, "engine", rng.choice(engines)))
        if rng.random() < 0.15:
            rows.append((doc, "grade", f"A{rng.randint(0, 4)}"))
        if rng.random() < 0.4:
            rows.append((doc, "data_noun", "table"))
    for e in engines:
        rows.append((e, "a", "kg_engine"))
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_collect_stats_exact_at_small_cardinality(spark):
    t = _random_triples(spark, seed=3, n_docs=50)
    st = kgstats.collect_stats(t)
    exact = {
        r["pred"]: (r["n"], r["ns"], r["no"])
        for r in t.groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("subj").alias("ns"),
            F.countDistinct("obj").alias("no"),
        )
        .collect()
    }
    assert st.total == t.count()
    assert set(st.pred) == set(exact)
    for p, (n, ns, no) in exact.items():
        assert st.pred[p].count == n
        # HLL sparse mode is exact at these cardinalities
        assert st.pred[p].ndv_subj == ns
        assert st.pred[p].ndv_obj == no


def test_compose_with_stats_is_bit_identical(spark):
    t = _random_triples(spark, seed=11)
    st = kgstats.collect_stats(t)
    q = composer.KGQuery(
        where=(
            ("?doc", "mention", "?m"),  # huge pattern listed FIRST
            ("?doc", "engine", "?eng"),
            ("?doc", "grade", "?g"),  # rare pattern listed last
            composer.Path("?eng", ("pred", "a"), "?cls"),
        ),
        optional=((("?doc", "data_noun", "?noun"),),),
        minus=((("?doc", "mention", "op0"),),),
        filters=("m <> 'op1'",),
        select=("doc", "m", "eng", "g", "cls", "noun"),
        distinct=True,
    )
    base = sorted(map(tuple, composer.compose(t, q).collect()))
    opt = sorted(map(tuple, composer.compose(t, q, stats=st).collect()))
    assert base == opt and len(base) > 0


def test_compose_stats_disconnected_raises(spark):
    t = _random_triples(spark, seed=5, n_docs=30)
    st = kgstats.collect_stats(t)
    q = composer.KGQuery(
        where=(("?a", "mention", "?b"), ("?c", "engine", "?d"))
    )
    with pytest.raises(ValueError, match="disconnected query group"):
        composer.compose(t, q, stats=st).collect()
    n = composer.compose(t, q, stats=st, allow_cartesian=True).count()
    assert n > 0
