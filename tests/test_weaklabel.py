"""Weak-supervision labeling (operators/weaklabel.py)."""

import pytest
from pyspark.sql import functions as F

from gliner_transbronchialbiopsy_spark.operators import weaklabel


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _lfs():
    return {
        "lf_a": F.when(F.col("text").contains("alpha"), F.lit("A")),
        "lf_b": F.when(F.col("text").contains("beta"), F.lit("B")),
        "lf_a2": F.when(F.col("text").contains("gamma"), F.lit("A")),
    }


def test_apply_lfs_long_form_with_abstains(spark):
    docs = _docs(spark, ["alpha only", "beta and gamma", "nothing"])
    votes = weaklabel.apply_label_functions(docs, _lfs())
    got = {(r["doc_id"], r["lf"], r["label"]) for r in votes.collect()}
    assert got == {
        (0, "lf_a", "A"),
        (1, "lf_b", "B"),
        (1, "lf_a2", "A"),
    }


def test_vote_majority_and_tiebreak(spark):
    docs = _docs(spark, ["alpha only", "beta and gamma", "nothing"])
    votes = weaklabel.apply_label_functions(docs, _lfs())
    out = {r["doc_id"]: r for r in weaklabel.vote(votes).collect()}
    # doc 0: single A vote, confidence 1.0
    assert out[0]["label"] == "A" and out[0]["confidence_fp"] == 10**9
    # doc 1: A(1) vs B(1) tie -> label ASC elects 'A'
    assert out[1]["label"] == "A"
    assert out[1]["n_lfs"] == 2 and out[1]["confidence_fp"] == 5 * 10**8
    # doc 2: all abstain -> no row (the unlabeled pool)
    assert 2 not in out


def test_vote_weights_flip_winner(spark):
    docs = _docs(spark, ["beta and gamma"])
    votes = weaklabel.apply_label_functions(docs, _lfs())
    out = weaklabel.vote(votes, weights={"lf_b": 3}).collect()[0]
    assert out["label"] == "B"
    assert out["weight"] == 3  # winner's summed weight
    assert out["confidence_fp"] == (3 * 10**9) // 4


def test_vote_deterministic_across_partitioning(spark):
    texts = [
        ("alpha beta gamma" if i % 3 == 0 else
         "beta only" if i % 3 == 1 else "alpha x")
        for i in range(60)
    ]
    docs = _docs(spark, texts)
    votes = weaklabel.apply_label_functions(docs, _lfs())
    a = sorted(
        tuple(r) for r in weaklabel.vote(votes.repartition(1)).collect()
    )
    b = sorted(
        tuple(r) for r in weaklabel.vote(votes.repartition(16)).collect()
    )
    assert a == b


def test_empty_catalog_raises(spark):
    with pytest.raises(ValueError, match="empty"):
        weaklabel.apply_label_functions(_docs(spark, ["x"]), {})
