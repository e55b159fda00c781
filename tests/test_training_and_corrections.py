"""Entry-point-3 (annotation projection) and corrections-log parity."""

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gliner_transbronchialbiopsy_spark import config
from gliner_transbronchialbiopsy_spark.functions import textlib
from gliner_transbronchialbiopsy_spark.operators.corrections import (
    CORRECTION_SCHEMA,
    CorrectionsLog,
)
from gliner_transbronchialbiopsy_spark.plans import annotation_projection as ap
from gliner_transbronchialbiopsy_spark.sources import corpus


# --- annotation projection (json_convertissor.py semantics) -----------------
@pytest.fixture(scope="module")
def gold_df(spark):
    _, gold = corpus.generate_corpus(n_docs=120, seed=42)
    return spark.createDataFrame(gold), gold


def test_projection_matches_pure_python(spark, gold_df):
    sdf, gold_pd = gold_df
    records = {r["path"]: r for r in ap.project_annotations(sdf).collect()}

    checked = 0
    for _, row in gold_pd.iterrows():
        text = row["conclusion_text"]
        if not isinstance(text, str):
            assert row["path"] not in records  # null-text rows skipped
            continue
        rec = records[row["path"]]
        assert rec["tokenized_text"] == textlib.tokenize(text)
        # reference algorithm applied independently
        expected = []
        for slug in config.LABEL_SLUGS.values():
            v = row.get(slug)
            if isinstance(v, str) and v:
                for val in [x.strip() for x in v.split(";")]:
                    for s, e, _ in textlib.find_token_spans(text, val):
                        expected.append((s, e, slug))
        got = [(n["start"], n["end"], n["label"]) for n in rec["ner"]]
        assert sorted(got) == sorted(expected)
        checked += 1
    assert checked > 80


def test_split_deterministic_and_disjoint(spark, gold_df):
    sdf, _ = gold_df
    records = ap.project_annotations(sdf)
    train, test = ap.train_test_split(records, test_fraction=0.2, seed=42)
    train2, test2 = ap.train_test_split(records, test_fraction=0.2, seed=42)
    t1 = {r["path"] for r in test.collect()}
    t2 = {r["path"] for r in test2.collect()}
    tr = {r["path"] for r in train.collect()}
    assert t1 == t2           # deterministic
    assert not (t1 & tr)      # disjoint
    assert t1 and tr


def test_training_json_roundtrip(spark, gold_df, tmpdir_path):
    sdf, _ = gold_df
    records = ap.project_annotations(sdf)
    ap.write_training_json(records, f"{tmpdir_path}/train_json")
    back = spark.read.json(f"{tmpdir_path}/train_json")
    assert back.count() == records.count()
    assert set(back.columns) >= {"tokenized_text", "ner"}


# --- corrections log ---------------------------------------------------------
def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture()
def log(spark, tmpdir_path):
    log = CorrectionsLog(spark, f"{tmpdir_path}/corrections")
    events = spark.createDataFrame(
        [
            ("doc1.txt", "Site", "LID", "LM", _ts("2024-01-01T10:00:00"), "u1", None, 1),
            ("doc1.txt", "Site", "LM", "LSD", _ts("2024-01-02T10:00:00"), "u1", "fix", 2),
            ("doc1.txt", "Grade A", "A0", "A1", _ts("2024-01-01T12:00:00"), "u2", None, 3),
            ("doc2.txt", "Site", "LM", "LIG", _ts("2024-01-03T09:00:00"), "u1", None, 4),
        ],
        CORRECTION_SCHEMA,
    )
    log.append(events)
    return log


def test_latest_state_last_writer_wins(spark, log):
    base = spark.createDataFrame(
        [("doc1.txt", "LID", "A0"), ("doc2.txt", "LM", None), ("doc3.txt", "LSG", "A2")],
        "document string, Site string, `Grade A` string",
    )
    out = {
        r["document"]: (r["Site"], r["Grade A"])
        for r in log.latest_state(base, label_cols=("Site", "Grade A")).collect()
    }
    assert out["doc1.txt"] == ("LSD", "A1")   # latest of two Site corrections
    assert out["doc2.txt"] == ("LIG", None)
    assert out["doc3.txt"] == ("LSG", "A2")   # untouched rows pass through


def test_history_ordered(log):
    hist = log.history("doc1.txt").collect()
    assert [h["correction_id"] for h in hist] == [1, 3, 2]  # by timestamp


def test_analytics_and_export(log, tmpdir_path, spark):
    freq = {str(r["day"]): r["n"] for r in log.correction_frequency_by_day().collect()}
    assert freq["2024-01-01"] == 2 and freq["2024-01-02"] == 1
    per = log.corrections_per_entity_type().collect()
    assert per[0]["entity_type"] == "Site" and per[0]["n"] == 3
    log.export_session_json(f"{tmpdir_path}/session_json")
    back = spark.read.json(f"{tmpdir_path}/session_json")
    assert back.count() == 4


def test_append_is_incremental(spark, log):
    more = spark.createDataFrame(
        [("doc1.txt", "Site", "LSD", "LM", _ts("2024-01-05T10:00:00"), "u3", None, 5)],
        CORRECTION_SCHEMA,
    )
    log.append(more)
    latest = {
        r["entity_type"]: r["corrected_value"]
        for r in log.latest_corrections().filter(F.col("document") == "doc1.txt").collect()
    }
    assert latest["Site"] == "LM"  # new event wins
