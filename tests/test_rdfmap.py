"""Relational->RDF direct mapping (operators/rdfmap.py),
characteristic sets (kgvalidate), sliding chunking (packing)."""

import pytest
from pyspark.sql import functions as F

from gliner_transbronchialbiopsy_spark.operators import (
    kgvalidate,
    packing,
    rdfmap,
)


def test_map_table_templates_class_and_null_skip(spark):
    df = spark.createDataFrame(
        [(1, "alice", 10), (2, None, 20)],
        "id long, name string, ref long",
    )
    m = rdfmap.TableMapping(
        subject_template="e/{id}",
        predicates={"name": "name", "ref": rdfmap.ObjRef("r/{ref}")},
        subject_class="Entity",
    )
    got = {tuple(r) for r in rdfmap.map_table(df, m).collect()}
    assert got == {
        ("e/1", "rdf:type", "Entity"),
        ("e/1", "name", "alice"),
        ("e/1", "ref", "r/10"),
        ("e/2", "rdf:type", "Entity"),
        # NULL name -> property absent, not a null triple
        ("e/2", "ref", "r/20"),
    }


def test_render_template_mixed_literal_and_cols(spark):
    df = spark.createDataFrame([(7, "x")], "a long, b string")
    col = rdfmap.render_template("pre/{a}/mid/{b}/post")
    assert df.select(col.alias("s")).collect()[0]["s"] == "pre/7/mid/x/post"
    with pytest.raises(ValueError, match="empty"):
        rdfmap.render_template("")


def test_map_tables_union_and_validation(spark):
    df = spark.createDataFrame([(1,)], "id long")
    m = rdfmap.TableMapping("e/{id}", {}, subject_class="E")
    out = rdfmap.map_tables([(df, m), (df, m)])
    assert out.count() == 2
    with pytest.raises(ValueError, match="no triples"):
        rdfmap.TableMapping("e/{id}", {})
    with pytest.raises(ValueError, match="no mappings"):
        rdfmap.map_tables([])


# --- characteristic sets ----------------------------------------------------
def test_characteristic_sets_groups_by_pred_set(spark):
    t = spark.createDataFrame(
        [
            ("s1", "a", "x"), ("s1", "b", "y"),
            ("s2", "b", "y"), ("s2", "a", "z"), ("s2", "a", "w"),
            ("s3", "a", "x"),
        ],
        "subj string, pred string, obj string",
    )
    got = {
        r["cs"]: (r["n_preds"], r["n_subjects"], r["n_triples"])
        for r in kgvalidate.characteristic_sets(t).collect()
    }
    # s1 and s2 share the {a,b} set (order-insensitive, sorted key);
    # s2 contributes 3 assertions (a twice with distinct objects)
    assert got == {"a,b": (2, 2, 5), "a": (1, 1, 1)}


# --- sliding chunks ---------------------------------------------------------
def test_chunk_sliding_windows_and_tail(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    rows = packing.chunk_sliding(
        docs, chunk_tokens=4, overlap=1
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start_tok"], r["n_tok"], r["chunk_text"])
        )
    # stride 3: starts 0,3,6,9; last window is the 1-token tail
    assert sorted(by_doc[1]) == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 3, 4, "t3 t4 t5 t6"),
        (2, 6, 4, "t6 t7 t8 t9"),
        (3, 9, 1, "t9"),
    ]
    assert by_doc[2] == [(0, 0, 2, "a b")]
    assert 3 not in by_doc  # empty doc emits nothing
    # every token covered at least once
    covered = set()
    for _, start, n, _ in by_doc[1]:
        covered |= set(range(start, start + n))
    assert covered == set(range(10))


def test_chunk_sliding_validates_args(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        packing.chunk_sliding(docs, chunk_tokens=0)
    with pytest.raises(ValueError):
        packing.chunk_sliding(docs, chunk_tokens=4, overlap=4)


def test_map_table_null_subject_column_emits_nothing(spark):
    df = spark.createDataFrame(
        [(None, "ghost")], "id long, name string"
    )
    m = rdfmap.TableMapping(
        "e/{id}", {"name": "name"}, subject_class="Entity"
    )
    assert rdfmap.map_table(df, m).count() == 0
