"""SPARQL 1.1 Update (operators/update.py + the sparql.py update
forms): DELETE/INSERT WHERE semantics against a small in-memory graph
— result graph is ``(G \\ D) ∪ I`` with both template sets evaluated
on the PRE-update state, surviving physical rows keep their store
multiplicity, inserted assertions are added exactly once.

The reference's analogue is the corrections editor mutating per-doc
rows in place (/root/reference/src/streamlit/app/app.py corrections
tab); here the same intent is a declarative graph transform."""

import pytest

from gliner_transbronchialbiopsy_spark.operators import sparql, update
from gliner_transbronchialbiopsy_spark.operators.composer import KGQuery, Path
from gliner_transbronchialbiopsy_spark.operators.sparql import (
    SparqlSyntaxError,
    parse_update,
)


def _store(spark):
    # d1's engine assertion appears TWICE: physical lineage multiplicity
    return spark.createDataFrame(
        [
            ("d1", "engine", "spark"),
            ("d1", "engine", "spark"),
            ("d1", "exec_op", "join"),
            ("d1", "exec_op", "sort"),
            ("d2", "engine", "hash"),
            ("d2", "exec_op", "join"),
            ("d3", "data_noun", "table"),
        ],
        "subj string, pred string, obj string",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_delete_insert_where_pre_update_semantics(spark):
    # rename every exec_op of spark-docs to spark_op: the delete and
    # the insert both bind from the ORIGINAL graph
    out = update.update_apply(
        _store(spark),
        where=KGQuery(
            where=(("?d", "engine", "spark"), ("?d", "exec_op", "?o"))
        ),
        delete=[("?d", "exec_op", "?o")],
        insert=[("?d", "spark_op", "?o")],
    )
    assert _rows(out) == sorted(
        [
            ("d1", "engine", "spark"),
            ("d1", "engine", "spark"),  # multiplicity preserved
            ("d1", "spark_op", "join"),
            ("d1", "spark_op", "sort"),
            ("d2", "engine", "hash"),
            ("d2", "exec_op", "join"),
            ("d3", "data_noun", "table"),
        ]
    )


def test_delete_and_reinsert_same_triple_survives(spark):
    out = update.update_apply(
        _store(spark),
        where=KGQuery(where=(("?d", "engine", "?e"),)),
        delete=[("?d", "engine", "?e")],
        insert=[("?d", "engine", "?e")],
    )
    # deleted rows lose multiplicity (re-inserted exactly once)
    assert _rows(out) == sorted(
        [
            ("d1", "engine", "spark"),
            ("d2", "engine", "hash"),
            ("d1", "exec_op", "join"),
            ("d1", "exec_op", "sort"),
            ("d2", "exec_op", "join"),
            ("d3", "data_noun", "table"),
        ]
    )


def test_insert_data_dedups_against_store(spark):
    out = sparql.sparql_update(
        _store(spark),
        'INSERT DATA { d9 engine vector . d1 engine spark }',
    )
    rows = _rows(out)
    assert ("d9", "engine", "vector") in rows
    # the already-present assertion is NOT double-asserted (and the
    # store's own duplicate rides through untouched)
    assert rows.count(("d1", "engine", "spark")) == 2
    assert len(rows) == 8


def test_delete_data_ground(spark):
    out = sparql.sparql_update(
        _store(spark), "DELETE DATA { d1 exec_op join . nope p o }"
    )
    rows = _rows(out)
    assert ("d1", "exec_op", "join") not in rows
    assert len(rows) == 6


def test_delete_where_sugar(spark):
    out = sparql.sparql_update(
        _store(spark), "DELETE WHERE { ?d engine ?e . ?d exec_op join }"
    )
    # d1 and d2 both match; their engine AND exec_op-join triples go
    rows = _rows(out)
    assert rows == sorted(
        [
            ("d1", "exec_op", "sort"),
            ("d3", "data_noun", "table"),
        ]
    )


def test_insert_where_with_filter_text_form(spark):
    out = sparql.sparql_update(
        _store(spark),
        'DELETE { ?d engine ?e } INSERT { ?d engine legacy } '
        'WHERE { ?d engine ?e . FILTER(?e = "hash") }',
    )
    rows = _rows(out)
    assert ("d2", "engine", "legacy") in rows
    assert ("d2", "engine", "hash") not in rows
    assert rows.count(("d1", "engine", "spark")) == 2


def test_optional_null_template_slot_skipped(spark):
    # unmatched OPTIONAL leaves ?n NULL -> that instantiation is
    # skipped (SPARQL incomplete-triple rule), not emitted as NULL
    out = update.update_apply(
        _store(spark),
        where=KGQuery(
            where=(("?d", "engine", "?e"),),
            optional=((("?d", "data_noun", "?n"),),),
        ),
        insert=[("?d", "has_noun", "?n")],
    )
    assert not [r for r in out.collect() if r.pred == "has_noun"]
    # but the rest of the graph is intact
    assert out.count() == 7


def test_path_atom_in_where(spark):
    t = _store(spark).union(
        spark.createDataFrame(
            [("spark", "subclass_of", "system")],
            "subj string, pred string, obj string",
        )
    )
    out = update.update_apply(
        t,
        where=KGQuery(
            where=(
                ("?d", "engine", "?e"),
                Path("?e", ("plus", ("pred", "subclass_of")), "?c"),
            )
        ),
        insert=[("?d", "engine_class", "?c")],
    )
    assert ("d1", "engine_class", "system") in _rows(out)


def test_errors(spark):
    t = _store(spark)
    with pytest.raises(ValueError, match="not bound by WHERE"):
        update.update_apply(
            t, where=KGQuery(where=(("?d", "engine", "?e"),)),
            insert=[("?d", "p", "?zzz")],
        )
    with pytest.raises(ValueError, match="DATA forms take ground"):
        update.update_apply(t, where=None, delete=[("?d", "p", "o")])
    with pytest.raises(ValueError, match="at least one"):
        update.update_apply(t, where=KGQuery(where=(("?d", "p", "?o"),)))
    with pytest.raises(ValueError, match="raw solutions"):
        update.update_apply(
            t, where=KGQuery(where=(("?d", "engine", "?e"),), limit=1),
            delete=[("?d", "engine", "?e")],
        )
    with pytest.raises(ValueError, match="plain .s, p, o. triple"):
        update.update_apply(
            t, where=KGQuery(where=(("?d", "engine", "?e"),)),
            delete=[Path("?d", ("pred", "engine"), "?e")],
        )


def test_parser_errors():
    with pytest.raises(SparqlSyntaxError, match="trailing input"):
        parse_update("INSERT DATA { a b c } LIMIT 3")
    with pytest.raises(SparqlSyntaxError, match="trailing input"):
        parse_update("DELETE { ?d p ?o } WHERE { ?d p ?o } ORDER BY ?d")
    with pytest.raises(SparqlSyntaxError, match="plain triple-pattern"):
        parse_update('DELETE WHERE { ?d p ?o . FILTER(?o = "x") }')
    with pytest.raises(SparqlSyntaxError, match="expected .."):
        parse_update("INSERT WHERE { ?d p ?o }")
    with pytest.raises(SparqlSyntaxError, match="INSERT or DELETE"):
        parse_update("UPSERT { a b c }")
    with pytest.raises(SparqlSyntaxError, match="sparql_update"):
        sparql.parse("DELETE WHERE { ?d p ?o }")
    # DATA is not a reserved word: usable as a term
    pu = parse_update("INSERT DATA { data b data }")
    assert pu.insert == (("data", "b", "data"),)


def test_parse_shapes():
    pu = parse_update(
        "DELETE { ?d p ?o } INSERT { ?d q ?o } WHERE { ?d p ?o }"
    )
    assert pu.delete == (("?d", "p", "?o"),)
    assert pu.insert == (("?d", "q", "?o"),)
    assert pu.where == KGQuery(where=(("?d", "p", "?o"),))
    pu2 = parse_update("DELETE DATA { a b c . d e f }")
    assert pu2.delete == (("a", "b", "c"), ("d", "e", "f"))
    assert pu2.where is None
