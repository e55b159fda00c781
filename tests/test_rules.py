"""Datalog-lite rule materialization (operators/rules.py): semi-naive
fixed point, recursive rules, CONSTRUCT."""

import pytest
from pyspark.sql import functions as F

from gliner_transbronchialbiopsy_spark.operators import rules


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _tset(df, inferred=None):
    if inferred is not None:
        df = df.filter(F.col("inferred") == inferred)
    return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}


def test_transitive_closure_chain(spark):
    """Recursive rule on a 5-node chain: the closure needs multiple
    rounds (semi-naive path-extension), and derives exactly the
    strictly-above pairs."""
    t = _triples(spark, [(f"n{i}", "next", f"n{i+1}") for i in range(5)])
    r = rules.rule(
        [("?a", "next", "?b"), ("?b", "next", "?c")],
        [("?a", "next", "?c")],
    )
    out = rules.materialize(t, [r])
    want = {
        (f"n{i}", "next", f"n{j}") for i in range(6) for j in range(i + 1, 6)
    }
    assert _tset(out) == want
    assert _tset(out, inferred=False) == {
        (f"n{i}", "next", f"n{i+1}") for i in range(5)
    }
    assert len(_tset(out, inferred=True)) == len(want) - 5


def test_derived_predicate_feeds_next_round(spark):
    """R1 derives 'runs' from base facts; R2 consumes 'runs' — its
    firing requires a second round, proving derived facts re-enter
    the evaluation."""
    t = _triples(
        spark,
        [("d1", "engine", "spark"), ("d1", "exec_op", "join"),
         ("d1", "data_noun", "table")],
    )
    r1 = rules.rule(
        [("?d", "engine", "?e"), ("?d", "exec_op", "?op")],
        [("?e", "runs", "?op")],
    )
    r2 = rules.rule(
        [("?e", "runs", "?op"), ("?d", "exec_op", "?op"),
         ("?d", "data_noun", "?n")],
        [("?op", "applied_to", "?n")],
    )
    out = rules.materialize(t, [r1, r2])
    inf = _tset(out, inferred=True)
    assert ("spark", "runs", "join") in inf
    assert ("join", "applied_to", "table") in inf


def test_multi_head_and_constants(spark):
    t = _triples(spark, [("d1", "engine", "spark")])
    r = rules.rule(
        [("?d", "engine", "?e")],
        [("?e", "rdf:type", "Engine"), ("?d", "mentions", "?e")],
    )
    out = rules.materialize(t, [r])
    assert _tset(out, inferred=True) == {
        ("spark", "rdf:type", "Engine"),
        ("d1", "mentions", "spark"),
    }


def test_no_duplicate_rederivation(spark):
    """A fact derivable two ways appears once, and already-asserted
    facts are never re-emitted as inferred."""
    t = _triples(
        spark,
        [("d1", "engine", "spark"), ("d2", "engine", "spark"),
         ("spark", "rdf:type", "Engine")],  # asserted copy of a derivable
    )
    r = rules.rule([("?d", "engine", "?e")], [("?e", "rdf:type", "Engine")])
    out = rules.materialize(t, [r])
    assert out.count() == 3  # 3 asserted, 0 inferred (already known)
    assert _tset(out, inferred=True) == set()


def test_unsafe_and_malformed_rules_raise(spark):
    with pytest.raises(ValueError, match="unsafe"):
        rules.rule([("?a", "p", "?b")], [("?a", "q", "?c")])
    with pytest.raises(ValueError, match="non-empty"):
        rules.rule([], [("?a", "q", "?b")])
    t = _triples(spark, [("a", "p", "b")])
    with pytest.raises(ValueError, match="disconnected"):
        rules.materialize(
            t, [rules.rule([("?a", "p", "?b"), ("?c", "q", "?d")],
                           [("?a", "r", "?c")])]
        )


def test_max_rounds_guard(spark):
    t = _triples(spark, [(f"n{i}", "next", f"n{i+1}") for i in range(12)])
    r = rules.rule(
        [("?a", "next", "?b"), ("?b", "next", "?c")], [("?a", "next", "?c")]
    )
    with pytest.raises(RuntimeError, match="converge"):
        rules.materialize(t, [r], max_rounds=2)


def test_construct_returns_derived_graph_only(spark):
    t = _triples(
        spark,
        [("d1", "engine", "spark"), ("d1", "exec_op", "join")],
    )
    out = rules.construct(
        t,
        [("?d", "engine", "?e"), ("?d", "exec_op", "?op")],
        [("?e", "runs", "?op")],
    )
    assert {tuple(r) for r in out.collect()} == {("spark", "runs", "join")}
    assert out.columns == ["subj", "pred", "obj"]


def test_semi_naive_matches_naive_round_count_invariance(spark):
    """Same fixpoint regardless of partitioning (exact set equality)."""
    rows = [(f"x{i}", "next", f"x{(i + 1) % 7}") for i in range(7)]  # cycle
    t = _triples(spark, rows)
    r = rules.rule(
        [("?a", "next", "?b"), ("?b", "next", "?c")], [("?a", "next", "?c")]
    )
    a = _tset(rules.materialize(t.repartition(1), [r]))
    b = _tset(rules.materialize(t.repartition(16), [r]))
    # cycle closure: every ordered pair (including self-loops)
    assert a == b == {
        (f"x{i}", "next", f"x{j}") for i in range(7) for j in range(7)
    }


def test_ground_body_rule_survives_delta_rounds(spark):
    """Regression: a fully-ground body must not crash semi-naive
    rounds — round 2 (triggered by another rule's derivation) used to
    hit the no-variable join-order path."""
    t = _triples(
        spark, [("d1", "engine", "spark"), ("d1", "exec_op", "join")]
    )
    ground = rules.rule(
        [("d1", "engine", "spark")], [("spark", "rdf:type", "Engine")]
    )
    chain = rules.rule(
        [("?d", "engine", "?e"), ("?d", "exec_op", "?op")],
        [("?e", "runs", "?op")],
    )
    out = rules.materialize(t, [ground, chain])
    inf = _tset(out, inferred=True)
    assert ("spark", "rdf:type", "Engine") in inf
    assert ("spark", "runs", "join") in inf


def test_rebase_every_identical_output_on_30_round_chain(spark):
    """VERDICT r4 #4: a 30-round recursive fixpoint (linear chain
    closure — the one-hop-per-round ruleset) with rebase_every=10 must
    produce exactly the set the default lazy-union accumulation does.
    The knob only collapses plan depth (derived_acc re-checkpointed
    every N rounds); semantics are untouched."""
    n = 30
    t = _triples(spark, [(f"c{i:02d}", "next", f"c{i+1:02d}") for i in range(n)])
    seed = rules.rule([("?x", "next", "?y")], [("?x", "reach", "?y")])
    step = rules.rule(
        [("?x", "reach", "?y"), ("?y", "next", "?z")],
        [("?x", "reach", "?z")],
    )
    # one-hop-per-round growth: reach_k appears in round k+1 -> ~n rounds
    plain = rules.materialize(t, [seed, step], max_rounds=n + 5)
    rebased = rules.materialize(
        t, [seed, step], max_rounds=n + 5, rebase_every=10
    )
    want_reach = {
        (f"c{i:02d}", "reach", f"c{j:02d}")
        for i in range(n + 1)
        for j in range(i + 1, n + 1)
    }
    assert _tset(plain, inferred=True) == want_reach
    assert _tset(rebased) == _tset(plain)
    assert _tset(rebased, inferred=True) == _tset(plain, inferred=True)


def test_rebase_every_validates(spark):
    t = _triples(spark, [("a", "next", "b")])
    r = rules.rule([("?x", "next", "?y")], [("?x", "reach", "?y")])
    with pytest.raises(ValueError, match="rebase_every"):
        rules.materialize(t, [r], rebase_every=0)
