"""OWL-lite property entailment (operators/owl.py): compile-time
checks on the ontology -> rule translation, execution parity against
a pure-python fixpoint over a seeded random graph (the
test_random_parity.py discipline), and the axiom-interaction cases
the joint fixpoint must get right without special casing."""

import random

import pytest

from gliner_transbronchialbiopsy_spark.operators import owl


def _triples(spark, rows):
    return spark.createDataFrame(
        sorted(set(rows)), "subj string, pred string, obj string"
    )


def _py_entail(rows, onto):
    """Reference fixpoint: naive to-saturation evaluation of the four
    axiom kinds over python sets. Quadratic and driver-side — the
    oracle, not the implementation."""
    sub = {}
    inv = set()
    sym = set()
    trans = set()
    for s, p, o in onto:
        if p == "subPropertyOf":
            sub.setdefault(s, set()).add(o)
        elif p == "inverseOf":
            inv.add((s, o))
        elif p == "a" and o == "SymmetricProperty":
            sym.add(s)
        elif p == "a" and o == "TransitiveProperty":
            trans.add(s)
    known = set(rows)
    while True:
        new = set()
        for s, p, o in known:
            for q in sub.get(p, ()):
                new.add((s, q, o))
            for a, b in inv:
                if p == a:
                    new.add((o, b, s))
                if p == b:
                    new.add((o, a, s))
            if p in sym:
                new.add((o, p, s))
        for p in trans:
            edges = [(s, o) for s, pp, o in known if pp == p]
            by_src = {}
            for s, o in edges:
                by_src.setdefault(s, set()).add(o)
            for s, o in edges:
                for o2 in by_src.get(o, ()):
                    new.add((s, p, o2))
        if new <= known:
            return known - set(rows)
        known |= new


@pytest.fixture(scope="module")
def rand_graph():
    rng = random.Random(421)
    nodes = [f"n{i}" for i in range(14)]
    rows = set()
    for _ in range(40):
        rows.add((rng.choice(nodes), "next", rng.choice(nodes)))
    for _ in range(12):
        rows.add((rng.choice(nodes), "peer", rng.choice(nodes)))
    return sorted(rows)


ONTO = [
    ("next", "subPropertyOf", "reach"),
    ("reach", "a", "TransitiveProperty"),
    ("next", "inverseOf", "prev"),
    ("reach", "subPropertyOf", "related"),
    ("related", "a", "SymmetricProperty"),
    ("peer", "a", "SymmetricProperty"),
    ("peer", "a", "TransitiveProperty"),
]


def test_random_parity(spark, rand_graph):
    got = owl.owl_lite_entail(
        _triples(spark, rand_graph), _triples(spark, ONTO)
    )
    inferred = {
        tuple(r)
        for r in got.filter("inferred").select("subj", "pred", "obj").collect()
    }
    assert inferred == _py_entail(rand_graph, ONTO)
    base = {
        tuple(r)
        for r in got.filter("NOT inferred")
        .select("subj", "pred", "obj")
        .collect()
    }
    assert base == set(rand_graph)


def test_subproperty_chain_closes_at_compile_time():
    rules = owl.compile_ontology(
        [
            ("a", "subPropertyOf", "b"),
            ("b", "subPropertyOf", "c"),
            ("c", "subPropertyOf", "d"),
        ]
    )
    names = {r.name for r in rules}
    # a reaches b, c AND d directly — one rule per ancestor pair,
    # no runtime re-derivation of the hierarchy
    assert {"spo:a<=b", "spo:a<=c", "spo:a<=d",
            "spo:b<=c", "spo:b<=d", "spo:c<=d"} == names


def test_subproperty_cycle_collapses_without_self_rules():
    rules = owl.compile_ontology(
        [("p", "subPropertyOf", "q"), ("q", "subPropertyOf", "p")]
    )
    assert {r.name for r in rules} == {"spo:p<=q", "spo:q<=p"}


def test_symmetric_transitive_interplay(spark):
    # undirected connectivity: symmetric + transitive on one pred must
    # close each component into a complete digraph (incl. self loops
    # once a node sits on any 2-cycle) — derived reversals re-enter
    # the transitivity rule, which only the joint fixpoint gives.
    rows = [("a", "p", "b"), ("b", "p", "c"), ("x", "p", "y")]
    onto = [("p", "a", "SymmetricProperty"), ("p", "a", "TransitiveProperty")]
    got = {
        tuple(r)
        for r in owl.owl_lite_entail(_triples(spark, rows), _triples(spark, onto))
        .select("subj", "pred", "obj")
        .collect()
    }
    comp1 = {"a", "b", "c"}
    comp2 = {"x", "y"}
    want = {(s, "p", o) for s in comp1 for o in comp1} | {
        (s, "p", o) for s in comp2 for o in comp2
    }
    assert got == want
    assert got == {(s, "p", o) for s, _, o in rows} | _py_entail(rows, onto)


def test_unrecognized_axiom_raises(spark):
    t = _triples(spark, [("a", "p", "b")])
    bad = _triples(spark, [("p", "subClasOf", "q")])
    with pytest.raises(ValueError, match="unrecognized ontology axiom"):
        owl.owl_lite_entail(t, bad)


def test_empty_ontology_raises(spark):
    t = _triples(spark, [("a", "p", "b")])
    empty = t.filter("subj = ''")
    with pytest.raises(ValueError, match="no rules"):
        owl.owl_lite_entail(t, empty)


def test_ontology_size_cap(spark):
    t = _triples(spark, [("a", "p", "b")])
    onto = _triples(
        spark, [(f"p{i}", "subPropertyOf", f"q{i}") for i in range(5)]
    )
    with pytest.raises(ValueError, match="max_ontology_rows"):
        owl.owl_lite_entail(t, onto, max_ontology_rows=3)
