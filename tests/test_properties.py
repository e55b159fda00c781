"""Property-based tests (hypothesis) for the invariants that matter:

- JVM/Python parity: the grade-notation rewrite exists twice (Java
  regex chain in spark_fns, Python re chain in textlib) and MUST agree
  char-for-char on any input — backreference syntax ($1 vs \\1), case
  classes, and ordering are exactly where the two engines can drift.
- Token-span projection soundness + completeness against its
  definition (json_convertissor.py:13-36 semantics).
- kfold overflow parity: the Spark mod-first rule equals exact bigint
  arithmetic at ANY id magnitude (the int64-wrap bug class).
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from gliner_transbronchialbiopsy_spark.functions import textlib
from gliner_transbronchialbiopsy_spark.operators import stats

# alphabet dense in grade-notation triggers (A0B1, grade a2, A1-B0 ...)
_GRADE_ALPHABET = "aAbBgGrRdDeE01234xX+ -."


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet=_GRADE_ALPHABET, min_size=0, max_size=40),
        min_size=1,
        max_size=60,
    )
)
def test_grade_rewrite_jvm_python_parity(spark, texts):
    from gliner_transbronchialbiopsy_spark.functions import spark_fns

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [
        r["out"]
        for r in df.select(spark_fns.format_grades_jvm(F.col("t")).alias("out"))
        .collect()
    ]
    want = [textlib.format_grade_notations(t) for t in texts]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.sampled_from(["lid", "a0", "b1", "frag", "x", ","]),
             min_size=1, max_size=30),
    st.integers(min_value=0, max_value=29),
    st.integers(min_value=1, max_value=4),
)
def test_token_span_projection_sound_and_complete(words, start, width):
    text = " ".join(words)
    toks = textlib.tokenize(text)
    if start >= len(toks):
        return
    end = min(start + width, len(toks))
    entity = " ".join(toks[start:end])
    spans = textlib.find_token_spans(text, entity)
    # completeness: the span we cut out of the text is found
    assert (start, end - 1, entity) in spans
    # soundness: every reported span's tokens equal the entity's tokens
    ent_toks = [t.lower() for t in textlib.tokenize(entity)]
    for s, e, _ in spans:
        assert [t.lower() for t in toks[s : e + 1]] == ent_toks


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62),
        min_size=1,
        max_size=50,
        unique=True,
    ),
    st.integers(min_value=2, max_value=11),
)
def test_kfold_overflow_parity_any_magnitude(spark, ids, k):
    df = spark.createDataFrame([(i,) for i in ids], "event_id long")
    got = {
        r["event_id"]: r["fold"]
        for r in stats.kfold_assign(df, "event_id", k=k, seed=42).collect()
    }
    # exact bigint arithmetic (python ints never wrap)
    want = {i: (i * 2654435761 + 42) % k for i in ids}
    assert got == want
