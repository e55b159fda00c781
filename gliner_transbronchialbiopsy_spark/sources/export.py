"""Export-edge sinks (S7/S8/S9): the reference's wide-row interchange
format, produced ONLY at the boundary.

Inside the engine, multi-values are arrays and scores are a typed
map<label, array<double>>; the reference's ';'-joined cells
(entity_processor.py:76) and stringified scores dict
(entity_processor.py:80-83 — which it later eval()s back,
charts.py:92, a bug class we keep out of the engine) exist here only
so a reference user gets byte-compatible CSV/JSON exports.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import config
from ..operators import pivot


def _stringified_scores(scores_col: Column) -> Column:
    """map<label, array<double>> -> the reference's str(dict) form:
    {'Grade A': [0.9, 0.8], ...} (entity_processor.py:81-83)."""
    entry = lambda e: F.concat(  # noqa: E731
        F.lit("'"),
        e["key"],
        F.lit("': ["),
        F.array_join(
            F.transform(e["value"], lambda v: v.cast("string")), ", "
        ),
        F.lit("]"),
    )
    return F.when(
        scores_col.isNotNull() & (F.size(F.map_keys(scores_col)) > 0),
        F.concat(
            F.lit("{"),
            F.array_join(F.transform(F.map_entries(scores_col), entry), ", "),
            F.lit("}"),
        ),
    )


def reference_wide_rows(
    mentions: DataFrame,
    sectionized: DataFrame,
    structuration_ts: str | None = None,
) -> DataFrame:
    """Mentions -> the reference's structured row, column-for-column
    (entity_processor.process_entities, :56-83): Nom_Document,
    Date_Structuration ('%Y-%m-%d %H:%M:%S'), Conclusion, one column
    per label (';'-joined, NULL when absent), Scores (stringified).

    structuration_ts pins the timestamp for reproducible exports; None
    uses current_timestamp() like the reference (:59)."""
    wide = pivot.pivot_wide(mentions, with_scores=True)
    concl = sectionized.select("repo", "path", "commit", "conclusion")
    ts = (
        F.lit(structuration_ts)
        if structuration_ts
        else F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss")
    )
    return wide.join(concl, ["repo", "path", "commit"], "left").select(
        F.col("path").alias("Nom_Document"),
        ts.alias("Date_Structuration"),
        F.col("conclusion").alias("Conclusion"),
        *[F.col(f"`{lb}`").alias(lb) for lb in config.LABELS],
        _stringified_scores(F.col("scores")).alias("Scores"),
    )


def write_reference_csv(wide: DataFrame, out_dir: str) -> None:
    """S7: the download-CSV edge (components.py:503-506)."""
    wide.coalesce(1).write.mode("overwrite").option("header", True).csv(out_dir)


def write_reference_json(wide: DataFrame, out_dir: str) -> None:
    """S9: JSON edge (ensure_ascii=False equivalent: Spark writes UTF-8
    natively)."""
    wide.write.mode("overwrite").json(out_dir)


try:  # S8 gate — openpyxl absent in this environment
    import openpyxl  # type: ignore # noqa: F401

    _HAVE_OPENPYXL = True
except ImportError:
    _HAVE_OPENPYXL = False

# Excel's hard per-sheet row cap: the reason this sink is a driver-side
# EDGE (toPandas) and never a distributed writer.
EXCEL_MAX_ROWS = 1_048_575  # 1,048,576 minus the header row


def write_reference_excel(
    wide: DataFrame, out_path: str, sheet_name: str = "Structured"
) -> None:
    """S8: the styled Excel download edge (reference
    dashboard_v1.py:482-521, ui/components.py:509-515 — bold/filled
    header, frozen top row). Excel is a single-machine interchange
    format with a 1,048,576-row sheet cap, so this is deliberately a
    `toPandas()` export tail: the cap is enforced explicitly rather
    than silently truncating. Gated on openpyxl (same discipline as
    the pdfplumber gate)."""
    if not _HAVE_OPENPYXL:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "Excel export requires openpyxl (not installed); use "
            "write_reference_csv / write_reference_json, or install "
            "openpyxl on the driver"
        )
    import pandas as pd
    from openpyxl.styles import Font, PatternFill

    pdf = wide.limit(EXCEL_MAX_ROWS + 1).toPandas()
    if len(pdf) > EXCEL_MAX_ROWS:
        raise ValueError(
            f"Excel sheet cap is {EXCEL_MAX_ROWS} data rows; filter or "
            "split the export (this sink is an interchange edge, not a "
            "data sink)"
        )
    with pd.ExcelWriter(out_path, engine="openpyxl") as xw:
        pdf.to_excel(xw, index=False, sheet_name=sheet_name)
        ws = xw.sheets[sheet_name]
        for cell in ws[1]:
            cell.font = Font(bold=True)
            cell.fill = PatternFill("solid", fgColor="DDE5F0")
        ws.freeze_panes = "A2"


# ---------------------------------------------------------------------------
# RDF interchange: deterministic N-Triples serialization
# ---------------------------------------------------------------------------

#: N-Triples string-literal escapes (W3C N-Triples §2.3), applied in
#: order — backslash FIRST so later escapes don't double-escape.
_NT_ESCAPES = (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t"))


def nt_escape(col: Column) -> Column:
    """Escape a string column for use inside an N-Triples literal."""
    out = col
    for raw, esc in _NT_ESCAPES:
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out


def to_ntriples(
    triples: DataFrame,
    base_iri: str = "urn:kg:",
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """(subj, pred, obj) -> one-column (ntriple) RDF serialization:
    ``<base_iri+subj> <base_iri+pred> "escaped obj" .``

    Subjects/predicates are minted under ``base_iri`` (URN-style, so
    the repo/path/commit ids — which contain only IRI-safe chars —
    embed verbatim); objects serialize as plain literals with the
    full escape chain. A pure JVM projection (whole-stage codegen,
    no shuffle): write the result with ``.write.text()`` for the
    interchange file. Reference analogue: the CSV/JSON result sinks
    (src/streamlit/utils/export_handler.py) generalized to the RDF
    interchange format a KG consumer expects.
    """
    line = F.concat(
        F.lit("<" + base_iri),
        F.col(subj),
        F.lit("> <" + base_iri),
        F.col(pred),
        F.lit('> "'),
        nt_escape(F.col(obj)),
        F.lit('" .'),
    )
    return triples.select(line.alias("ntriple"))
