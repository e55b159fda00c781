"""Raw-file ingest: bytes -> typed documents (S2/S3/S4/S5).

Reference lifecycle: upload bytes -> get_file_type (extension dispatch,
file_handler.py:92-107) -> validate_file (size cap / extension /
libmagic sniff, :45-90) -> extract_text (pdfplumber for pdf,
encoding-fallback decode for txt, text_processor.py:29-94).

Spark restatement: one mapInPandas over a BinaryType column. PDF
extraction needs pdfplumber (not in this environment) and is gated
behind an import-try — txt decoding (the 7-encoding fallback chain) is
fully implemented. Validation is Catalyst filters with a quarantine
split so rejects are observable, not dropped (SURVEY.md S4).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import config
from ..functions import textlib

RAW_SCHEMA = "repo string, path string, commit string, payload binary"

try:  # S2 gate — pdfplumber absent in this environment
    import pdfplumber  # type: ignore # noqa: F401

    _HAVE_PDFPLUMBER = True
except ImportError:
    _HAVE_PDFPLUMBER = False


def file_type_of(path_col):
    """S5 extension dispatch (file_handler.py:92-107): pdf|txt|NULL."""
    lower = F.lower(path_col)
    return (
        F.when(lower.endswith(".pdf"), F.lit("pdf"))
        .when(lower.endswith(".txt"), F.lit("txt"))
        .otherwise(F.lit(None))
    )


# magic-byte dispatch table over the first payload bytes — the formats
# the reference's libmagic call (file_handler.py:45-90) would
# distinguish for this ingest surface. UTF BOMs identify TEXT (they are
# what a legitimate .txt exported from Windows tooling starts with);
# zip covers docx/xlsx/odt containers, gzip covers .gz-wrapped dumps.
_MAGIC_TABLE: tuple[tuple[bytes, str], ...] = (
    (b"%PDF-", "pdf"),
    (b"PK\x03\x04", "zip"),
    (b"\x1f\x8b", "gzip"),
    (b"{\\rtf", "rtf"),  # RTF masquerading as .txt
    (b"\xd0\xcf\x11\xe0", "ole2"),  # legacy .doc/.xls (OLE2 compound)
    (b"\xef\xbb\xbf", "txt"),  # UTF-8 BOM
    (b"\xff\xfe", "txt"),  # UTF-16 LE BOM
    (b"\xfe\xff", "txt"),  # UTF-16 BE BOM
)


def sniff_content_type(payload_col) -> F.Column:
    """First-match magic-byte sniff over the payload prefix: one column
    expression (whole-stage codegen), NULL when no signature matches
    (plain text has no magic — NULL means 'no evidence against txt')."""
    expr = F.lit(None).cast("string")
    for magic, name in reversed(_MAGIC_TABLE):
        expr = F.when(
            F.substring(payload_col, 1, len(magic)) == F.lit(magic),
            F.lit(name),
        ).otherwise(expr)
    return expr


def split_valid_quarantine(
    raw: DataFrame, max_size: int = config.MAX_FILE_SIZE
) -> tuple[DataFrame, DataFrame]:
    """S4 validation as a filter split: (valid, quarantined-with-reason).
    Size cap (config.py:19) + allowed type (config.py:18) + magic-byte
    content sniff (the reference validates content with libmagic,
    file_handler.py:45-90; here the dependency-free _MAGIC_TABLE prefix
    dispatch catches both mislabel directions: a '.txt' carrying
    PDF/zip/gzip bytes would otherwise flow into the decode chain, and
    a '.pdf' without the PDF magic would crash the extractor). The
    quarantine reason names the detected type
    (content_type_mismatch:<sniffed>) so rejects are diagnosable per
    format, not just flagged."""
    typed = raw.withColumn("lang", file_type_of(F.col("path")))
    sniffed = sniff_content_type(F.col("payload"))
    reason = (
        F.when(F.col("payload").isNull(), "empty_payload")
        .when(F.length("payload") > max_size, "too_large")
        .when(F.col("lang").isNull(), "unsupported_type")
        .when(
            (F.col("lang") == "txt") & sniffed.isNotNull() & (sniffed != "txt"),
            F.concat(F.lit("content_type_mismatch:"), sniffed),
        )
        .when(
            (F.col("lang") == "pdf") & (sniffed.isNull() | (sniffed != "pdf")),
            F.concat(
                F.lit("content_type_mismatch:"), F.coalesce(sniffed, F.lit("unknown"))
            ),
        )
    )
    flagged = typed.withColumn("reject_reason", reason)
    valid = flagged.filter(F.col("reject_reason").isNull()).drop("reject_reason")
    quarantine = flagged.filter(F.col("reject_reason").isNotNull())
    return valid, quarantine


def extract_text(valid: DataFrame) -> DataFrame:
    """S2/S3: payload bytes -> content string, by detected type.

    txt: the reference's 7-encoding fallback chain
    (text_processor.py:51-68). pdf: pdfplumber per-page extraction
    (text_processor.py:29-49) when available, else those rows error
    clearly at execution."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            contents = []
            for lang, payload in zip(pdf_batch["lang"], pdf_batch["payload"]):
                if payload is None:
                    contents.append(None)
                elif lang == "txt":
                    contents.append(textlib.decode_with_fallback(bytes(payload)))
                elif lang == "pdf":
                    if not _HAVE_PDFPLUMBER:  # pragma: no cover - env
                        raise NotImplementedError(
                            "pdf extraction requires pdfplumber (not "
                            "installed); route pdf rows elsewhere or "
                            "install it on the cluster"
                        )
                    import io as _io

                    with pdfplumber.open(_io.BytesIO(bytes(payload))) as doc:
                        text = "\n".join(
                            page.extract_text() or "" for page in doc.pages
                        )
                    contents.append(text.strip() or None)
                else:
                    contents.append(None)
            out = pdf_batch[["repo", "path", "commit", "lang"]].copy()
            out["content"] = contents
            yield out

    return valid.mapInPandas(
        run,
        schema="repo string, path string, commit string, lang string, content string",
    )


def ingest(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """bytes -> (documents in input_hint shape, quarantine)."""
    valid, quarantine = split_valid_quarantine(raw)
    return extract_text(valid), quarantine
