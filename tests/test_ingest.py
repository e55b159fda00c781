"""Raw-bytes ingest (S2/S3/S4/S5): dispatch, validation split,
encoding-fallback decode, pdf gating."""

import pytest
from pyspark.sql import functions as F

from gliner_transbronchialbiopsy_spark.sources import ingest


def _raw(spark, rows):
    return spark.createDataFrame(rows, ingest.RAW_SCHEMA)


def test_validation_split_and_dispatch(spark):
    rows = [
        ("r", "a.txt", "c", bytearray(b"bonjour")),
        ("r", "b.pdf", "c", bytearray(b"%PDF-fake")),
        ("r", "c.exe", "c", bytearray(b"MZ")),         # unsupported
        ("r", "d.txt", "c", bytearray(b"x" * (11 * 1024 * 1024))),  # too big
        ("r", "e.txt", "c", None),                      # empty
    ]
    valid, quarantine = ingest.split_valid_quarantine(_raw(spark, rows))
    v = {r["path"]: r["lang"] for r in valid.collect()}
    q = {r["path"]: r["reject_reason"] for r in quarantine.collect()}
    assert v == {"a.txt": "txt", "b.pdf": "pdf"}
    assert q == {
        "c.exe": "unsupported_type",
        "d.txt": "too_large",
        "e.txt": "empty_payload",
    }


def test_txt_decode_fallback_chain(spark):
    rows = [
        ("r", "utf8.txt", "c", bytearray("héllo utf8".encode("utf-8"))),
        ("r", "latin1.txt", "c", bytearray("héllo latin".encode("latin1"))),
    ]
    valid, _ = ingest.split_valid_quarantine(_raw(spark, rows))
    docs = {r["path"]: r["content"] for r in ingest.extract_text(valid).collect()}
    assert docs["utf8.txt"] == "héllo utf8"
    assert docs["latin1.txt"] == "héllo latin"


def test_pdf_gated_when_pdfplumber_missing(spark):
    if ingest._HAVE_PDFPLUMBER:
        pytest.skip("pdfplumber installed")
    rows = [("r", "x.pdf", "c", bytearray(b"%PDF-1.4 fake"))]
    valid, _ = ingest.split_valid_quarantine(_raw(spark, rows))
    with pytest.raises(Exception, match="pdfplumber|NotImplemented"):
        ingest.extract_text(valid).collect()


def test_ingest_feeds_pipeline(spark):
    text = (
        "Préambule.\nCONCLUSION : I - Biopsies transbronchiques (LID) : "
        "7 fragments. A0B0."
    )
    rows = [("r", "doc.txt", "c", bytearray(text.encode("utf-8")))]
    docs, _ = ingest.ingest(_raw(spark, rows))
    from gliner_transbronchialbiopsy_spark.plans import kg_pipeline

    sectionized = kg_pipeline.sectionize(kg_pipeline.validate_documents(docs))
    mentions = kg_pipeline.detect(sectionized)
    got = {(r["label"], r["text"]) for r in mentions.collect()}
    assert ("Site", "LID") in got
    assert ("Grade A", "A0") in got and ("Grade B", "B0") in got
    assert ("Nombre Total De Fragments", "7") in got


def test_magic_byte_sniff_quarantines_mismatches(spark):
    """S4 content sniff (reference file_handler.py:45-90 uses libmagic):
    a '.txt' carrying PDF bytes and a '.pdf' without the PDF magic both
    land in quarantine, with the reason naming the detected type."""
    rows = [
        ("r", "lying.txt", "c", bytearray(b"%PDF-1.7 not text at all")),
        ("r", "lying.pdf", "c", bytearray(b"just plain words")),
        ("r", "honest.txt", "c", bytearray(b"du texte normal")),
        ("r", "honest.pdf", "c", bytearray(b"%PDF-1.4 stream")),
    ]
    valid, quarantine = ingest.split_valid_quarantine(_raw(spark, rows))
    v = {r["path"] for r in valid.collect()}
    q = {r["path"]: r["reject_reason"] for r in quarantine.collect()}
    assert v == {"honest.txt", "honest.pdf"}
    assert q == {
        "lying.txt": "content_type_mismatch:pdf",
        "lying.pdf": "content_type_mismatch:unknown",
    }


def test_magic_byte_dispatch_table(spark):
    """The widened dispatch: zip (docx container) and gzip payloads in
    a '.txt' quarantine with their detected type; UTF-BOM payloads are
    recognized as text and flow through; a '.pdf' holding a zip is a
    mismatch naming zip."""
    rows = [
        ("r", "docx_as.txt", "c", bytearray(b"PK\x03\x04rest-of-zip")),
        ("r", "dump_as.txt", "c", bytearray(b"\x1f\x8b\x08gzip-body")),
        ("r", "bom_utf8.txt", "c", bytearray(b"\xef\xbb\xbfdu texte")),
        ("r", "bom_utf16.txt", "c", bytearray(b"\xff\xfed\x00u\x00")),
        ("r", "zip_as.pdf", "c", bytearray(b"PK\x03\x04rest-of-zip")),
        ("r", "rtf_as.txt", "c", bytearray(b"{\\rtf1\\ansi corps")),
        ("r", "doc_as.txt", "c", bytearray(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1")),
    ]
    valid, quarantine = ingest.split_valid_quarantine(_raw(spark, rows))
    v = {r["path"] for r in valid.collect()}
    q = {r["path"]: r["reject_reason"] for r in quarantine.collect()}
    assert v == {"bom_utf8.txt", "bom_utf16.txt"}
    assert q == {
        "docx_as.txt": "content_type_mismatch:zip",
        "dump_as.txt": "content_type_mismatch:gzip",
        "zip_as.pdf": "content_type_mismatch:zip",
        "rtf_as.txt": "content_type_mismatch:rtf",
        "doc_as.txt": "content_type_mismatch:ole2",
    }
