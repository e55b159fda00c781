"""PII redaction for training corpora: detect and replace emails,
phone numbers, IP addresses, and long digit runs (IDs / card numbers)
with typed placeholder tokens, with per-document accounting.

All JVM-side regexp expressions (regexp_replace / regexp_extract_all)
— whole-stage codegen over the scan, no Python, no shuffle: at 100 TB
this is a free rider on whatever pass already reads the text column.
The pattern catalog is deliberately conservative (low false-positive
redaction destroys training signal); a production pass would extend
PATTERNS, not the plumbing.

Not a reference-parity item: the reference ingests medical biopsy
reports (a PII-heavy domain) with no scrub stage of its own; this is
the standard public pretraining-pipeline heuristic (C4-style regex
scrub) the engine adds for corpus curation at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, regex, replacement) — applied in order; order matters (emails
#: contain digit runs, so they redact first; IPs would otherwise be
#: eaten by the digit-run rule).
PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d ().-]{7,}\d", "<PHONE>"),
    ("idnum", r"\b\d{6,}\b", "<ID>"),
)


def pii_counts(col: Column) -> list[Column]:
    """One count column per pattern (n_<name>), counted on the ORIGINAL
    text. Counts are taken pattern-by-pattern on the raw text, so a
    string matched by two patterns counts under both — the redaction
    itself is sequential and each char is replaced once."""
    return [
        F.size(F.regexp_extract_all(col, F.lit(rx), F.lit(0))).alias(f"n_{name}")
        for name, rx, _ in PATTERNS
    ]


def redacted(col: Column) -> Column:
    """The text with every pattern replaced by its placeholder, applied
    in PATTERNS order (earlier patterns shadow later ones)."""
    out = col
    for _, rx, repl in PATTERNS:
        out = F.regexp_replace(out, rx, repl)
    return out


def redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """df with text_col replaced by its redacted form plus per-pattern
    count columns (n_email, n_ip, n_phone, n_idnum) and n_pii_total."""
    counts = pii_counts(F.col(text_col))
    out = df.select(
        *[c for c in df.columns if c != text_col],
        redacted(F.col(text_col)).alias(text_col),
        *counts,
    )
    total = None
    for name, _, _ in PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii_total", total)
