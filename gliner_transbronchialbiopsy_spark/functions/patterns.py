"""Deterministic pattern catalogs for the mention-detection stand-in.

The reference's mention detector is a GLiNER bi-encoder
(src/streamlit/app/models/model_handler.py:166-170). For a testable,
model-free engine core we use a deterministic pattern-NER whose label
vocabulary and output shape are identical (text/label/score/start/end —
model_handler.py:20-37); the real GLiNER path plugs into the same
mapInPandas stage (operators/ner.py) behind a flag.

MEDICAL_PATTERNS covers the extractable entity semantics the reference
fine-tunes GLiNER on (sandbox.ipynb cells 11-17; README.md:41-52):
rejection grades A0-A4/B0-B2 (+ Ax/A+), biopsy sites, fragment counts,
C4d staining, septal/intra-alveolar lesions, etc.

KEYWORD_PATTERNS is the generic catalog for the driver's synthetic
`documents` table (word-soup text) so the same DAG is exercisable and
DuckDB-oracle-checkable on driver data.
"""

from __future__ import annotations

import re

# Matched against the *normalized* conclusion (post clean_text +
# format_grade_notations), so grades appear as "A0 B0", dashes are '-',
# whitespace is single spaces.
MEDICAL_PATTERNS: dict[str, str] = {
    # acronym sites are uppercase; phrase sites may be lowercase
    "Site": (
        r"\b(?:LID|LIG|LSD|LSG|LM"
        r"|lobe inférieur droit|lobe inférieur gauche"
        r"|lobe supérieur droit|lobe supérieur gauche|lobe moyen)\b"
    ),
    # "7 fragments" but NOT "7 fragments alvéolés"
    "Nombre Total De Fragments": r"\b\d+(?=\s+fragments?\b(?!\s+alvéolés))",
    # "5 fragments alvéolés" / "5 alvéolés"
    "Nombre Total De Fragments Alvéolés": (
        r"\b\d+(?=\s+(?:fragments?\s+)?alvéolés\b)"
    ),
    # post-normalization grade tokens: A0..A4, Ax, A+ (lowercase survives
    # the reference's grade rewrite for 'grade aX' inputs)
    "Grade A": r"\b[Aa](?:\d|x|X|\+)\b",
    "Grade B": r"\b[Bb](?:\d|x|X|\+)\b",
    "Rejet Chronique": (
        r"(?:[Aa]bsence de (?:lésions évocatrices de )?rejet chronique"
        r"|[Rr]ejet chronique(?: débutant| avéré)?)"
    ),
    "Coloration C4d": r"C4d\s+(?:négatif|négative|positif|positive|non contributif)",
    "Lésion Septale": r"[Ll]ésions? septales?(?: minimes?| modérées?| marquées?)?",
    "Lésion Intra-Alvéolaire": r"[Ll]ésions? intra-alvéolaires?",
    "Éosinophilie": r"[Éé]osinophilie(?: modérée| marquée| discrète)?",
    "Pneumonie Organisée": r"[Pp]neumonie organisée(?: focale)?",
    "DAD": r"\bDAD\b",
    "Infection": r"[Ii]nfection(?: à CMV| fongique| bactérienne| virale)?",
    "Autre Pathologie": (
        r"(?:[Ff]ibrose interstitielle|[Gg]ranulomes? épithélioïdes?"
        r"|[Ee]mphysème|[Pp]neumoconiose)"
    ),
}

# Value shapes for the SHACL-lite audit (kgvalidate / run_kg_job
# --validate): the shape an EMITTED object value must fullmatch.
# Defaults to the extraction pattern itself; labels whose pattern is
# context-dependent (lookaround — the matched span alone cannot
# re-satisfy the assertion) override with the span's own shape here.
MEDICAL_VALUE_SHAPES: dict[str, str] = {
    "Nombre Total De Fragments": r"\d+",
    "Nombre Total De Fragments Alvéolés": r"\d+",
}


def value_shape(label: str, extraction_pattern: str) -> str:
    return MEDICAL_VALUE_SHAPES.get(label, extraction_pattern)


# Generic keyword catalog for the driver-generated documents table
# (text is word-soup over these tokens). Label -> regex.
KEYWORD_TERMS: dict[str, tuple[str, ...]] = {
    "exec_op": ("join", "filter", "sort", "merge", "scan", "agg", "window"),
    "data_noun": ("table", "column", "row", "key", "value", "batch", "stream"),
    "engine": ("spark", "query", "hash", "vector", "group", "order"),
}
KEYWORD_PATTERNS: dict[str, str] = {
    label: r"\b(?:" + "|".join(terms) + r")\b"
    for label, terms in KEYWORD_TERMS.items()
}


def compile_catalog(patterns: dict[str, str]) -> dict[str, re.Pattern]:
    return {label: re.compile(rx) for label, rx in patterns.items()}
