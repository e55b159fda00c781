"""Engine configuration: the reference's closed vocabularies and text
patterns, reimplemented as module constants.

Semantics sources (cited for parity checking, NOT copied code):
- 14-label closed entity vocabulary: reference src/streamlit/app/config.py:39-54
- text sectionizer patterns:          reference config.py:78-92
- encoding fallback chain:            reference config.py:93-101
- thresholds / sizes:                 reference config.py:11-23, 76-77
"""

from __future__ import annotations

# ---------------------------------------------------------------- labels
# Closed 14-label vocabulary (reference config.py:39-54). Order matters:
# it is the pivot column order of the wide structured row.
LABELS: tuple[str, ...] = (
    "Site",
    "Nombre Total De Fragments",
    "Nombre Total De Fragments Alvéolés",
    "Grade A",
    "Grade B",
    "Rejet Chronique",
    "Coloration C4d",
    "Lésion Septale",
    "Lésion Intra-Alvéolaire",
    "Éosinophilie",
    "Pneumonie Organisée",
    "DAD",
    "Infection",
    "Autre Pathologie",
)

# Gold-annotation column slugs, label <-> slug mapping
# (reference src/finetuning/data/json_convertissor.py:43-58).
LABEL_SLUGS: dict[str, str] = {
    "Site": "site",
    "Nombre Total De Fragments": "nombre_total_de_fragments",
    "Nombre Total De Fragments Alvéolés": "nombre_total_de_fragments_alveoles",
    "Grade A": "grade_a",
    "Grade B": "grade_b",
    "Rejet Chronique": "rejet_chronique",
    "Coloration C4d": "coloration_c4d",
    "Lésion Septale": "lesion_septale",
    "Lésion Intra-Alvéolaire": "lesion_intra_alveolaire",
    "Éosinophilie": "eosinophilie",
    "Pneumonie Organisée": "pneumonie_organisee",
    "DAD": "dad",
    "Infection": "infection",
    "Autre Pathologie": "autre_pathologie",
}
SLUG_TO_LABEL: dict[str, str] = {v: k for k, v in LABEL_SLUGS.items()}

# ------------------------------------------------------------- sectionizer
# Conclusion-section start patterns, tried in order; first match wins
# (reference config.py:78-83).
CONCLUSION_PATTERNS: tuple[str, ...] = (
    r"C\s*O\s*N\s*C\s*L\s*U\s*S\s*I\s*O\s*N\s*[\n\r]*",
    r"(?i)CONCLUSION[\s:]+",
    r"(?i)CONCLUSION ET SYNTHESE[\s:]+",
    r"(?i)SYNTHESE[\s:]+",
)

# Biopsy-section start patterns (reference config.py:84-88).
BIOPSY_PATTERNS: tuple[str, ...] = (
    r"(?:I\s*[-\s]+)?(?:B|b)iopsies?\s+(?:t|T)ransbronchiques?(?:\s*\([^)]*\))?[\s:]+",
    r"(?:I\s*[-\s]+)(?:B|b)iopsies?\s+(?:t|T)ransbronchiques?(?:\s*\([^)]*\))?",
    r"I\s*[-\s]+.*?(?:fragments?\s+biopsiques)",
)

# Lavage-section patterns terminating the biopsy section
# (reference config.py:89-92).
LAVAGE_PATTERNS: tuple[str, ...] = (
    r"(?:II|2)\s*[-\s]+(?:L|l)avage\s+(?:b|B)roncho[\s-]*(?:a|A)lvéolaire",
    r"(?:L|l)avage\s+(?:b|B)roncho[\s-]*(?:a|A)lvéolaire",
)

# Fallback end markers when no lavage section exists
# (reference utils/text_processor.py:185-191).
END_MARKERS: tuple[str, ...] = (
    r"(?:II|2)\s*[-\s]+",
    r"Suresnes,",
    r"ADICAP",
    r"Compte-rendu",
    r"\n\s*\n",
)

# TXT decode fallback chain (reference config.py:93-101).
ENCODING_ATTEMPTS: tuple[str, ...] = (
    "utf-8",
    "latin1",
    "iso-8859-1",
    "cp1252",
    "windows-1252",
    "ascii",
    "mac_roman",
)

# ------------------------------------------------------------- thresholds
DEFAULT_CONFIDENCE_THRESHOLD = 0.5  # reference config.py:11
MAX_SEQUENCE_LENGTH = 512  # chars, not tokens (reference config.py:12)
BATCH_SIZE = 32  # reference config.py:13
MAX_TEXT_LENGTH = 10_000  # reference config.py:76
MIN_CONCLUSION_LENGTH = 50  # reference config.py:77
MAX_FILE_SIZE = 10 * 1024 * 1024  # reference config.py:19
ALLOWED_LANGS: tuple[str, ...] = ("pdf", "txt")  # reference config.py:18

# Timestamp storage format (reference config.py:110, entity_processor.py:59).
DATE_FORMAT = "%Y-%m-%d %H:%M:%S"


# ------------------------------------------------------------- validation
def validate_label_config(
    labels: tuple[str, ...] = LABELS,
    slugs: dict[str, str] | None = None,
) -> None:
    """U3 startup consistency check (reference config.py:180-181 asserts
    label/color set equality): every label must have a slug and vice
    versa. Raises ValueError with the exact divergence."""
    slugs = LABEL_SLUGS if slugs is None else slugs
    missing = set(labels) - set(slugs)
    extra = set(slugs) - set(labels)
    if missing or extra:
        raise ValueError(
            f"label/slug sets diverge: missing slugs for {sorted(missing)}, "
            f"slugs without labels {sorted(extra)}"
        )


validate_label_config()  # fail fast at import, like the reference
