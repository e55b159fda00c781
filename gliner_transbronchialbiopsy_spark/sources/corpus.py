"""Deterministic synthetic biopsy-report corpus + gold annotations.

Seeded (42) generator producing:
- documents(repo, path, commit, lang, content)  — the exact input_hint
  shape from BASELINE.json;
- gold(path, conclusion_text, <14 label slugs>) — the wide gold table
  mirroring the reference's Excel annotation source
  (src/finetuning/data/json_convertissor.py:40-58), multi-values
  ';'-joined (json_convertissor.py:74-77).

Content templates embed the reference's extractable patterns
(sandbox.ipynb cells 11-17; dashboard.py:238-242) with controlled
variation: the four grade-notation styles (text_processor.py:229-234),
fragment counts, sites, C4d staining, findings, plus distractor prose
that deliberately contains none of the pattern vocabulary.

Skew by construction: ~7% of rows are exact duplicates of 5 boilerplate
contents (the hot-key skew the north rule calls out), and lengths are
long-tailed 50..10_000 chars (reference MAX_TEXT_LENGTH, config.py:76).
"""

from __future__ import annotations

import random
from pathlib import Path

import pandas as pd

from .. import config
from ..functions import textlib

SITES = (
    "LID", "LIG", "LSD", "LSG", "LM",
    "lobe inférieur droit", "lobe supérieur gauche", "lobe moyen",
)

# (style, needs_gb) — gold surfaces computed per style below.
_GRADE_STYLES = ("std", "joined", "lower_joined", "dashed", "grade_prefix")

_FINDINGS: dict[str, tuple[str, ...]] = {
    # label slug -> candidate surface forms (as they appear post clean_text)
    "rejet_chronique": (
        "Absence de rejet chronique",
        "Absence de lésions évocatrices de rejet chronique",
        "Rejet chronique débutant",
    ),
    "coloration_c4d": ("C4d négatif", "C4d positif", "C4d non contributif"),
    "lesion_septale": ("Lésion septale minime", "Lésions septales modérées"),
    "lesion_intra_alveolaire": ("Lésion intra-alvéolaire",),
    "eosinophilie": ("Éosinophilie modérée", "Éosinophilie discrète"),
    "pneumonie_organisee": ("Pneumonie organisée", "Pneumonie organisée focale"),
    "dad": ("DAD",),
    "infection": ("Infection à CMV", "Infection fongique"),
    "autre_pathologie": ("Fibrose interstitielle", "Granulome épithélioïde"),
}

# Distractor prose: intentionally free of every pattern-vocabulary word.
_FILLER_SENTENCES = (
    "Le prélèvement est parvenu fixé au formol.",
    "Examen réalisé selon le protocole habituel du laboratoire.",
    "Les colorations standards ont été effectuées.",
    "Matériel adressé pour étude histologique.",
    "Les niveaux de coupe étudiés montrent un parenchyme d'architecture conservée.",
    "On note un discret épaississement des parois.",
    "Le revêtement est régulier sur toute la hauteur examinée.",
    "Présence de quelques macrophages intra-luminaux.",
)

_HEADERS = (
    "COMPTE RENDU D'EXAMEN ANATOMOPATHOLOGIQUE. Dossier transmis par le service.",
    "Service d'anatomie pathologique. Renseignements cliniques: surveillance de greffe.",
    "Examen demandé: contrôle histologique. Prélèvements multiples adressés.",
)

_CONCLUSION_MARKERS = ("CONCLUSION :\n", "CONCLUSION: ", "SYNTHESE : ")

_TRAILERS = (
    "\nII - Lavage broncho-alvéolaire : liquide clair, cellularité normale.",
    "\nSuresnes, le compte rendu est validé électroniquement.",
    "\nADICAP : BPXX0000.",
    "\nII - Autre prélèvement sans particularité.",
)


def _grade_fragment(rng: random.Random) -> tuple[str, str | None, str | None]:
    """Return (raw_text, gold_grade_a, gold_grade_b) for one grade style."""
    ga = rng.choice("01234x")
    gb = rng.choice("012x")
    style = rng.choice(_GRADE_STYLES)
    if style == "std":
        return f"A{ga} B{gb}", f"A{ga}", f"B{gb}"
    if style == "joined":
        return f"A{ga}B{gb}", f"A{ga}", f"B{gb}"
    if style == "lower_joined":
        return f"a{ga}b{gb}", f"A{ga}", f"B{gb}"
    if style == "dashed":
        return f"A{ga}-B{gb}", f"A{ga}", f"B{gb}"
    # grade_prefix: reference rewrite keeps the letter's case
    # (text_processor.py:232 backreference) -> gold surface stays lowercase
    return f"grade a{ga}", f"a{ga}", None


def generate_corpus(
    n_docs: int = 200, seed: int = 42, path_offset: int = 0
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Build (documents, gold) pandas frames deterministically.
    path_offset keeps doc identities disjoint across sharded writers."""
    rng = random.Random(seed)
    boilerplates: list[tuple[str, dict[str, str]]] = []

    doc_rows: list[dict] = []
    gold_rows: list[dict] = []

    for i in range(n_docs):
        j = i + path_offset
        repo = f"repo{j % 50:03d}"
        path = f"reports/report{j:06d}.txt"
        commit = textlib.sha256_hex(f"{repo}/{path}")[:40]
        lang = rng.choice(config.ALLOWED_LANGS)

        # ~7% exact duplicates of up to 5 boilerplate contents (hot keys)
        if boilerplates and rng.random() < 0.07:
            content, gold_vals = rng.choice(boilerplates)
            doc_rows.append(
                dict(repo=repo, path=path, commit=commit, lang=lang, content=content)
            )
            gold_rows.append({"path": path, **gold_vals})
            continue

        # ~8% of docs have no conclusion section at all (sectionizer miss path)
        if rng.random() < 0.08:
            filler = " ".join(
                rng.choice(_FILLER_SENTENCES)
                for _ in range(rng.randint(3, 30))
            )
            content = f"{rng.choice(_HEADERS)}\n{filler}"
            doc_rows.append(
                dict(repo=repo, path=path, commit=commit, lang=lang, content=content)
            )
            gold_rows.append({"path": path})
            continue

        gold: dict[str, list[str]] = {slug: [] for slug in config.LABEL_SLUGS.values()}

        site = rng.choice(SITES)
        gold["site"].append(site)
        n_frag = rng.randint(1, 12)
        n_alv = rng.randint(0, n_frag)
        grade_raw, gold_a, gold_b = _grade_fragment(rng)
        if gold_a:
            gold["grade_a"].append(gold_a)
        if gold_b:
            gold["grade_b"].append(gold_b)
        gold["nombre_total_de_fragments"].append(str(n_frag))
        gold["nombre_total_de_fragments_alveoles"].append(str(n_alv))

        sentences = [
            f"{n_frag} fragments dont {n_alv} alvéolés.",
            f"Absence de rejet aigu cellulaire bronchiolaire ou parenchymateux ({grade_raw}).",
        ]
        for slug, options in _FINDINGS.items():
            if rng.random() < 0.35:
                surface = rng.choice(options)
                gold[slug].append(surface)
                sentences.append(surface + ".")
        rng.shuffle(sentences)

        biopsy = (
            f"I - Biopsies transbronchiques ({site}) : " + " ".join(sentences)
        )
        marker = rng.choice(_CONCLUSION_MARKERS)
        trailer = rng.choice(_TRAILERS)
        pre_filler = " ".join(
            rng.choice(_FILLER_SENTENCES) for _ in range(rng.randint(1, 40))
        )
        content = f"{rng.choice(_HEADERS)}\n{pre_filler}\n{marker}{biopsy}{trailer}"
        if len(content) > config.MAX_TEXT_LENGTH:
            content = content[: config.MAX_TEXT_LENGTH]

        # Project gold values onto the extracted conclusion, keeping only
        # values whose token sequence survives sectionizing — the
        # reference's own annotation-projection rule (json_convertissor.py
        # :80-83 emits spans only when find_token_spans hits). Note the
        # sectionizer's end-marker r"(?:II|2)\s*[-\s]+" truncates at any
        # "2 " (even inside "12 fragments") — a reference quirk we keep.
        conclusion = textlib.extract_conclusion(content)
        gold_vals = {}
        if conclusion:
            for slug, vals in gold.items():
                kept = [
                    v for v in vals if textlib.find_token_spans(conclusion, v)
                ]
                if kept:
                    gold_vals[slug] = ";".join(kept)
        gold_vals["conclusion_text"] = conclusion

        doc_rows.append(
            dict(repo=repo, path=path, commit=commit, lang=lang, content=content)
        )
        gold_rows.append({"path": path, **gold_vals})
        if len(boilerplates) < 5:
            boilerplates.append((content, gold_vals))

    documents = pd.DataFrame(doc_rows)
    gold_cols = ["path", "conclusion_text"] + list(config.LABEL_SLUGS.values())
    gold = pd.DataFrame(gold_rows).reindex(columns=gold_cols)
    return documents, gold


def write_corpus(out_dir: str | Path, n_docs: int = 200, seed: int = 42) -> None:
    """Materialize the corpus as parquet (documents.parquet, gold.parquet)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    documents, gold = generate_corpus(n_docs=n_docs, seed=seed)
    # small row groups so Spark's scan can split the single file into
    # parallel tasks (a one-row-group file pins the whole first UDF
    # stage to one task regardless of maxPartitionBytes)
    documents.to_parquet(out / "documents.parquet", index=False,
                         row_group_size=4096)
    gold.to_parquet(out / "gold.parquet", index=False, row_group_size=4096)


def _write_shard(args: tuple) -> str:
    out_dir, shard, n_docs, seed = args
    documents, gold = generate_corpus(
        n_docs=n_docs, seed=seed, path_offset=shard * n_docs
    )
    documents.to_parquet(
        Path(out_dir) / "documents.parquet" / f"part-{shard:04d}.parquet",
        index=False, row_group_size=4096,
    )
    gold.to_parquet(
        Path(out_dir) / "gold.parquet" / f"part-{shard:04d}.parquet",
        index=False, row_group_size=4096,
    )
    return f"shard {shard}"


def write_corpus_sharded(
    out_dir: str | Path,
    n_docs: int,
    shards: int = 16,
    seed: int = 42,
    processes: int | None = None,
) -> None:
    """Parallel sharded corpus writer for large scaling corpora:
    `shards` independent deterministic streams (seed+shard), one parquet
    file each under documents.parquet/ — which also gives Spark's scan
    natural file-level parallelism (the 100 TB layout in miniature).
    NOTE: shard streams differ from the single-stream write_corpus at
    the same n_docs; use write_corpus for P/R-gold fixtures."""
    import multiprocessing as mp

    out = Path(out_dir)
    (out / "documents.parquet").mkdir(parents=True, exist_ok=True)
    (out / "gold.parquet").mkdir(parents=True, exist_ok=True)
    per = n_docs // shards
    jobs = [(str(out), s, per, seed + s) for s in range(shards)]
    with mp.Pool(processes or min(shards, 16)) as pool:
        pool.map(_write_shard, jobs)


def gold_triples(gold: pd.DataFrame) -> pd.DataFrame:
    """Melt the wide gold table to (path, label, value) triples —
    the reference's annotation projection applied at value granularity
    (json_convertissor.py:71-83): split ';' multi-values, one row each."""
    rows = []
    for _, r in gold.iterrows():
        for slug, label in config.SLUG_TO_LABEL.items():
            v = r.get(slug)
            if isinstance(v, str) and v:
                for part in v.split(";"):
                    rows.append((r["path"], label, part))
    return pd.DataFrame(rows, columns=["path", "label", "value"])


def read_gold_excel(spark, xlsx_path: str):
    """S10: the reference's gold-annotation Excel source
    (json_convertissor.py:40 `pd.read_excel`) as a gated driver-side
    shim: one small gold workbook -> createDataFrame. Gold tables are
    human-curated (thousands of rows, not billions), so a driver-side
    read is the right shape; the projection over the CORPUS stays
    distributed. Gated on openpyxl (pandas' xlsx engine), same
    discipline as the pdfplumber gate."""
    try:
        import openpyxl  # type: ignore # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "Excel gold source requires openpyxl (not installed); "
            "convert the workbook to parquet/csv or install openpyxl "
            "on the driver"
        ) from e
    pdf = pd.read_excel(xlsx_path, engine="openpyxl")
    return spark.createDataFrame(pdf)
