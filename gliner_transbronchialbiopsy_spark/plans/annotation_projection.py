"""Entry point 3 — training-data construction at scale (SURVEY.md §3.3).

Reference: src/finetuning/data/json_convertissor.py — wide gold
annotation rows (Excel) -> {"tokenized_text": [...], "ner":
[[start_tok, end_tok, label], ...]} records via case-insensitive
token-subsequence projection (find_token_spans, :13-36), ';'
multi-values split (:74-77), rows with null text skipped (:64-65).

Spark restatement: one narrow mapInPandas pass (the projection is a
pure function of the row — no shuffle at all), Arrow-batched, emitting
typed columns instead of ad-hoc JSON:

    tokenized_text: array<string>
    ner:            array<struct<start:int, end:int, label:string>>

The JSON training file is a sink-side `df.write.json` of exactly this
shape (S9).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import config
from ..functions import textlib

RECORD_SCHEMA = (
    "path string, tokenized_text array<string>, "
    "ner array<struct<start:int, end:int, label:string>>"
)


def project_annotations(
    gold: DataFrame,
    text_col: str = "conclusion_text",
    slug_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Wide gold table -> one training record per document.

    Column order of slug_cols fixes span emission order, matching the
    reference's dict-iteration order (json_convertissor.py:71-83)."""
    slugs = tuple(slug_cols or config.LABEL_SLUGS.values())
    cols = ["path", text_col, *slugs]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, toks_out, ner_out = [], [], []
            for row in pdf.itertuples(index=False):
                text = getattr(row, text_col)
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    continue  # reference skips null-text rows (:64-65)
                tokens = textlib.tokenize(text)
                spans: list[tuple[int, int, str]] = []
                for slug in slugs:
                    value = getattr(row, slug)
                    if value is None or (
                        isinstance(value, float) and pd.isna(value)
                    ):
                        continue
                    values = (
                        [v.strip() for v in value.split(";")]
                        if isinstance(value, str) and ";" in value
                        else [value]
                    )
                    for val in values:
                        for s, e, _ in textlib.find_token_spans(text, str(val)):
                            spans.append((s, e, slug))
                paths.append(row.path)
                toks_out.append(tokens)
                ner_out.append(spans)
            yield pd.DataFrame(
                {"path": paths, "tokenized_text": toks_out, "ner": ner_out}
            )

    return gold.select(*cols).mapInPandas(run, schema=RECORD_SCHEMA)


def train_test_split(
    records: DataFrame, test_fraction: float = 0.1, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """U5 split (reference train.py:83-86 shuffle+slice), restated as a
    deterministic hash bucket so it is stable across cluster sizes."""
    bucketed = records.withColumn(
        "_b", F.pmod(F.xxhash64("path", F.lit(seed)), F.lit(1000))
    )
    cut = int(test_fraction * 1000)
    test = bucketed.filter(F.col("_b") < cut).drop("_b")
    train = bucketed.filter(F.col("_b") >= cut).drop("_b")
    return train, test


def write_training_json(records: DataFrame, out_dir: str) -> None:
    """S9 sink: the reference's data.json format as JSON-lines."""
    records.select("tokenized_text", "ner").write.mode("overwrite").json(out_dir)
