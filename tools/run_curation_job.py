"""spark-submit entry for the corpus-curation pipeline (the LLM
training-data cleaning pass: lang -> quality -> exact dedup -> MinHash
near-dup cluster election).

    spark-submit --py-files gtbs_pkg.zip tools/run_curation_job.py \
        --input <documents parquet> --output <dir> --cpus 32

Writes <output>/kept.parquet (the curated corpus, original columns +
lang_pred/quality_score) and <output>/report.json (per-stage rejection
audit), and prints the report as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--langs", default="en", help="comma-separated keep list")
    ap.add_argument("--min-quality", type=float, default=0.45)
    ap.add_argument(
        "--max-dup-segment-frac", type=float, default=None,
        help="repetition cap: duplicated sentence-segment fraction",
    )
    ap.add_argument(
        "--max-top-bigram-frac", type=float, default=None,
        help="repetition cap: top word-bigram occurrence fraction",
    )
    ap.add_argument(
        "--max-dup-ngram-frac", type=float, default=None,
        help="repetition cap: duplicated word n-gram fraction",
    )
    ap.add_argument(
        "--dup-gram-n", type=int, default=5,
        help="n for the duplicated-n-gram repetition signal",
    )
    ap.add_argument(
        "--scrub-pii", action="store_true",
        help="redact emails/IPs/phones/id runs in the kept text",
    )
    ap.add_argument(
        "--jaccard", type=float, default=0.5,
        help="near-dup MinHash estimate threshold",
    )
    ap.add_argument(
        "--no-near-dup", action="store_true",
        help="scalar stages + exact dedup only (skip the LSH pass)",
    )
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    args = ap.parse_args()

    from gliner_transbronchialbiopsy_spark.plans import corpus_curation
    from gliner_transbronchialbiopsy_spark.session import get_spark

    if not os.path.exists(args.input):
        ap.error(f"--input path does not exist: {args.input}")
    langs = tuple(s.strip() for s in args.langs.split(",") if s.strip())

    spark = get_spark(
        "curation_job", cpus=args.cpus, shuffle_partitions=args.cpus
    )
    docs = spark.read.parquet(args.input)
    rep_kw = dict(
        max_dup_segment_frac=args.max_dup_segment_frac,
        max_top_bigram_frac=args.max_top_bigram_frac,
        max_dup_ngram_frac=args.max_dup_ngram_frac,
        dup_gram_n=args.dup_gram_n,
    )
    t0 = time.time()
    if args.no_near_dup:
        kept = corpus_curation.curate(
            docs, args.text_col, args.id_col, langs, args.min_quality,
            scrub_pii=args.scrub_pii, **rep_kw,
        )
    else:
        kept = corpus_curation.curate_near_dup(
            docs, args.text_col, args.id_col, langs, args.min_quality,
            jaccard_threshold=args.jaccard, scrub_pii=args.scrub_pii,
            **rep_kw,
        )
    os.makedirs(args.output, exist_ok=True)
    kept_path = os.path.join(args.output, "kept.parquet")
    kept.write.mode("overwrite").parquet(kept_path)
    # per-stage accounting WITHOUT re-running the LSH pass (report()'s
    # near_dup=True recomputes signatures+components a second time —
    # fine for the contract oracle, wasteful here): the scalar stages
    # come from one aggregate over flag(), and near_duplicate is
    # exactly scalar-survivors minus the written keep list (the loser
    # set is defined as their difference in curate_near_dup).
    from pyspark.sql import functions as F

    scalar = (
        corpus_curation.flag(
            docs, args.text_col, args.id_col, langs, args.min_quality,
            **rep_kw,
        )
        .agg(
            F.count(F.lit(1)).alias("n_input"),
            *[
                F.count(
                    F.when(F.col("reject_stage") == s, 1)
                ).alias(f"n_{s}")
                for s in ("lang", "quality", "repetition", "duplicate")
            ],
            F.count(
                F.when(F.col("reject_stage").isNull(), 1)
            ).alias("n_scalar_kept"),
        )
        .collect()[0]
        .asDict()
    )
    n_kept = spark.read.parquet(kept_path).count()
    report = {
        "n_input": scalar["n_input"],
        "n_lang": scalar["n_lang"],
        "n_quality": scalar["n_quality"],
        "n_repetition": scalar["n_repetition"],
        "n_duplicate": scalar["n_duplicate"],
        "n_near_duplicate": scalar["n_scalar_kept"] - n_kept,
        "n_kept": n_kept,
    }
    report["wall_sec"] = round(time.time() - t0, 2)
    report["kept_path"] = os.path.join(args.output, "kept.parquet")
    with open(os.path.join(args.output, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
