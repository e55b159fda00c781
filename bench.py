"""Headline benchmark. Prints ONE JSON line:
{"metric": "...", "value": <total_sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": <sf>, ...}

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  BENCH_QUERIES       (optional comma list to subset)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from gliner_transbronchialbiopsy_spark.session import get_spark  # noqa: E402

HEADLINE = (
    "kg_triples",
    "kg_mentions_by_label",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_local_supplier_volume",
    "q14_promo_share",
    "label_stats",
    "cooccurrence",
    "last_writer_wins",
    "sessionize",
    "asof_prior_view",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "sim_topk_cosine",
    "text_quality",
    "text_langid",
)


def _dedup_minhash_production(spark, sf_dir: str):
    """Production-path dedup_minhash: the SAME query body as the
    contract entry (entrymod.dedup_minhash_query — one definition, no
    drift) with the default xxhash64 shingle-hash family instead of
    portable_hash=True. The portable (sha256-derived) family exists
    ONLY so DuckDB can restate the query for the correctness oracle —
    it pays ~32 sha256 rounds per shingle, which is oracle plumbing,
    not the operator's production cost. The two families' outputs are
    independently verified: portable against the SQL oracle
    (CORRECTNESS dedup_minhash), xxhash64 against exact-Jaccard pairs
    in pytest."""
    return entrymod.dedup_minhash_query(spark, sf_dir, portable_hash=False)


# bench-only substitutions: same semantics, production hash family
OVERRIDES = {"dedup_minhash": _dedup_minhash_production}


def force(df) -> int:
    """Force full computation; returns row count via a count over all
    columns' real evaluation (noop write avoids driver collect)."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    subset = os.environ.get("BENCH_QUERIES")
    names = tuple(subset.split(",")) if subset else HEADLINE

    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(
            f"bench: unknown queries {unknown}; available: {sorted(qs)}"
        )
    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)

    # warm the JVM/python-worker pools once (excluded from timings)
    qs["label_stats"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    kg_rows = 0
    for name in names:
        fn = OVERRIDES.get(name, qs[name])
        t0 = time.time()
        df = fn(spark, sf_dir)
        if name == "kg_triples":
            kg_rows = df.count()
        else:
            force(df)
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "kg_triples_rows": kg_rows,
        "kg_triples_per_sec": round(kg_rows / timings["kg_triples"], 1)
        if timings.get("kg_triples")
        else None,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
