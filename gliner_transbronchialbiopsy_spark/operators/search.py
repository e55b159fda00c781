"""Positional inverted index + phrase matching — the IR primitive BM25
(operators/termstats.bm25) deliberately ignores: exact multi-token
PHRASE occurrences, resolved by term-position adjacency instead of
bag-of-words scoring.

The index is the classic postings relation (term, doc_id, pos). A
k-token phrase match is k-1 equi-joins on (doc_id, pos+i) — but each
join side is FIRST filtered to one term's posting list, so the join
keys are the (usually tiny) posting lists of the phrase's terms, not
the corpus: the standard search-engine evaluation order. At 100 TB
the postings relation is the thing you materialize once (partitioned
by term), and a phrase query touches only its terms' partitions —
the same pred-pruned-scan discipline as the triple store's
predicate partitioning.

Tokenization is the shared whitespace contract
(functions/textlib.tokenize semantics): split on runs of whitespace,
as the repo's term operators do, so phrase positions agree with
token counts everywhere.

Reference analogue: the dashboard's exact-text entity filter
(/root/reference/src/streamlit/app/utils/dashboard.py search box)
done pandas-side per document; generalized to an indexed phrase
query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The positional inverted index: (term, doc_id, pos), pos
    0-based token position. One projection + explode — build once,
    write partitioned by term (or term-hash bucket) for pruned phrase
    scans."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.trim(F.col(text_col)), r"\s+")
        ).alias("pos", "term"),
    ).filter(F.col("term") != "")


def phrase_match(
    postings_df: DataFrame, phrase: list[str]
) -> DataFrame:
    """Docs containing the exact token phrase, with occurrence
    counts: (doc_id, n_hits). k-1 posting-list joins on
    (doc_id, pos + i); overlapping occurrences each count (positions
    are distinct by construction, so no distinct pass is needed)."""
    if not phrase:
        raise ValueError("phrase_match: empty phrase")
    base = postings_df.filter(F.col("term") == phrase[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    cur = base
    for i, term in enumerate(phrase[1:], start=1):
        nxt = postings_df.filter(F.col("term") == term).select(
            F.col("doc_id").alias("_d"),
            (F.col("pos") - i).alias("_p"),
        )
        cur = cur.join(
            nxt,
            (cur["doc_id"] == nxt["_d"]) & (cur["p0"] == nxt["_p"]),
        ).drop("_d", "_p")
    return cur.groupBy("doc_id").agg(F.count("*").alias("n_hits"))
