"""Skyline (Pareto-frontier) query over a DataFrame.

The classic multi-criteria OLAP operator (Borzsony, Kossmann &
Stocker, ICDE 2001, "The Skyline Operator"): keep every row not
DOMINATED by another — d dominates r when d is at-least-as-good on
every criterion (<= on minimized columns, >= on maximized ones) and
strictly better on at least one. The engine uses it as the
multi-objective curation cut (e.g. keep documents on the
quality-vs-length frontier) and as the ER audit's trade-off view
(confidence vs corroboration).

Distributed shape — the standard two-phase divide-and-conquer from
the parallel-skyline literature:

1. **Local prune** (mapInPandas, Arrow-batched): each partition batch
   computes its own skyline. Dominance is transitive, so any globally
   dominated row is also dominated within SOME superset — pruning
   locally can only remove rows that the global phase would remove,
   never a true skyline row. The batch-local algorithm sorts rows
   lexicographically on the minimized criteria (a dominator always
   sorts at-or-before its victim) and streams them through a growing
   candidate frontier with vectorized numpy comparisons — O(n*s) for
   batch size n and frontier size s, not O(n^2).
2. **Global merge**: the surviving candidates (typically orders of
   magnitude smaller than the input — bounded by the true skyline
   size times the partition count) are self-anti-joined under the
   dominance predicate with the dominator side broadcast: a
   BroadcastNestedLoopJoin over a SMALL set, never over the input.

Equal criteria vectors do not dominate each other (the strictness
clause), so duplicate-on-all-criteria rows are kept or dropped as a
group — standard skyline semantics, restated by the oracle's
NOT EXISTS with a strict disjunct.

Exactness contract: criteria are compared as float64 in the local
phase — exact for integers up to 2^53 and for short decimals (the
TPC-H 2-dp prices); the global phase compares the ORIGINAL Spark
column types, so a float64 tie that is not a true tie can only leave
an extra candidate for the global phase to resolve, never lose a
skyline row (the local keep-side is conservative on ties).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _batch_skyline(
    pdf: pd.DataFrame, minimize: Sequence[str], maximize: Sequence[str]
) -> pd.DataFrame:
    """Skyline of one in-memory batch: lexicographic sweep with a
    vectorized frontier. Rows with NaN in any criterion are dropped
    (NULL criteria are excluded from skyline semantics, as in the
    oracle's implicit NULL != NULL comparisons)."""
    cols = list(minimize) + list(maximize)
    m = np.empty((len(pdf), len(cols)), dtype=np.float64)
    for j, c in enumerate(minimize):
        m[:, j] = pdf[c].to_numpy(dtype=np.float64, copy=False)
    off = len(minimize)
    for j, c in enumerate(maximize):
        m[:, off + j] = -pdf[c].to_numpy(dtype=np.float64, copy=False)
    ok = ~np.isnan(m).any(axis=1)
    m = m[ok]
    idx = np.flatnonzero(ok)
    if len(m) == 0:
        return pdf.iloc[:0]
    # lexicographic ascending on the minimized matrix: any dominator
    # of row r sorts at-or-before r
    order = np.lexsort(tuple(m[:, j] for j in range(m.shape[1] - 1, -1, -1)))
    m = m[order]
    idx = idx[order]
    front = np.empty_like(m)
    n_front = 0
    keep: list[int] = []
    for i in range(len(m)):
        row = m[i]
        if n_front:
            f = front[:n_front]
            dominated = (
                (f <= row).all(axis=1) & (f < row).any(axis=1)
            ).any()
        else:
            dominated = False
        if not dominated:
            keep.append(idx[i])
            front[n_front] = row
            n_front += 1
    return pdf.iloc[sorted(keep)]


def skyline(
    df: DataFrame,
    minimize: Iterable[str] = (),
    maximize: Iterable[str] = (),
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier of the given criteria ->
    same schema as ``df``. At least one criterion required."""
    mins = list(minimize)
    maxs = list(maximize)
    cols = mins + maxs
    if not cols:
        raise ValueError("skyline needs at least one criterion column")

    schema = df.schema

    def _local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _batch_skyline(pdf, mins, maxs)

    cand = df.mapInPandas(_local, schema=schema)

    dom = F.broadcast(
        cand.select(*[F.col(c).alias(f"_d_{c}") for c in cols])
    )
    at_least: Column | None = None
    strictly: Column | None = None
    for c in mins:
        le = F.col(f"_d_{c}") <= F.col(c)
        lt = F.col(f"_d_{c}") < F.col(c)
        at_least = le if at_least is None else (at_least & le)
        strictly = lt if strictly is None else (strictly | lt)
    for c in maxs:
        ge = F.col(f"_d_{c}") >= F.col(c)
        gt = F.col(f"_d_{c}") > F.col(c)
        at_least = ge if at_least is None else (at_least & ge)
        strictly = gt if strictly is None else (strictly | gt)
    return cand.join(dom, at_least & strictly, "left_anti")
