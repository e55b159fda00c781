"""Round-boundary checkpointing for iterative DataFrame loops.

Every fixpoint loop in this engine (semi-naive rules, BFS frontiers,
k-core peeling, Bellman-Ford relaxation, label propagation, PageRank,
path-doubling closures) ends each round with an eager localCheckpoint
so the NEXT round plans over an O(1)-depth leaf. Round 5 measurement:
that discipline is necessary but NOT sufficient on Spark 4.x, because
``Dataset.localCheckpoint`` wraps the checkpointed rows in a
``LogicalRDD`` that carries ORIGIN metadata (the stats/constraints
machinery of the plan it replaced). When checkpoint generations chain
— round k's leaf is built from round k-1's leaf through a join — that
origin metadata COMPOUNDS across generations even though every plan
tree stays constant-sized, and the logical optimizer's walk over it
turns exponential in the round count:

    22-round chain-closure fixpoint, 60 input rows, local[8]
      round 17:  0.7s        round 21:  39s
      round 19:  7.3s        round 22: 125s
      round 20: 13s          round 23: 328s   (~2.5x per round)

Plan node count stayed linear (162 nodes at round 21); the time was
all in ``QueryExecution.optimizedPlan`` (and, with AQE, re-paid at
runtime per query stage). Disabling constraint propagation and the
runtime bloom-filter rule changed nothing; collapsing the union depth
(rebasing the accumulated delta set to one leaf per round) changed
nothing — the growth rides in the checkpointed leaf itself, not in
the visible plan.

:func:`loop_ckpt` is the fix: the PUBLIC ``localCheckpoint(eager=True)``
first (it copies UnsafeRows before persisting — skipping that copy and
checkpointing ``queryExecution.toRdd()`` directly returns ALIASED row
buffers and silently corrupt results; measured: 38 rows where the true
fixpoint has 15), then the materialized rows are re-wrapped in a fresh
metadata-free ``LogicalRDD`` via the session's
``internalCreateDataFrame``, cutting the origin chain every
generation. Same 22-round fixpoint: every round 0.3-0.6s, flat, exact
same result set. The rewrap drops the leaf's static size estimate, so
the STATIC planner will not auto-broadcast it — AQE re-decides from
true runtime sizes (on in this engine's sessions, session.py), and
explicit ``F.broadcast`` hints are unaffected.

``internalCreateDataFrame`` is ``private[sql]`` (py4j can call it; a
Spark upgrade could move it), so the rewrap is guarded: on any
reflection failure the plain checkpointed frame is returned and the
loop stays correct, merely slower past ~20 generations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def loop_ckpt(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint for per-round loop state, with the
    checkpointed rows re-wrapped metadata-free so checkpoint
    generations cannot compound (see module docstring)."""
    ck = df.localCheckpoint(eager=True)
    try:
        jdf = ck._jdf
        jrdd = jdf.queryExecution().toRdd()
        jclean = df.sparkSession._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        return DataFrame(jclean, df.sparkSession)
    except Exception:
        # private-API drift: fall back to the plain checkpoint —
        # correct, just exponential-prone past ~20 chained generations
        return ck
