"""Iterative graph primitives for dedup pipelines.

Connected components turns near-duplicate PAIRS into dedup GROUPS (keep one
representative per component) — the step after MinHash/Jaccard candidate
generation in a training-data pipeline. Label propagation to the minimum
neighbor label; converges in O(diameter) rounds, and near-dup graphs are
overwhelmingly tiny star/clique components, so a handful of rounds
suffices. Each round is one equi-join + one aggregate (both key-partitioned
shuffles); the only driver-side value per round is the scalar
changed-count that decides convergence — no data ever collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Undirected connected components by min-label propagation.

    Input: an edge list (any orientation, duplicates fine).
    Output: one row per node — (node, component) with component = the
    minimum node id reachable from it (a canonical, deterministic label).

    Iterates until no label changes; raises RuntimeError if `max_iter`
    rounds don't converge (min-label moves one hop per round, so max_iter
    bounds the component diameter — a silent early exit would split long
    near-dup chains into multiple cluster ids). Lineage is truncated with
    an eager localCheckpoint every `checkpoint_every` rounds so the plan
    doesn't grow one join deeper per round (planning time and stack depth
    at 100 TB).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    prev_cached: DataFrame | None = None
    for i in range(1, max_iter + 1):
        # each node adopts min(own label, neighbors' labels)
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
                (F.col("nmin") < F.col("component")).alias("__changed"),
            )
        )
        new_labels = new_labels.cache()
        # the only driver-side value per round: does any label still move?
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = new_labels
        if i % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=True)
            prev_cached.unpersist()
            prev_cached = None
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(component diameter exceeds max_iter); raise max_iter"
    )
