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
    max_iter: int = 15,
) -> DataFrame:
    """Undirected connected components by min-label propagation.

    Input: an edge list (any orientation, duplicates fine).
    Output: one row per node — (node, component) with component = the
    minimum node id reachable from it (a canonical, deterministic label).
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
    for _ in range(max_iter):
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
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    return labels
