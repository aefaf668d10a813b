"""Graph operators (engine extension: LLM-data-pipeline clustering).

The near-dup operators (dedup.py) emit PAIRS; turning pairs into
dedup decisions needs the transitive closure — documents A~B and B~C
belong to one cluster even when A~C is below threshold. That closure is
connected components, implemented here as iterative min-label
propagation over DataFrames (the standard BSP formulation; no GraphX
dependency, no RDDs).

Scale notes: each iteration is one shuffle (edge-label join + min
groupBy); rounds needed = graph diameter, and near-dup graphs are
shallow (dup clusters are cliques-ish, diameter ~2-4). Lineage is cut
per round with localCheckpoint — without it the plan doubles each
iteration and Catalyst analysis dominates. The reference has no graph
surface; this is greenfield per SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Undirected connected components over an edge list.

    Returns (node, component) with component = min node id reachable.
    Converges in O(diameter) rounds; raises if max_iter is hit without
    convergence (pathological chains — raise max_iter for those).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = sym.join(
            labels.withColumnRenamed("node", "a"), "a"
        ).select(F.col("b").alias("node"), "component")
        new_labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")


def component_sizes(labels: DataFrame) -> DataFrame:
    """Attach cluster_size to a (node, component) labeling."""
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return labels.join(F.broadcast(sizes), "component").select(
        "node", "component", "cluster_size"
    )
