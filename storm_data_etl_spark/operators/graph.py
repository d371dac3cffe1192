"""Iterative graph algorithms as DataFrame loops.

Complements operators.dedup's connected components (used for near-dup
cluster assignment) with PageRank-style power iteration — the standard
"importance" propagation over entity graphs a curation pipeline derives
from its corpus (document link graphs, supplier/customer interaction
graphs, author networks).

Scale shape per iteration: one shuffle joining ranks to edges on `src`
(both sides partitioned on the key — co-partitioning is reused across
iterations by AQE) plus one shuffle for the contribution aggregate on
`dst`. The plan is unrolled for a fixed iteration count; for deep
iteration counts checkpoint/localCheckpoint every ~5 rounds to truncate
lineage — same guidance as dedup.connected_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list (`src`, `dst`).

    Classic formulation (Spark's own example semantics): every node starts
    at rank 1.0; each round a node sends rank/outdegree along its out-edges
    and ranks become ``(1 - damping) + damping * incoming``. Nodes without
    in-edges settle at ``1 - damping``; dangling nodes (no out-edges)
    simply don't contribute. Returns (node, rank).
    """
    edges = edges.select("src", "dst")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_outdeg"))
    e = edges.join(deg, "src")
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("_outdeg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_contrib"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("_contrib"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks
