"""Connected components — near-dup candidate pairs → dedup clusters.

The missing last mile of a dedup pipeline: MinHash/SimHash emit PAIRS
(q29/q31); deduplication needs CLUSTERS (every doc transitively linked to
a canonical representative). This is union-find, expressed Spark-first as
iterative minimum-label propagation (the standard large-graph CC used by
GraphFrames/GraphX, built here on plain DataFrames):

    label(v) ← v
    repeat: label(v) ← min(label(v), min over neighbors u of label(u))
    until no label changes

Each iteration is one join + one aggregation on the edge list — both
shuffles keyed on node id, skew-safe under AQE. Convergence needs at
most the component diameter iterations (near-dup clusters are shallow:
a handful). The convergence check is a scalar count (A5-style high-
watermark pattern) — no driver materialization of data.

Determinism: the fixpoint is unique (component minimum), so results are
partition- and iteration-order-independent — oracle-checkable against a
DuckDB recursive-CTE transitive closure (q58).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, cluster_id) for every node in ``edges``; cluster_id is the
    smallest node id in the component. Edges are undirected."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(max_iter):
        # min label among each node's neighbors
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        propagated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # pointer jumping (path halving): label(v) ← label(label(v)).
        # Neighbor propagation alone needs diameter iterations; composing
        # it with one hop up the label tree converges logarithmically —
        # the standard two-phase trick of scalable CC algorithms.
        parents = propagated.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        new_labels = (
            propagated.join(
                parents, propagated.label == parents.p_node, "left"
            )
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # localCheckpoint FIRST (truncates the growing lineage — the
        # classic iterative-plan blow-up; checkpoint() to HDFS at cluster
        # scale), then run the fixpoint check against the materialized
        # frame so each iteration evaluates the propagation exactly once
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))
