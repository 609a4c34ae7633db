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
    collect_max_edges: int = 2_000_000,
) -> DataFrame:
    """(node, cluster_id) for every node in ``edges``; cluster_id is the
    smallest node id in the component. Edges are undirected.

    Hybrid execution, same spirit as a broadcast-join threshold: the
    near-dup ACTIVE SET (docs that collide at all) is usually orders of
    magnitude smaller than the corpus, and below ``collect_max_edges``
    (2M edges ≈ 32 MB — well under any driver heap) a single bounded
    collect + driver union-find replaces 3-5 multi-stage label-propagation
    jobs whose cost is pure scheduling overhead at that size (measured
    3.7 s → <0.3 s on q58's 1.1k-edge graph at sf0.1). Above the bound —
    the genuine 100 TB path — the distributed loop below runs unchanged.
    Both paths reach the same unique fixpoint (component minimum), so the
    switch is invisible to results."""
    # NULL endpoints carry no connectivity and must not reach the driver
    # path: one NULL in toPandas() downgrades a bigint id column to
    # float64, corrupting ids >= 2^53 and injecting NaN union-find keys
    # (ADVICE r4). Dropped here so BOTH paths see the same clean graph.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b")).where(
                F.col(dst).isNotNull() & F.col(src).isNotNull()
            )
        )
        .distinct()
    )
    # Materialize the edge list ONCE — every iteration references it, and
    # without a checkpoint the (possibly expensive) upstream candidate
    # generation would re-execute per job. The count that materializes it
    # also sizes the iteration shuffles: CC runs on the near-dup ACTIVE SET,
    # typically orders of magnitude smaller than the corpus, so the
    # corpus-sized shuffle width wastes per-task overhead (measured 2× on
    # the q58 bench). Width scales with edge count and never exceeds the
    # session's configured width.
    sym = sym.localCheckpoint(eager=False)
    n_edges = sym.count()
    if n_edges <= collect_max_edges:
        return _driver_union_find(sym)
    spark = edges.sparkSession
    session_width = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    width = max(1, min(session_width, -(-n_edges // 250_000)))
    old_width = spark.conf.get("spark.sql.shuffle.partitions")
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        return _propagate(sym, labels, max_iter)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_width)


def _driver_union_find(sym: DataFrame) -> DataFrame:
    """Small-graph path: bounded collect of the (already materialized)
    edge list, classic union-find with path compression, labels relabeled
    to the component MINIMUM — the same unique fixpoint the distributed
    loop converges to, independent of union order."""
    import pandas as pd

    pdf = sym.toPandas()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    # .tolist() → native Python scalars (int/str), so node ids of any
    # orderable type work (runner's near-dup CC keys on string hash_key)
    for a, b in zip(pdf["a"].tolist(), pdf["b"].tolist()):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    root_min: dict = {}
    for n in parent:
        r = find(n)
        m = root_min.get(r)
        if m is None or n < m:
            root_min[r] = n
    nodes = sorted(parent)
    out = pd.DataFrame(
        {"node": nodes, "cluster_id": [root_min[find(n)] for n in nodes]}
    )
    spark = sym.sparkSession
    node_t = sym.schema["a"].dataType.simpleString()
    return spark.createDataFrame(out, schema=f"node {node_t}, cluster_id {node_t}")


def _propagate(sym: DataFrame, labels: DataFrame, max_iter: int) -> DataFrame:
    changed = -1  # "never ran": max_iter <= 0 falls straight to the for-else
    for _ in range(max_iter):
        # min label among each node's neighbors
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        # carry the previous label through so the convergence flag is a
        # plain column — no extra join against the old frame
        propagated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
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
                (
                    F.least(
                        F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))
                    )
                    != F.col("old_label")
                ).alias("changed"),
            )
        )
        # LAZY localCheckpoint (truncates the growing lineage — the classic
        # iterative-plan blow-up; checkpoint() to HDFS at cluster scale):
        # the convergence count below is the action that materializes it,
        # so each iteration runs exactly ONE job instead of
        # checkpoint-then-recount's two.
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.where("changed").count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    else:
        # Exhausting the budget means the returned labels are NOT the
        # component fixpoint — failing loudly beats silently under-merged
        # clusters. Propagation + pointer jumping converges in
        # O(log diameter) rounds, so the default budget (20) covers any
        # graph of diameter < ~2^20; hitting this is a pathology worth a
        # raised max_iter only after understanding the input.
        raise RuntimeError(
            f"connected_components: min-label propagation still changing "
            f"after max_iter={max_iter} rounds ({changed} labels moved on "
            f"the last round); labels have not reached the component "
            f"fixpoint"
        )
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))
