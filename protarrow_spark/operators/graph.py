"""Graph operators: connected components for dedup clustering.

After candidate-pair generation (MinHash LSH, SimHash, embedding
LSH), a training-data pipeline must COLLAPSE pairs into duplicate
clusters and pick canonical representatives — that is connected
components over the pair graph.

Implementation: iterative min-label propagation with pointer jumping
(label <- label of label each round), the hashed-join formulation of
the classic O(log n)-round CC algorithms (cf. the large-star /
small-star MapReduce scheme). Every step is a plain equi-join +
groupBy min — shuffles on uniformly-hashed node ids, no broadcast of
anything graph-sized, so the plan survives graphs with billions of
edges as long as each round's join does. Rounds are driver-iterated
(this IS an iterative algorithm); each round localCheckpoints the
label frame to cut lineage growth.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    max_iter: int = 20,
) -> DataFrame:
    """Connected components of the undirected graph given by
    ``edges``: returns (node, component) where component is the
    MINIMUM node id in the node's component (the canonical-id
    convention every dedup pipeline uses).

    Converges when a full round changes no label; pointer jumping
    (path compression) keeps rounds O(log n) even on long chains.
    """
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # 1) neighbor minimum: l(x) <- min(l(x), min over neighbors l(y))
        nbr = (
            und.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        prop = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
        )
        # 2) pointer jumping: l(x) <- l(l(x))
        parent = prop.select(F.col("node").alias("label"), F.col("label").alias("label2"))
        jumped = (
            prop.join(parent, "label", "left")
            .select("node", F.coalesce("label2", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("component"))


def dedup_clusters(
    df: DataFrame,
    edges: DataFrame,
    id_col: str,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Cluster assignment for EVERY row of ``df``: nodes touching an
    edge get their component's minimum id, everything else is a
    singleton cluster of itself. Output: id, cluster_id."""
    comp = connected_components(edges, src_col, dst_col)
    return (
        df.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
    )
