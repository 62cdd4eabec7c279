"""Iterative graph operators — near-dup cluster resolution.

A training-data dedup pipeline doesn't stop at pairs: near-dup PAIRS
must become CLUSTERS (connected components), and each cluster keeps one
canonical representative. The reference has nothing iterative; this is
the engine's iterative-algorithm surface, built as a driver-side loop
of DataFrame joins (each iteration is a Spark job; the loop is bounded
and converges in O(diameter) iterations — near-dup graphs are
clique-ish, so typically 2-3).

Scale notes: each iteration shuffles (node, label) pairs — never
payloads. Label propagation with min-label converges deterministically
regardless of partitioning. For billion-edge graphs swap the loop body
for the large-star/small-star optimization (same join shapes); the
driver-side loop structure stays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .project import qcol


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_id: str = "id",
    edge_src: str = "id_a",
    edge_dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) — min reachable node id per node.

    ``nodes``: one row per node id (isolated nodes become singleton
    components). ``edges``: undirected pairs (any orientation).
    Deterministic: the component id is the minimum node id reachable,
    independent of partitioning or iteration order.

    Raises RuntimeError if labels are still changing after ``max_iter``
    rounds (graph diameter > max_iter) — silently returning unconverged
    labels would split long-chain components and let a dedup pipeline
    keep extra "canonical" survivors. Label propagation needs O(diameter)
    rounds; for billion-edge graphs with long chains switch to
    large-star/small-star (O(log n) rounds) before raising max_iter.
    """
    sym = (
        edges.select(qcol(edge_src).alias("src"), qcol(edge_dst).alias("dst"))
        .union(edges.select(qcol(edge_dst).alias("src"), qcol(edge_src).alias("dst")))
        .distinct()
    )
    labels = nodes.select(
        qcol(node_id).alias("id"), qcol(node_id).alias("component")
    )
    changed = 1
    for _ in range(max_iter):
        # labels each neighbor could offer, merged with current labels
        offers = (
            sym.join(labels, sym["src"] == labels["id"])
            .select(F.col("dst").alias("id"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(offers)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # convergence: did any node's label shrink this round?
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
            .filter(F.col("n.component") < F.col("o.component"))
            .limit(1)
            .count()
        )
        # cache the frontier so the next iteration doesn't replay the chain
        new_labels = new_labels.localCheckpoint(eager=True)
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations (graph diameter exceeds max_iter); raise "
            "max_iter or use a pointer-doubling variant"
        )
    return labels


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
) -> DataFrame:
    """(id, cluster, is_canonical) — resolve near-dup pairs into
    clusters; the minimum id in each component is the canonical
    survivor (the row a dedup pipeline keeps)."""
    nodes = df.select(qcol(id_col).alias("id"))
    comp = connected_components(nodes, pairs)
    return comp.select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )
