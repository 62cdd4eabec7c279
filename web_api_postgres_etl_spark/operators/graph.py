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

from ..caching import release_frame
from .project import qcol


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_id: str = "id",
    edge_src: str = "id_a",
    edge_dst: str = "id_b",
    max_iter: int = 25,
    pins: list[DataFrame] | None = None,
) -> DataFrame:
    """(id, component) — min reachable node id per node.

    ``nodes``: one row per node id (isolated nodes become singleton
    components). ``edges``: undirected pairs (any orientation).
    Deterministic: the component id is the minimum node id reachable,
    independent of partitioning or iteration order.

    Raises RuntimeError if labels are still changing after ``max_iter``
    productive rounds (graph diameter > max_iter) — silently returning
    unconverged labels would split long-chain components and let a dedup
    pipeline keep extra "canonical" survivors. One extra quiet round is
    allowed so a graph of diameter exactly ``max_iter`` converges (the
    check can only observe stability one round late). Label propagation
    needs O(diameter) rounds; for long chains use
    ``connected_components_fast`` (pointer doubling, O(log n)).
    """
    # persist the symmetrized edge list: every propagation round joins
    # against it, and ``edges`` is often a LAZY near-dup pipeline —
    # without pinning, each round re-runs that entire upstream plan
    # (measured: the end-to-end curation plan spent minutes re-deriving
    # LSH pairs per round before this persist)
    sym = (
        edges.select(qcol(edge_src).alias("src"), qcol(edge_dst).alias("dst"))
        .union(edges.select(qcol(edge_dst).alias("src"), qcol(edge_src).alias("dst")))
        .distinct()
        .persist()
    )
    labels = nodes.select(
        qcol(node_id).alias("id"), qcol(node_id).alias("component")
    )
    changed = 1
    prev_ckpt = None
    # max_iter productive rounds + 1 quiet confirmation round
    for _ in range(max_iter + 1):
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
        # checkpoint FIRST (flat lineage), then test convergence against
        # the checkpointed frame — one execution per round, not two
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
            .filter(F.col("n.component") < F.col("o.component"))
            .limit(1)
            .count()
        )
        # the previous round's checkpoint has no remaining consumer —
        # release it NOW, or a d-round graph pins d label tables at
        # once (a real cost when the label table is billions of rows)
        if prev_ckpt is not None:
            release_frame(prev_ckpt)
        prev_ckpt = new_labels
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    # the final checkpoint IS the result — the caller's pins list (if
    # given) takes ownership of releasing it after materialization
    if pins is not None and prev_ckpt is not None:
        pins.append(prev_ckpt)
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations (graph diameter exceeds max_iter); raise "
            "max_iter or use connected_components_fast"
        )
    return labels


def connected_components_fast(
    nodes: DataFrame,
    edges: DataFrame,
    node_id: str = "id",
    edge_src: str = "id_a",
    edge_dst: str = "id_b",
    max_iter: int = 12,
    pins: list[DataFrame] | None = None,
) -> DataFrame:
    """(id, component) via pointer doubling — O(log n) rounds.

    Same deterministic result as ``connected_components`` (min reachable
    node id), but each round follows the label chain one extra hop
    (L(v) ← min over neighbors' labels, then L(v) ← L(L(v))), so a
    chain of length d resolves in ~log2(d) rounds instead of d. This is
    the billion-edge form the plain propagation loop documents: 12
    rounds cover components of diameter ~4000; the default suits any
    real near-dup graph (clique-ish, diameter ≤ a few dozen).

    Per round: one neighbor-offer join + one pointer-jump join — both
    equi-joins on (node, label) pairs, payloads never shuffled; the
    frontier is localCheckpointed so lineage stays flat. One extra
    quiet round is allowed so convergence on the final productive round
    is still recognized.
    """
    # pinned for the same reason as the plain-propagation loop: every
    # doubling round probes the edge list, which may be a lazy upstream
    # pipeline (LSH candidate generation) if not materialized here
    sym = (
        edges.select(qcol(edge_src).alias("src"), qcol(edge_dst).alias("dst"))
        .union(edges.select(qcol(edge_dst).alias("src"), qcol(edge_src).alias("dst")))
        .distinct()
        .persist()
    )
    labels = nodes.select(
        qcol(node_id).alias("id"), qcol(node_id).alias("component")
    )
    changed = 1
    prev_ckpt = None
    for _ in range(max_iter + 1):
        offers = sym.join(labels, sym["src"] == labels["id"]).select(
            F.col("dst").alias("id"), F.col("component")
        )
        merged = (
            labels.unionByName(offers)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump: component ← component's own component
        parent = merged.select(
            F.col("id").alias("p_id"), F.col("component").alias("p_comp")
        )
        jumped = (
            merged.join(parent, merged["component"] == parent["p_id"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("p_comp", F.col("component"))
                ).alias("component"),
            )
        )
        # checkpoint FIRST, then test convergence against the
        # checkpointed frame — one execution per round, not two
        jumped = jumped.localCheckpoint(eager=True)
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
            .filter(F.col("n.component") < F.col("o.component"))
            .limit(1)
            .count()
        )
        # release the superseded round's checkpoint (see the plain
        # propagation loop) — at most two label tables pinned at once
        if prev_ckpt is not None:
            release_frame(prev_ckpt)
        prev_ckpt = jumped
        labels = jumped
        if changed == 0:
            break
    sym.unpersist()
    # the final checkpoint IS the result — the caller's pins list (if
    # given) takes ownership of releasing it after materialization
    if pins is not None and prev_ckpt is not None:
        pins.append(prev_ckpt)
    if changed != 0:
        raise RuntimeError(
            f"connected_components_fast did not converge in {max_iter} "
            "doubling rounds (component diameter > ~2^max_iter)"
        )
    return labels


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pins: list[DataFrame] | None = None,
) -> DataFrame:
    """(id, cluster, is_canonical) — resolve near-dup pairs into
    clusters; the minimum id in each component is the canonical
    survivor (the row a dedup pipeline keeps). Uses the pointer-doubling
    components (same deterministic labels, O(log n) rounds)."""
    nodes = df.select(qcol(id_col).alias("id"))
    comp = connected_components_fast(nodes, pairs, pins=pins)
    return comp.select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )
