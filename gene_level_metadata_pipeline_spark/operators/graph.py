"""Graph operators for dedup clustering: connected components.

Near-dup PAIRS (MinHash/Jaccard output) are only half the dedup story —
the canonical-document step needs components: every document in a cluster
maps to one representative. Implemented as iterative min-label propagation
(the driver loop runs a Spark join+aggregate per iteration; iterations =
graph diameter, typically <6 for dup clusters). At billions of edges the
same loop is the standard large-star/small-star algorithm; AQE handles the
per-iteration skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "canonicalize_duplicates"]


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Component labels for every node appearing in ``pairs``.

    Returns (doc_id, component) where ``component`` is the MINIMUM node id
    in the connected component — deterministic, engine-independent.
    Each round combines neighbor-min propagation with pointer jumping
    (``label ← label[label]``), so convergence is O(log diameter) rounds,
    not O(diameter) — a 30-node path converges in ~6 rounds instead of 30.
    Converges when a round changes no label; raises if ``max_iter`` is hit
    first.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)
    # round 0 fused into init: label = min(self, direct neighbors) — one
    # agg over the edges instead of a full join round
    labels = (
        edges.groupBy(F.col("u").alias("node"))
        .agg(F.least(F.first("u"), F.min("v")).alias("label"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy(F.col("u").alias("n"))
            .agg(F.min("label").alias("nlabel"))
        )
        # carry the pre-round label through as __old: the convergence
        # check then needs no extra join against the previous frame
        stepped = (
            labels.join(neighbor_min, labels.node == F.col("n"), "left")
            .select(
                "node",
                F.col("label").alias("__old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
        )
        # pointer jumping: label <- label[label] (skip a level per round)
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        new_labels = (
            stepped.join(parent, stepped.label == parent.p_node, "left")
            .select(
                "node",
                "__old",
                F.least(
                    F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # checkpoint each round: truncates the exponentially-growing lineage
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.where(F.col("label") < F.col("__old")).limit(1).count()
        )
        labels = new_labels.drop("__old")
        if changed == 0:
            return labels.select(
                F.col("node").alias("doc_id"), F.col("label").alias("component")
            )
    raise RuntimeError(
        f"connected_components: no convergence in {max_iter} iterations"
    )


def canonicalize_duplicates(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Map every document to its canonical representative: component
    minimum for clustered docs, itself otherwise. The final dedup step —
    ``docs.where(col(id) == col('canonical_id'))`` keeps one row per
    cluster."""
    comp = connected_components(pairs)
    return docs.join(
        comp, docs[id_col] == comp.doc_id, "left"
    ).select(
        docs[id_col],
        F.coalesce(F.col("component"), docs[id_col]).alias("canonical_id"),
    )
