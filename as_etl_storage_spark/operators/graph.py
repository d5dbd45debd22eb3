"""Connected components — dedup-cluster assignment over a near-dup pair
graph (each doc -> minimum doc id reachable through duplicate pairs).

Iterative min-label propagation: per round, every vertex takes the minimum
of its own label and its neighbors' labels; converges in graph-diameter
rounds (near-dup clusters are tiny, so 2-4 rounds in practice; max_iter
bounds pathological chains). All arithmetic is integer min — deterministic
under any partitioning.

Scale notes: each round is one shuffle (join on dst + groupBy src).
``localCheckpoint`` truncates the growing lineage every round. At extreme
scale swap the propagation for the large-star/small-star algorithm
(alternating star contractions, O(log n) rounds); the driver-side loop
structure stays identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "doc_i", dst: str = "doc_j", max_iter: int = 20
) -> DataFrame:
    """Cluster assignment for every vertex appearing in ``edges``.
    Returns (doc_id, cluster_id) where cluster_id = min vertex id in the
    component.

    Min-label propagation moves a label ONE hop per round, so a
    component whose diameter exceeds ``max_iter`` has not converged when
    the loop ends — and an unconverged result is silently WRONG cluster
    ids (vertices of one component still carrying several labels), the
    worst failure mode for a dedup keep-one stage built on top. The loop
    therefore raises when it exits by iteration count with changes still
    in flight; near-dup clusters have tiny diameters in practice, and a
    corpus that genuinely trips this wants a larger ``max_iter`` or the
    large-star/small-star contraction noted in the module docstring.

    When the loop exits by count with the LAST round still changing, the
    labels may in fact be final (a component whose diameter equals
    ``max_iter`` converges exactly on the final round) — one extra
    propagation round verifies before raising, so a genuinely-converged
    result is never rejected."""
    if max_iter < 1:
        raise ValueError(
            f"max_iter must be >= 1 (got {max_iter}): zero rounds would "
            "return identity labels with convergence never observed"
        )
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select("u").distinct().select(F.col("u").alias("id"), F.col("u").alias("label"))
    )
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["id"])
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["u"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # the final allowed round changed labels — either unconverged, or
        # that round was the one that finished (diameter == max_iter) and
        # convergence is simply unobserved. One verification round tells
        # them apart: zero further changes means the labels ARE final.
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["id"])
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        still = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["u"], "left")
            .where(F.coalesce(F.col("nlabel"), F.col("label")) < F.col("label"))
            .count()
        )
        if still != 0:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds "
                f"({still} labels still changing): a component's diameter "
                f"exceeds max_iter and the labels are NOT final — raise "
                f"max_iter (propagation is one hop per round)"
            )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))
