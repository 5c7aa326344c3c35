"""Stage F — connected-components canonicalization over a DataFrame edge list.

GraphFrames-style iterative min-label propagation (north_star requirement):
each node's label is the minimum label in its closed neighborhood; iterate to
fixpoint with per-iteration checkpointing (lineage would otherwise grow
exponentially — the classic iterative-DataFrame failure mode at scale).

For the entity-variant graphs this engine produces, components are tiny
(variant clusters), so convergence is 2-3 rounds; the implementation is
correct for arbitrary graphs and bounded by ``max_iter``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    check_every: int = 2,
) -> DataFrame:
    """(node, component) for every node in the edge list.

    ``component`` is the minimum node id (by natural ordering of the id
    type) in the node's connected component — for string mentions that makes
    the lexicographically-smallest variant the canonical representative.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for it in range(max_iter):
        # every node proposes its label to each neighbor; keep the minimum
        msgs = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), "label")
        )
        new_labels = (
            labels.select("node", "label")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        # the convergence check is an extra job per round — amortize it
        # (check_every=k trades ≤k-1 wasted cheap rounds for k× fewer checks)
        if (it + 1) % check_every == 0 or it == max_iter - 1:
            converged = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.label") != F.col("o.label"))
                .isEmpty()
            )
            labels = new_labels
            if converged:
                break
        else:
            labels = new_labels
    return labels.select("node", F.col("label").alias("component"))
