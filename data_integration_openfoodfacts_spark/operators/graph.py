"""Connected components over an edge list — the operator that turns
pairwise near-duplicate MATCHES (MinHash/Jaccard/cosine pairs) into
duplicate CLUSTERS, so a training-data pipeline can keep one canonical
document per component.

Algorithm: iterative min-label propagation (each node repeatedly adopts
the smallest label among itself and its neighbours) — the standard
large-graph formulation (cf. Hash-to-Min / GraphFrames' algorithm):

- one hash-join + hash-aggregate per round, all shuffles on node id;
- converges in O(diameter) rounds; near-dup graphs are unions of small
  cliques, so 2-3 rounds in practice;
- ``localCheckpoint`` after each round cuts the exponentially growing
  lineage (the classic iterative-Spark trap);
- the driver-side loop only reads a CHANGED COUNT per round (scalar),
  never data rows.

Deterministic by construction: the final label of every node is the
minimum node id in its component, independent of iteration order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node appearing in ``edges`` (undirected) with the min
    node id of its component. Returns (node, component).

    Raises ``RuntimeError`` if labels are still changing after
    ``max_iter`` rounds — returning the unconverged labels would
    silently split true components into multiple "canonical" survivors
    downstream. Note the loop needs one extra zero-change round to
    CONFIRM convergence, so set ``max_iter >= diameter + 1`` (a graph
    of diameter exactly ``max_iter`` finishes its labels on the last
    round but still raises, conservatively, because the confirmation
    round never ran); raise it for long-chain graphs.
    """
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        neighbour_labels = sym.join(
            labels, sym["d"] == labels["node"]
        ).select(F.col("s").alias("node"), "component")
        new_labels = (
            labels.union(neighbour_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); increase max_iter beyond "
            "the graph diameter"
        )
    return labels
