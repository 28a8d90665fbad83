"""k-core decomposition — extracting the dense heart of a graph by
iterative peeling.

The k-core is the maximal subgraph in which every node keeps degree
>= k after everyone below k is (repeatedly) removed. On a near-dup
graph it separates TEMPLATED RINGS — clusters where every member is
similar to many others (SEO farms, boilerplate families, mirror
networks), which curation wants pruned as a family — from incidental
pairwise matches (degree 1-2 fringe), which deserve per-pair
treatment. Triangle counts (q82) score local density; the k-core is
the global fixpoint version: fringe removal can cascade, so a node's
survival depends on the whole peel, not its neighborhood.

Algorithm (distributed peel): repeat { degrees of the surviving
subgraph; drop nodes with degree < k } until no node drops. Each round
is two left-semi joins (edges restricted to survivors — the SMALL
survivor set is the broadcast side at typical peel shapes, but the
equi-join form is the safe default) and one groupBy(node) count —
bounded shuffles per round, nothing quadratic. Rounds are bounded by
the peel depth (worst case the graph's degeneracy ordering, in
practice a handful); each round localCheckpoints the survivor set to
truncate lineage (the connected_components discipline) and pays ONE
driver-side count for the convergence check — a single long per
round, the bounded-envelope convention.

Determinism: pure integer degree arithmetic on an exact edge set — any
engine reproduces (node, core_degree) bit-for-bit, which is what lets
the oracle unroll the peel in SQL (q172's Jacobi-unroll precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_core"]


def k_core(
    edges: DataFrame,
    src: str,
    dst: str,
    k: int,
    max_rounds: int = 30,
) -> tuple[DataFrame, int]:
    """(core, rounds): ``core`` is (node, core_degree) for every node
    of the k-core of the UNDIRECTED simple graph spanned by ``edges``
    (symmetrized and self-loop-stripped here — callers pass each pair
    once in either order); ``rounds`` is the number of peel iterations
    until fixpoint (raises if ``max_rounds`` wasn't enough — a result
    from an unconverged peel would silently overcount the core)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    # Materialize ONE direction first: ``edges`` is typically an
    # expensive lazy plan (a near-dup join), and symmetrizing a lazy
    # frame would evaluate that plan twice — once per union branch.
    one = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=True)
    sym = (
        one.union(one.select(F.col("v"), F.col("u")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("u").alias("n")).distinct()
    prev = nodes.count()
    for r in range(1, max_rounds + 1):
        deg = (
            sym.join(nodes.select(F.col("n").alias("u")), "u", "left_semi")
            .join(nodes.select(F.col("n").alias("v")), "v", "left_semi")
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("core_degree"))
        )
        survivors = deg.filter(F.col("core_degree") >= k)
        nodes = survivors.select(F.col("u").alias("n")).localCheckpoint(
            eager=True
        )
        cur = nodes.count()
        if cur == prev:
            return (
                survivors.select(
                    F.col("u").alias("node"),
                    F.col("core_degree").cast("long"),
                ),
                r,
            )
        prev = cur
    raise RuntimeError(
        f"k_core did not converge within {max_rounds} rounds "
        f"({prev} survivors at the cap)"
    )
