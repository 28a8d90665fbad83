"""Incremental connected components — merge NEW edges into persisted
labels without re-clustering the corpus (round 12).

`graph.connected_components` is the batch clusterer: O(log n)
large-star/small-star rounds over ALL edges. A production near-dup
pipeline doesn't have "all edges" — it has yesterday's (node,
component) labels and today's tranche of new candidate pairs (q128's
incremental matcher produces exactly that). Re-running batch CC over
the union costs the full corpus every day; the incremental merge
costs only the NEW edges plus one broadcast join over the label
ledger:

1. semi-prune the label ledger to the delta's endpoints (the endpoint
   set broadcasts — delta-bounded — so the prune is ONE ledger scan,
   no shuffle), then translate each new edge endpoint to its CURRENT
   component by broadcast-joining the PRUNED labels (nodes the ledger
   has never seen enter as their own component — the same singleton
   convention as batch CC);
2. run batch CC over the COMPONENT-level edge list — its size is
   bounded by the new-edge count, never the corpus;
3. broadcast the (old component -> merged component) mapping over the
   label ledger (components untouched by new edges map to
   themselves via the left-join coalesce) and append labels for the
   brand-new nodes.

Correctness invariant (pinned by tests and q200's full-recompute
oracle): because every label is the MIN node id of its component,
the merged label — the min over the merged components' ids — is the
min node id of the union component, i.e. EXACTLY what batch CC over
(old edges ∪ new edges) produces. Every frame that broadcasts
(endpoints, pruned labels, the mapping) is new-edge bounded, so the
merge is safe at any corpus size; the label ledger is only ever
SCANNED (once for the prune, once for the relabel), never shuffled —
round 13: the old endpoint translation joined the FULL label frame,
which with a non-broadcastable ledger planned two corpus-wide
sort-merge joins per merge (VERDICT r12 #2); the persisted twin
(`component_ledger.merge_ledger_components`) always had the pruned
shape via its bucket-pruned probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import connected_components, driver_union_find

__all__ = [
    "merge_components",
    "delta_component_mapping",
    "driver_union_find",
    "prune_labels_to_endpoints",
]

#: above this many component-level edges the merge falls back to the
#: distributed large-star/small-star CC; below it the comp graph is a
#: bounded driver envelope — the SAME bound the merge already relies
#: on to broadcast the resulting mapping — and a driver union-find
#: beats ~2s of iterative job scheduling per merge (round 12,
#: measured on q201's gate wall). Round 14: ONE ceiling, authored in
#: operators/graph.py next to the hybrid batch CC, re-exported here
#: for the existing callers.
from .graph import DRIVER_CC_MAX_EDGES  # noqa: E402


def delta_component_mapping(comp_edges: DataFrame) -> DataFrame:
    """(cu, cv) component-level edges -> (__old, __m) mapping rows for
    every id whose merged component differs (min id of the union, the
    batch-CC label convention). Hybrid execution: the comp graph is
    delta-bounded, so up to DRIVER_CC_MAX_EDGES it collects into a
    driver union-find (path-compressed, min-id canonical — the same
    bounded envelope that is about to be broadcast anyway); bigger
    deltas run the distributed star contraction. The driver branch
    collects through Arrow into two primitive int64 arrays (round-12
    ADVICE: `collect()`'s Row objects cost ~10x the payload — at the
    2M-edge ceiling that is several GB of Python heap vs ~32 MB of
    numpy). Round 14: the size gate rides the SAME collect
    (``limit(ceiling + 1)``) instead of a separate count job — the
    common small-delta path now costs ONE action (the round-13 shape
    checkpointed, counted, then collected: three); only the rare
    over-ceiling path pays the caller's translation chain twice
    (once for the aborted bounded collect, once checkpointing for the
    distributed CC — minutes-scale work where one extra pass is
    noise)."""
    spark = comp_edges.sparkSession
    dedup = comp_edges.filter(F.col("cu") != F.col("cv")).distinct()
    # Arrow path: two int64 columns, no Rows; bounded by the ceiling
    pdf = dedup.limit(DRIVER_CC_MAX_EDGES + 1).toPandas()
    if len(pdf) > DRIVER_CC_MAX_EDGES:
        edges = dedup.localCheckpoint(eager=True)
        # checkpointed: callers reference the mapping several times
        # (relabel join, fresh-node join, alias rewrite) and the
        # distributed branch must not re-run CC per reference
        return (
            connected_components(edges, "cu", "cv")
            .filter(F.col("node") != F.col("component"))
            .select(
                F.col("node").alias("__old"),
                F.col("component").alias("__m"),
            )
            .localCheckpoint(eager=True)
        )
    from ..functions.localframe import local_rows_df

    mapping = driver_union_find(
        zip(
            pdf["cu"].to_numpy().tolist(), pdf["cv"].to_numpy().tolist()
        )
    )
    return local_rows_df(
        spark, sorted(mapping.items()), "__old long, __m long"
    )


def prune_labels_to_endpoints(
    labels: DataFrame, endpoints: DataFrame, node_col: str = "node"
) -> DataFrame:
    """The label rows for a delta's endpoint nodes — one ledger scan
    with the (delta-bounded) endpoint set broadcast as a left-semi
    build side, so the corpus-sized label frame is never shuffled or
    broadcast (the broadcast-TRANCHE rule every ledger probe here
    follows). Exposed so plan-shape tests can pin the direction."""
    return labels.join(
        F.broadcast(endpoints.select(node_col)), node_col, "left_semi"
    )


def merge_components(
    labels: DataFrame,
    new_edges: DataFrame,
    node_col: str = "node",
    comp_col: str = "component",
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """(node, component) labels + new undirected edges -> updated
    labels, equal to batch CC over the union edge set. Nodes known
    only to ``new_edges`` get labels; existing nodes keep theirs
    unless a new edge merges their component. ``labels`` is scanned
    exactly twice (endpoint prune, final relabel), both times against
    a broadcast delta-bounded build side — never shuffled."""
    endpoints = (
        new_edges.select(F.col(src).alias(node_col))
        .union(new_edges.select(F.col(dst).alias(node_col)))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # delta-bounded (<= 2|new_edges| rows), so the translation joins
    # below BROADCAST it instead of sort-merging the full ledger
    pruned = prune_labels_to_endpoints(
        labels, endpoints, node_col
    ).localCheckpoint(eager=True)
    lab_u = pruned.select(
        F.col(node_col).alias(src), F.col(comp_col).alias("__cu")
    )
    lab_v = pruned.select(
        F.col(node_col).alias(dst), F.col(comp_col).alias("__cv")
    )
    comp_edges = (
        new_edges.select(src, dst)
        .join(F.broadcast(lab_u), src, "left")
        .join(F.broadcast(lab_v), dst, "left")
        .select(
            F.coalesce("__cu", F.col(src)).alias("cu"),
            F.coalesce("__cv", F.col(dst)).alias("cv"),
        )
    )
    # components over component ids: bounded by the new-edge count
    # (hybrid driver/distributed — see delta_component_mapping).
    # Rows exist only for ids whose component CHANGED; the left-join
    # coalesces below treat absence as identity.
    mapping = delta_component_mapping(comp_edges)
    updated = (
        labels.join(
            F.broadcast(mapping),
            labels[comp_col] == F.col("__old"),
            "left",
        )
        .select(
            F.col(node_col),
            F.coalesce("__m", F.col(comp_col)).alias(comp_col),
        )
    )
    # the pruned frame holds exactly the KNOWN endpoints, so anti-
    # joining against it equals anti-joining the full ledger — with a
    # broadcastable right side (the old `endpoints anti labels` built
    # on the corpus and sort-merged it)
    new_nodes = endpoints.join(
        F.broadcast(pruned.select(node_col)), node_col, "left_anti"
    )
    fresh = new_nodes.join(
        F.broadcast(mapping),
        new_nodes[node_col] == F.col("__old"),
        "left",
    ).select(
        F.col(node_col),
        # a new node always appears in the mapping (its own id entered
        # the component graph); the coalesce is belt-and-braces for an
        # empty new_edges frame
        F.coalesce("__m", F.col(node_col)).alias(comp_col),
    )
    return updated.union(fresh)
