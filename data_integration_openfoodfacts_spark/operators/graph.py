"""Connected components over an edge list — the operator that turns
pairwise near-duplicate MATCHES (MinHash/Jaccard/cosine pairs) into
duplicate CLUSTERS, so a training-data pipeline can keep one canonical
document per component.

Algorithm: alternating large-star / small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014) — the
scale formulation for graphs whose diameter is unknown:

- **large-star**: every node connects its LARGER neighbours to the
  minimum of its neighbourhood (including itself);
- **small-star**: every node connects its smaller-or-equal neighbours
  to that minimum;
- alternating the two converges to a star forest centred on each
  component's minimum id in **O(log n) rounds** in practice
  (O(log² n) worst case) — unlike min-label propagation, which needs
  O(diameter) rounds and dies on long chains (a 10k-link near-dup
  chain is 10k rounds of shuffles vs ~14 here);
- each round is a fixed set of hash shuffles keyed on node id. The
  per-round constant is higher than min-label propagation's (two star
  steps vs one join), which shows on toy graphs where driver/stage
  overhead dominates — the price of never being hostage to an unknown
  diameter, which is the failure mode that matters at 100 TB;
- ``localCheckpoint`` after each round cuts the exponentially growing
  lineage (the classic iterative-Spark trap);
- the driver-side loop reads one scalar per round (the count of edges
  that changed), never data rows.

Round-10 A/B (rejected): fusing TWO (large,small) pairs per
materialization/convergence-check — halving the per-round job count —
measured ~2x SLOWER (baseline 4.5-5.7s vs fused 8.9-12.3s over 3 runs
on a 5k-node chain+random graph, identical labels): the deeper
unmaterialized plan per job (4 groupBy+join stages under AQE's
plan-then-replan) costs more than the one saved count job, and the
gate queries converge in ~2 pairs anyway so there is almost no
round-scheduling wall to reclaim. One checkpoint + one count per
(large,small) pair stays the design.

Deterministic by construction: the final label of every node is the
minimum node id in its component, independent of iteration order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: above this many DISTINCT edges the star contraction runs; below it
#: the graph is a bounded driver envelope and a path-compressed
#: union-find replaces ~3 jobs x O(log n) rounds of iterative
#: scheduling with ONE bounded collect (round 14 — the
#: `delta_component_mapping` hybrid, round 12, applied to batch CC:
#: the lifecycle queries' in-query CC seeds ran 15-25 driver-serial
#: jobs each at probe scale). 2M (u,v) longs ≈ 32 MB through Arrow —
#: the same ceiling the incremental merge already collects under.
DRIVER_CC_MAX_EDGES = 2_000_000


def driver_union_find(pairs) -> dict[int, int]:
    """Path-compressed min-id union-find over an iterable of (a, b)
    int pairs -> ``{id: merged_component}`` for every id whose merged
    component differs from itself (the batch-CC min-id label
    convention). The bounded driver envelope shared by the hybrid
    `connected_components`, `graph_incremental.delta_component_mapping`
    and the persisted component ledger's merge."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        if a == b:
            continue
        a, b = find(a), find(b)
        if a != b:
            parent[max(a, b)] = min(a, b)
    return {x: find(x) for x in list(parent) if find(x) != x}


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) edge set -> large-star step: for each node u, connect all
    strictly larger neighbours to min(N(u) ∪ {u}).

    No ``distinct`` here: the small-star step that always follows ends
    in one, and its group-by tolerates duplicate edges — one fewer
    shuffle per round."""
    bidir = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = bidir.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        bidir.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """(u,v) edge set -> small-star step: orient each edge (max,min),
    then for each node u connect its (all smaller) neighbours and
    itself to the minimum of the neighbourhood."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    relinked = (
        directed.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    selfed = mins.select("u", F.col("m").alias("v"))
    return relinked.union(selfed).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """Label every node appearing in ``edges`` (undirected) with the min
    node id of its component. Returns (node, component).

    Hybrid execution (round 14): up to ``driver_max_edges`` distinct
    non-self edges, the graph collects through Arrow into a
    path-compressed min-id union-find — the same bounded envelope (and
    ceiling) `graph_incremental.delta_component_mapping` has collected
    under since round 12 — and the labels for edge-touching nodes come
    back as one local frame; only nodes NEVER seen in a non-self edge
    stay distributed (the isolated-node self-label anti-join, which is
    corpus-sized and never collected). Bigger graphs run the star
    contraction below unchanged; pass ``driver_max_edges=0`` to force
    it (the convergence tests do). Labels are identical by
    construction: both paths emit the min node id of each component.

    ``max_iter`` bounds the large-star/small-star rounds; convergence
    takes ~log₂(n) rounds, so the default 30 covers any graph that fits
    on hardware that exists. Raises ``RuntimeError`` if the edge set is
    still changing after ``max_iter`` rounds — returning unconverged
    labels would silently split true components into multiple
    "canonical" survivors downstream.
    """
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    # Materialize the INPUT edge list once: both the working edge set
    # and the node set derive from it, and the upstream chain is
    # typically the expensive part (e.g. q42's shingle self-join) —
    # two eager checkpoints of separate derivations would run it twice.
    raw = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=True)
    dedup = raw.filter(F.col("u") != F.col("v")).distinct()
    if driver_max_edges and driver_max_edges > 0:
        pdf = dedup.limit(driver_max_edges + 1).toPandas()
        if len(pdf) <= driver_max_edges:
            from ..functions.localframe import local_rows_df

            pairs = list(
                zip(
                    pdf["u"].to_numpy().tolist(),
                    pdf["v"].to_numpy().tolist(),
                )
            )
            mapping = driver_union_find(pairs)
            edge_nodes = sorted({n for p in pairs for n in p})
            labels = local_rows_df(
                edges.sparkSession,
                [
                    (int(n), int(mapping.get(n, n)))
                    for n in edge_nodes
                ],
                "node long, component long",
            )
            # isolated nodes (only self-loop inputs) label themselves;
            # the anti-join build side is the bounded edge-node set,
            # the corpus-sized node frame is never collected
            lonely = (
                raw.select(F.col("u").alias("node"))
                .union(raw.select(F.col("v").alias("node")))
                .distinct()
                .join(
                    F.broadcast(labels.select("node")),
                    "node",
                    "left_anti",
                )
                .select("node", F.col("node").alias("component"))
            )
            return labels.union(lonely)
    e = dedup.localCheckpoint(eager=False)
    # Size the working set's partitioning to the MEASURED edge count
    # (one count on the checkpoint — also its materializing action).
    # Star contraction only shrinks the edge set, so the entry count is
    # an upper bound for every round. ~2M edges (≈32 MB of (u,v) longs)
    # per partition; coalesce is NARROW — a no-op at cluster scale where
    # the set already needs every partition, and at test scale it stops
    # each round's scans from paying 32 near-empty tasks.
    n_edges = e.count()
    parts = max(1, min(e.rdd.getNumPartitions(), -(-n_edges // 2_000_000)))
    if parts < e.rdd.getNumPartitions():
        e = e.coalesce(parts)
    # nodes of the original graph (star contraction drops interior
    # nodes from the edge set as they become leaves pointing at the
    # root, so the final labels must re-attach over the original set)
    nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # lazy checkpoint: the convergence-check count below is the
        # action that materializes it — one job per round, not two.
        # coalesce keeps the contracted (only-shrinking) set at the
        # entry-sized partition count instead of the global shuffle
        # width — no-op when parts == shuffle partitions.
        new_e = (
            _small_star(_large_star(e))
            .coalesce(parts)
            .localCheckpoint(eager=False)
        )
        # set equality in ONE job: tag old +1 / new -1, group, count
        # groups that do not cancel (both sides are distinct sets)
        changed = (
            e.select("u", "v", F.lit(1).alias("t"))
            .union(new_e.select("u", "v", F.lit(-1).alias("t")))
            .groupBy("u", "v")
            .agg(F.sum("t").alias("t"))
            .filter(F.col("t") != 0)
            .count()
        )
        e = new_e
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "large-star/small-star rounds; the edge set is still "
            "contracting — raise max_iter"
        )
    # converged: e is a star forest of (child, root) edges, child>root
    child_labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    root_labels = e.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    labels = child_labels.union(root_labels)
    # isolated nodes (only self-loop inputs) label themselves
    lonely = nodes.join(labels, "node", "left_anti").select(
        "node", F.col("node").alias("component")
    )
    return labels.union(lonely)


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list — the
    density signal behind community/spam detection on near-duplicate
    graphs (a clique of templated docs shows up as a triangle-heavy
    component long before CC merges it).

    Scale formulation: orient every edge low-id -> high-id, then count
    each triangle exactly once as u<v<w via TWO hash equi-joins
    (e1(u,v) ⋈ e2(v,w) ⋈ e3(u,w)) — the standard MapReduce triangle
    enumeration. No node ever sees more than its oriented adjacency;
    skew on high-degree hubs is capped because orientation assigns each
    edge to its lower-id endpoint (a hub's triangles split across its
    lower neighbours). Returns (node, n_triangles) for every node in
    the edge set (0 for triangle-free nodes).
    """
    # Materialize the oriented edge set ONCE: e is referenced three
    # times by the triangle joins and twice by the node union — without
    # the checkpoint the (typically expensive) upstream pair-generation
    # chain re-executes per reference.
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e12 = e.select(F.col("u").alias("a"), F.col("v").alias("b")).join(
        e.select(F.col("u").alias("b"), F.col("v").alias("c")), "b"
    )
    tri = e12.join(
        e.select(F.col("u").alias("a"), F.col("v").alias("c")), ["a", "c"]
    )
    per_node = (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    return nodes.join(per_node, "node", "left").select(
        "node",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Multi-source BFS: shortest hop-distance (<= max_hops) from any
    seed node over a DIRECTED edge list. Returns (node, dist) with one
    row per reachable node, dist = 0 for the seeds themselves.

    Frontier iteration, the Pregel pattern in DataFrame form: each hop
    joins the current frontier with the edge list (hash shuffle on the
    edge key — broadcast when the frontier is small enough for AQE to
    demote), then anti-joins against the visited set so a node's FIRST
    discovery fixes its distance (first discovery == fewest hops, which
    is why no min() re-aggregation is needed). ``localCheckpoint``
    per hop cuts the growing lineage, the iterative-Spark trap; the
    driver reads one scalar per hop (frontier size) to stop early on an
    exhausted frontier, never data rows.

    Deterministic: hop-k frontier membership is a set equation over
    (edges, previous frontiers) — no ordering or partitioning effects.
    Matches a recursive-CTE `UNION ... WHERE dist < max_hops` +
    `GROUP BY node: MIN(dist)` oracle.
    """
    visited = (
        seeds.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges[src])
            .select(F.col(dst).alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return visited


def pagerank_fixed_point(
    edges: DataFrame,
    n_iters: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
    broadcast_ranks: bool = True,
) -> DataFrame:
    """PageRank with ALL-INTEGER arithmetic: ranks live in fixed-point
    micros (scale=1e6), per-edge contributions are ``rank DIV
    out_degree`` and the update is ``(100-damping)% * scale + damping% *
    sum DIV 100`` — every engine computes bit-identical ranks, unlike
    float PageRank where cross-engine summation order drifts (same
    fixed-point portability trick as the bigram LM scores, q78).

    Returns (node, rank_micros) after ``n_iters`` synchronous
    iterations from a uniform ``scale`` start. Nodes are the distinct
    edge endpoints; dangling nodes (no out-edges) keep redistributing
    nothing — acceptable for the symmetric graphs this engine builds
    (co-order, near-dup), where none exist.

    Scale shape, two plans behind ``broadcast_ranks``:

    - ``True`` (default): the rank table — O(distinct nodes), tiny
      next to O(edges) for the dense co-order/near-dup graphs this
      engine builds — is explicitly BROADCAST into the checkpointed
      edge table, so each iteration never shuffles the edge list: one
      narrow scan + one groupBy(dst) of map-side-combined
      contributions. The explicit hint skips AQE's plan-then-replan
      shuffle stages (measured 4.4s -> 3.0s for 3 iterations at
      sf0.1 on the 2.4M-edge co-order graph).
    - ``False``: the shuffle plan for graphs whose rank table exceeds
      the broadcast budget (billions of nodes): per iteration one
      rank|x|edges hash join on src + one groupBy-sum on dst — the
      Pregel cost model; AQE still demotes to broadcast at runtime
      when ranks turn out small.

    ``localCheckpoint`` per iteration cuts the lineage either way.
    """
    out_deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    # Attach the degree to each edge ONCE — every iteration re-reads
    # this; leaving the join inside the loop re-ran it 3x (measured
    # 10.7s -> 4.4s at sf0.1 on the 2.4M-edge co-order graph). Each
    # iteration then costs one narrow scan + broadcast join over the
    # checkpointed edges plus ONE exchange: the map-side-combined
    # groupBy(dst) of contributions, which moves only the partial
    # aggregates (O(distinct dst)), not the edge list. A dst
    # pre-partition before the checkpoint does NOT remove that
    # exchange — localCheckpoint scans back as an ExistingRDD with no
    # output-partitioning metadata, so Catalyst re-inserts
    # ENSURE_REQUIREMENTS regardless (probed round 10); the 5.3s ->
    # 3.3s win at sf0.1 came from the broadcast hint skipping AQE's
    # plan-then-replan shuffle stages.
    edges_deg = (
        edges.join(out_deg, F.col(src) == F.col("node"))
        .select(F.col(src), F.col(dst), F.col("out_deg"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    base = int(scale * (100 - damping_pct) / 100)
    ranks = nodes.withColumn("rank_micros", F.lit(scale).cast("long"))
    for _ in range(n_iters):
        rank_side = ranks.withColumnRenamed("node", "r_node")
        if broadcast_ranks:
            rank_side = F.broadcast(rank_side)
        contrib = (
            edges_deg.join(rank_side, F.col("r_node") == F.col(src))
            .select(
                F.col(dst).alias("node"),
                # explicit floor, not cast: Spark's double->long cast
                # truncates but DuckDB's CAST rounds — FLOOR is the one
                # portable spelling of integer division here
                F.floor(F.col("rank_micros") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        if broadcast_ranks:
            contrib = F.broadcast(contrib)
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.floor(
                        F.lit(damping_pct)
                        * F.coalesce(F.col("in_sum"), F.lit(0))
                        / 100
                    )
                ).alias("rank_micros"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
