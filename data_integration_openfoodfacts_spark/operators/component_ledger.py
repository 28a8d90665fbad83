"""Persisted component ledger — incremental near-dup clustering at
the storage layer (round 12; the union-find idea, storage edition).

`graph_incremental.merge_components` updates an in-memory label
frame. A 100 TB corpus persists its labels, and the naive persisted
merge has no good layout: bucketing by NODE prunes lookups but a
merge relabels members scattered across every bucket; bucketing by
COMPONENT prunes the rewrite but node lookups full-scan. The ledger
here keeps BOTH cheap by never rewriting members on merge:

- ``path/store`` — (node, component) rows, hive-bucketed by the NODE
  (``nb = md5_long(node) % B``, the shared `bucketed_ledger`
  mechanics): probes prune to touched buckets, appends are
  one-file-per-bucket. Append-only: a row's stored component is the
  component AT INSERT TIME.
- ``path/alias`` — a small (old, new) component-alias table, the
  union-find parent forest kept CANONICAL (every append re-resolves
  existing targets through the new mapping, so chains never form and
  reads resolve with ONE broadcast join). Its size is bounded by the
  merges since the last compaction, never by the corpus.
- reads/probes resolve: ``coalesce(alias.new, stored component)``.
- `compact_component_ledger` amortizes: rewrite the store with
  aliases applied (atomic staged swap), then clear the alias table —
  a stale alias over a compacted store maps values that no longer
  occur, so a crash between the two steps is harmless.

Merge crash contract (at-least-once, like every store here): new
nodes append first (anti-joined against the store, so replays never
duplicate), aliases land last; a replay of a half-applied delta
re-derives the same mapping from the half-applied state and
converges — pinned by the replay test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .graph_incremental import delta_component_mapping

__all__ = [
    "init_component_ledger",
    "merge_ledger_components",
    "read_component_labels",
    "probe_components",
    "compact_component_ledger",
]

NB_COL = "nb"
DEFAULT_BUCKETS = 64
_ALIAS_SCHEMA = "old long, new long"


def _nb_of_col(node: Column, n_buckets: int) -> Column:
    return F.pmod(
        F.conv(
            F.substring(F.md5(node.cast("string")), 1, 15), 16, 10
        ).cast("long"),
        F.lit(n_buckets),
    )


def _store(path: str) -> str:
    return f"{path.rstrip('/')}/store"


def _alias(path: str) -> str:
    return f"{path.rstrip('/')}/alias"


def _read_alias(spark: SparkSession, path: str) -> DataFrame:
    from ..functions.localframe import local_rows_df
    from ..streaming.events_stream import read_parquet_if_exists

    df = read_parquet_if_exists(spark, _alias(path))
    if df is None:
        return local_rows_df(spark, [], _ALIAS_SCHEMA)
    return df.select("old", "new")


def _resolve(labels: DataFrame, alias: DataFrame) -> DataFrame:
    out = labels.join(
        F.broadcast(alias), labels["component"] == alias["old"], "left"
    )
    return out.select(
        *[c for c in labels.columns if c != "component"],
        F.coalesce("new", "component").alias("component"),
    )


def init_component_ledger(
    labels: DataFrame,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    node_col: str = "node",
    comp_col: str = "component",
) -> None:
    """Seed the store from (node, component) labels (e.g. a batch CC
    run). Single-writer, append semantics — call once per node set."""
    from .bucketed_ledger import append_bucketed

    rows = labels.select(
        F.col(node_col).alias("node"), F.col(comp_col).alias("component")
    )
    append_bucketed(
        rows, _store(path), NB_COL,
        lambda n: _nb_of_col(F.col("node"), n), n_buckets,
        columns=["node", "component"],
    )


def read_component_labels(spark: SparkSession, path: str) -> DataFrame:
    """Every (node, component) with aliases resolved."""
    store = spark.read.parquet(_store(path)).select("node", "component")
    return _resolve(store, _read_alias(spark, path))


def probe_components(
    spark: SparkSession, path: str, nodes: DataFrame,
    node_col: str = "node",
) -> DataFrame:
    """(node, component) for the probe nodes — bucket-pruned scan,
    broadcast-TRANCHE semi direction (the store is never shuffled or
    broadcast), aliases resolved. Unknown nodes are ABSENT from the
    result (a node the ledger never saw has no component yet)."""
    from .bucketed_ledger import (
        prune_to_buckets,
        store_n_buckets,
        touched_buckets,
    )

    keys = nodes.select(F.col(node_col).alias("node")).distinct()
    nb = store_n_buckets(spark, _store(path), NB_COL, DEFAULT_BUCKETS)
    nbs = touched_buckets(
        keys, lambda n: _nb_of_col(F.col("node"), n), nb
    )
    store = prune_to_buckets(
        spark.read.parquet(_store(path)), NB_COL, nbs
    ).select("node", "component")
    hit = store.join(F.broadcast(keys), "node", "left_semi")
    return _resolve(hit, _read_alias(spark, path))


def merge_ledger_components(
    spark: SparkSession,
    path: str,
    new_edges: DataFrame,
    src: str = "u",
    dst: str = "v",
) -> dict:
    """Fold a delta of undirected edges into the ledger at DELTA cost:
    endpoint labels come from a bucket-pruned probe, batch CC runs
    over the component-level edge list (bounded by the delta), brand-
    new nodes append under their merged component, and retired
    components land in the alias table (kept canonical). Returns
    {new_nodes, new_aliases} for the caller's run ledger."""
    from .bucketed_ledger import append_bucketed, store_n_buckets
    from ..streaming.events_stream import overwrite_parquet_atomically

    edges = (
        new_edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v")
        )
        .localCheckpoint(eager=True)
    )
    endpoints = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    known = probe_components(spark, path, endpoints).localCheckpoint(
        eager=True
    )
    labels = endpoints.join(known, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )
    lab_u = labels.select(
        F.col("node").alias("u"), F.col("component").alias("__cu")
    )
    lab_v = labels.select(
        F.col("node").alias("v"), F.col("component").alias("__cv")
    )
    comp_edges = (
        edges.join(lab_u, "u").join(lab_v, "v").select(
            F.col("__cu").alias("cu"), F.col("__cv").alias("cv")
        )
    )
    mapping = delta_component_mapping(comp_edges).select(
        F.col("__old").alias("old"), F.col("__m").alias("new")
    )

    # 1) brand-new nodes append FIRST (replay-safe: the anti-join
    # below is empty on a re-run)
    fresh = endpoints.join(
        known.select("node"), "node", "left_anti"
    ).localCheckpoint(eager=True)
    n_fresh = fresh.count()
    if n_fresh:
        fresh_labels = (
            fresh.join(
                F.broadcast(mapping),
                fresh["node"] == F.col("old"),
                "left",
            )
            .select(
                "node",
                F.coalesce("new", F.col("node")).alias("component"),
            )
        )
        nb = store_n_buckets(
            spark, _store(path), NB_COL, DEFAULT_BUCKETS
        )
        append_bucketed(
            fresh_labels, _store(path), NB_COL,
            lambda n: _nb_of_col(F.col("node"), n), nb,
            columns=["node", "component"],
        )

    # 2) aliases for RETIRED existing components, table kept canonical
    retired = mapping.join(
        F.broadcast(fresh.select(F.col("node").alias("old"))),
        "old", "left_anti",
    )
    n_new_aliases = retired.count()
    if n_new_aliases:
        old_alias = _read_alias(spark, path)
        rewritten = (
            old_alias.join(
                F.broadcast(
                    retired.select(
                        F.col("old").alias("__ro"),
                        F.col("new").alias("__rn"),
                    )
                ),
                old_alias["new"] == F.col("__ro"),
                "left",
            )
            .select("old", F.coalesce("__rn", "new").alias("new"))
        )
        merged_alias = rewritten.unionByName(
            retired.select("old", "new")
        ).localCheckpoint(eager=True)
        overwrite_parquet_atomically(
            merged_alias.coalesce(1), _alias(path)
        )
    return {"new_nodes": n_fresh, "new_aliases": n_new_aliases}


def compact_component_ledger(
    spark: SparkSession, path: str
) -> None:
    """Apply the alias table into the store (atomic staged rewrite,
    one file per bucket) and clear it. A crash between the two steps
    leaves aliases whose sources no longer occur in the store —
    harmless no-ops the next compaction clears."""
    from .bucketed_ledger import compact_bucketed, store_n_buckets
    from ..functions.localframe import local_rows_df
    from ..streaming.events_stream import overwrite_parquet_atomically

    alias = _read_alias(spark, path).localCheckpoint(eager=True)
    if alias.count() == 0:
        return
    nb = store_n_buckets(spark, _store(path), NB_COL, DEFAULT_BUCKETS)
    compact_bucketed(
        spark, _store(path), NB_COL,
        lambda n: _nb_of_col(F.col("node"), n), nb,
        columns=["node", "component"],
        transform=lambda rows: _resolve(rows, alias).localCheckpoint(
            eager=True
        ),
    )
    overwrite_parquet_atomically(
        local_rows_df(spark, [], _ALIAS_SCHEMA).coalesce(1),
        _alias(path),
    )
