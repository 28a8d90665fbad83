"""Takedown × component-ledger semantics (round 13, VERDICT r12 #8):
tombstone-until-compaction, relabel-at-compaction — plus the alias
auto-compaction trigger (VERDICT r12 #5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.component_ledger import (
    compact_component_ledger,
    component_alias_count,
    init_component_ledger,
    maybe_compact_component_ledger,
    merge_ledger_components,
    probe_components,
    read_component_labels,
    retract_component_nodes,
)


def _labels_df(spark, pairs):
    return spark.createDataFrame(pairs, "node long, component long")


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def _read(spark, path):
    return {
        r["node"]: r["component"]
        for r in read_component_labels(spark, path).collect()
    }


def test_retraction_tombstones_then_relabels(spark, tmp_path):
    """Retract a component's min-id label and a whole component: the
    retracted nodes vanish from reads and probes; survivors keep ONE
    consistent (tombstone) label; compaction with relabel_dangling
    restores label = min surviving member and clears nothing it
    shouldn't."""
    path = str(tmp_path / "ledger")
    init_component_ledger(
        _labels_df(
            spark,
            [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)],
        ),
        path,
        n_buckets=4,
    )
    removed = retract_component_nodes(
        spark, path, spark.createDataFrame([(1,), (20,)], "node long")
    )
    assert removed == 2
    got = _read(spark, path)
    assert 1 not in got and 20 not in got
    # tombstone: survivors of component 1 still share label 1
    assert got == {2: 1, 3: 1, 10: 10, 11: 10}
    probed = {
        r["node"]: r["component"]
        for r in probe_components(
            spark, path,
            spark.createDataFrame([(1,), (2,), (20,)], "node long"),
        ).collect()
    }
    assert probed == {2: 1}
    # plain compaction (no flag) keeps the tombstone
    compact_component_ledger(spark, path)
    assert _read(spark, path) == {2: 1, 3: 1, 10: 10, 11: 10}
    # relabel restores label = min surviving member
    compact_component_ledger(spark, path, relabel_dangling=True)
    assert _read(spark, path) == {2: 2, 3: 2, 10: 10, 11: 10}
    assert component_alias_count(spark, path) == 0


def test_merge_after_retraction_and_relabel(spark, tmp_path):
    """The relabeled ledger merges like any other: new edges union the
    surviving components under the min surviving id."""
    path = str(tmp_path / "ledger")
    init_component_ledger(
        _labels_df(spark, [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]),
        path,
        n_buckets=4,
    )
    retract_component_nodes(
        spark, path, spark.createDataFrame([(1,)], "node long")
    )
    compact_component_ledger(spark, path, relabel_dangling=True)
    merge_ledger_components(
        spark, path, _edges_df(spark, [(3, 11), (30, 31)])
    )
    assert _read(spark, path) == {
        2: 2, 3: 2, 10: 2, 11: 2, 30: 30, 31: 30,
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_retraction_property_random_partitions(spark, tmp_path, seed):
    """Pseudo-property sweep: random partition + random retraction
    set. Invariants: (a) reads never show retracted nodes; (b) the
    partition of surviving nodes is UNCHANGED (same groups, whatever
    the label); (c) after relabel-compaction every group's label is
    its min surviving member."""
    import random

    rng = random.Random(seed)
    nodes = list(range(1, 41))
    # random parent forest with parent(n) <= n: every chain descends,
    # so each tree's root is its minimum member — the min-id label
    # convention by construction
    parent = {
        n: n
        if rng.random() < 0.3
        else rng.choice(nodes[: max(1, n // 4)])
        for n in nodes
    }
    parent[1] = 1

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    part = {n: find(n) for n in nodes}
    path = str(tmp_path / f"ledger{seed}")
    init_component_ledger(
        _labels_df(spark, sorted(part.items())), path, n_buckets=4
    )
    retired = set(rng.sample(nodes, 10))
    retract_component_nodes(
        spark, path,
        spark.createDataFrame([(n,) for n in retired], "node long"),
    )
    got = _read(spark, path)
    assert set(got) == set(nodes) - retired  # (a)
    groups = {}
    for n, c in got.items():
        groups.setdefault(c, set()).add(n)
    expected_groups = {}
    for n in set(nodes) - retired:
        expected_groups.setdefault(part[n], set()).add(n)
    assert sorted(groups.values(), key=min) == sorted(
        expected_groups.values(), key=min
    )  # (b)
    compact_component_ledger(spark, path, relabel_dangling=True)
    got2 = _read(spark, path)
    groups2 = {}
    for n, c in got2.items():
        groups2.setdefault(c, set()).add(n)
    assert all(c == min(g) for c, g in groups2.items())  # (c)
    assert sorted(groups2.values(), key=min) == sorted(
        expected_groups.values(), key=min
    )


def test_alias_auto_compaction_trigger(spark, tmp_path):
    """merge_ledger_components(max_aliases=N): a merge streak that
    retires components fires the compaction exactly when the alias
    table's debt crosses N, and the table stays bounded across the
    streak."""
    path = str(tmp_path / "ledger")
    init_component_ledger(
        _labels_df(spark, [(n, n) for n in range(1, 9)]),
        path,
        n_buckets=4,
    )
    max_alias_seen = 0
    fired = []
    # each merge retires one component: 2->1, 3->1, ... (7 merges)
    for hi in range(2, 9):
        res = merge_ledger_components(
            spark, path, _edges_df(spark, [(1, hi)]), max_aliases=2
        )
        fired.append(res["compacted"])
        max_alias_seen = max(
            max_alias_seen, component_alias_count(spark, path)
        )
    assert any(fired)  # the trigger fired at least once mid-streak
    assert max_alias_seen <= 2  # debt stays bounded by the threshold
    # values unaffected: everything merged under min id 1
    assert _read(spark, path) == {n: 1 for n in range(1, 9)}
    with pytest.raises(ValueError):
        maybe_compact_component_ledger(spark, path, 0)
