"""k-core peel (`operators/kcore.py`): fixpoint semantics with
cascades, core degrees, direction/self-loop normalization, and the
unconverged-peel refusal."""

from __future__ import annotations

import pytest

from data_integration_openfoodfacts_spark.operators.kcore import k_core


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def _core(spark, pairs, k, **kw):
    df, rounds = k_core(_edges(spark, pairs), "a", "b", k, **kw)
    return {r["node"]: r["core_degree"] for r in df.collect()}, rounds


def test_pendant_chain_peels_into_triangle(spark):
    """Triangle 1-2-3 with a chain 3-4-5 hanging off: the 2-core is
    exactly the triangle, and the chain's removal CASCADES (5 falls,
    then 4) — the fixpoint property a one-shot degree filter misses."""
    got, rounds = _core(
        spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], k=2
    )
    assert got == {1: 2, 2: 2, 3: 2}
    assert rounds >= 2  # the cascade takes more than one peel


def test_near_clique_collapses_entirely(spark):
    """K4 minus one edge has no 3-core: the two degree-2 nodes fall,
    leaving the rest under-degreed — everything peels away."""
    got, _ = _core(
        spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], k=3
    )
    assert got == {}


def test_direction_and_self_loops_normalized(spark):
    """Edges arrive in mixed directions with duplicates and a self
    loop; the simple undirected graph is what gets peeled."""
    got, _ = _core(
        spark,
        [(1, 2), (2, 1), (2, 3), (3, 1), (3, 3)],
        k=2,
    )
    assert got == {1: 2, 2: 2, 3: 2}


def test_whole_graph_already_core(spark):
    """A graph with min degree >= k converges in ONE round."""
    got, rounds = _core(spark, [(1, 2), (2, 3), (1, 3)], k=2)
    assert got == {1: 2, 2: 2, 3: 2} and rounds == 1


def test_unconverged_peel_refuses(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        k_core(
            _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]),
            "a", "b", k=2, max_rounds=1,
        )
    with pytest.raises(ValueError, match="k must be"):
        k_core(_edges(spark, [(1, 2)]), "a", "b", k=0)
