"""SemDeDup k∝n centroid policy (round 12, VERDICT r11 #5)."""

from __future__ import annotations

import pytest

from data_integration_openfoodfacts_spark.operators.similarity import (
    SEMDEDUP_TARGET_CLUSTER,
    semdedup_k,
)


def test_k_grows_linearly_with_corpus():
    c = SEMDEDUP_TARGET_CLUSTER
    assert semdedup_k(10 * c) == 10
    assert semdedup_k(100 * c) == 100
    # expected cluster size is CONSTANT -> within-cluster pair count
    # (n/k clusters of size c -> n*(c-1)/2) grows linearly, unlike the
    # sqrt policy's n^1.5
    assert semdedup_k(1000 * c) / semdedup_k(100 * c) == 10.0


def test_k_floor_and_validation():
    assert semdedup_k(1) == 2
    assert semdedup_k(SEMDEDUP_TARGET_CLUSTER - 1) == 2
    with pytest.raises(ValueError):
        semdedup_k(0)


def test_base_corpus_matches_sqrt_policy():
    """The target cluster size is chosen so both policies coincide at
    the 2000-vector base corpus (sqrt(2000) ~ 44 ~ 2000/45): the k∝n
    gate query q198 diverges from q77/q75's frozen-k world only as
    the corpus grows."""
    import math

    n = 2000
    assert abs(semdedup_k(n) - round(math.sqrt(n))) <= 1
