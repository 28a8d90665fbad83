"""Corpus-size-aware MinHash band layout (round 12, VERDICT r11 #3).

The fixed (8 hashes, band_size 2) layout's random-pair candidates grew
12x at 10x docs (SCALING_LLM.json). `logscaled_minhash_layout` grows
rows-per-band logarithmically with corpus growth — each extra row
multiplies a random pair's band-collision probability by its (low)
expected shingle-overlap rate — and re-sizes the band count so the
analytic recall at the design threshold never drops below the target.
These tests pin the layout math and that the autoscaled pair matcher
is exactly `minhash_lsh_pairs` at the derived layout.
"""

from __future__ import annotations

import math

import pytest

from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
    logscaled_minhash_layout,
    minhash_lsh_pairs,
    minhash_lsh_pairs_autoscaled,
)


def _recall(num_hashes: int, band_size: int, s: float) -> float:
    b = num_hashes // band_size
    return 1.0 - (1.0 - s**band_size) ** b


def test_base_corpus_keeps_the_q19_layout():
    # at (or below) the design corpus the layout IS the gate layout —
    # the autoscaled path changes nothing where q19's oracle lives
    assert logscaled_minhash_layout(5_000) == (8, 2)
    assert logscaled_minhash_layout(500) == (8, 2)


def test_rows_per_band_grow_with_log_corpus():
    nh1, bs1 = logscaled_minhash_layout(5_000)
    nh10, bs10 = logscaled_minhash_layout(50_000)
    nh100, bs100 = logscaled_minhash_layout(500_000)
    assert bs1 < bs10 < bs100
    # one extra row per decade of growth
    assert bs10 == bs1 + 1 and bs100 == bs1 + 2
    # hash budget grows, but logarithmically (not with n)
    assert nh1 <= nh10 <= nh100 <= 40


def test_recall_at_design_threshold_never_drops():
    base_nh, base_bs = logscaled_minhash_layout(5_000)
    base_recall = _recall(base_nh, base_bs, 0.8)
    for n in [5_000, 50_000, 500_000, 5_000_000]:
        nh, bs = logscaled_minhash_layout(n)
        assert nh % bs == 0
        assert _recall(nh, bs, 0.8) >= min(0.95, base_recall) - 1e-9


def test_random_collision_probability_decays_per_decade():
    """The point of the layout: a random pair's per-band collision
    probability (s0^band_size at low overlap s0) must SHRINK as the
    corpus grows, so expected random candidates ~ b * n^2 * s0^r stay
    ~linear instead of quadratic."""
    s0 = 0.05
    prev = None
    for n in [5_000, 50_000, 500_000]:
        nh, bs = logscaled_minhash_layout(n)
        p_band = (nh // bs) * s0**bs
        if prev is not None:
            # each decade divides per-pair collision mass by >= ~1/s0
            # (up to the band-count growth), far more than the 10x
            # growth in n it has to offset within n^2
            assert p_band <= prev * 10 * s0 * 1.5
        prev = p_band


def test_autoscaled_pairs_equal_manual_layout(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "completely different text about spark and parquet files"),
        (4, "completely different text about spark and parquet files"),
        (5, "unrelated fifth document mentioning nothing shared here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    auto = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs_autoscaled(
            docs, "doc_id", "text", n=3
        ).collect()
    }
    nh, bs = logscaled_minhash_layout(5)
    manual = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=nh, band_size=bs
        ).collect()
    }
    assert auto == manual
    assert (3, 4) in auto  # exact duplicates always collide


def test_layout_rejects_nonpositive_corpus():
    with pytest.raises(ValueError):
        logscaled_minhash_layout(0)
