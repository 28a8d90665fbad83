"""Multi-long signature packing for hyperplane LSH
(operators/similarity.py::_packed_signbits_multi_udf + the >64-bit
branch of hyperplane_lsh_candidates) — enables the band-bits ~ log n
tuning rule (SCALING_LLM.json) without sacrificing num_bands/recall.

The expected candidate set is re-derived IN THE TEST from first
principles (numpy sign-random-projection over the same md5 planes),
so the check is independent of the operator's packing/joining code."""

from __future__ import annotations

import numpy as np

from data_integration_openfoodfacts_spark.operators.similarity import (
    hyperplane_lsh_candidates,
    rademacher_hyperplanes,
)
from data_integration_openfoodfacts_spark.sources.parquet_source import (
    load_table,
)
from tests.conftest import SF_DIR


def _expected_pairs(emb_rows, rows_per_band: int, num_bands: int):
    """First-principles candidate set: same planes, same left-to-right
    fold, bucket by (band, tuple-of-bits), all pairs within buckets."""
    ids = [r["vec_id"] for r in emb_rows]
    A = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                  for r in emb_rows])
    P = np.asarray(
        rademacher_hyperplanes(rows_per_band * num_bands, A.shape[1]),
        dtype=np.float64,
    )
    prod = A[:, None, :] * P[None, :, :]
    dots = np.cumsum(prod, axis=2)[:, :, -1]
    bits = dots >= 0  # (n, planes)
    pairs = set()
    for b in range(num_bands):
        sigs = {}
        for i, vid in enumerate(ids):
            key = tuple(
                bits[i, b * rows_per_band:(b + 1) * rows_per_band]
            )
            sigs.setdefault(key, []).append(vid)
        for members in sigs.values():
            ms = sorted(members)
            for x in range(len(ms)):
                for y in range(x + 1, len(ms)):
                    pairs.add((ms[x], ms[y]))
    return pairs


def _got_pairs(spark, rows_per_band: int, num_bands: int):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = hyperplane_lsh_candidates(
        emb, dim=64, rows_per_band=rows_per_band, num_bands=num_bands
    ).collect()
    got = [(r["id_a"], r["id_b"]) for r in out]
    assert len(got) == len(set(got)), "duplicate pairs emitted"
    assert all(a < b for a, b in got)
    return set(got)


def test_single_long_path_matches_first_principles(spark):
    emb_rows = load_table(spark, SF_DIR, "embeddings").collect()
    assert _got_pairs(spark, 8, 8) == _expected_pairs(emb_rows, 8, 8)


def test_multi_long_path_matches_first_principles(spark):
    # 12-bit bands x 9 bands = 108 planes -> 2 longs, second one
    # PARTIALLY filled (bands_per_long=5: bands 0-4 in long 0, 5-8 in
    # long 1) — exercises band-aligned layout + partial fill
    emb_rows = load_table(spark, SF_DIR, "embeddings").collect()
    assert _got_pairs(spark, 12, 9) == _expected_pairs(emb_rows, 12, 9)


def test_multi_long_recall_supersets_fewer_bands(spark):
    """The point of >64-bit packing: at log-scaled band bits, MORE
    bands = strictly more recall. Same 12-bit bands, 5 bands (fits one
    long) vs 9 bands (needs two): the 9-band candidate set must
    contain every 5-band pair (first 5 bands are a prefix of the same
    plane sequence)."""
    assert _got_pairs(spark, 12, 9) >= _got_pairs(spark, 12, 5)
