"""Drift profile (`operators/drift.py`): exact counts and smoothed
shares vs a pure-Python reference, all-bands-present guarantee, the
reader-side PSI (identical vs stable distributions = 0, shifted > 0),
and the banded-count plan claim."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.drift import (
    drift_profile,
    psi_from_profile,
)

B = 5


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x long")


def _band():
    return F.least(F.lit(B - 1), F.col("x"))


def _ref_profile(ref_vals, cur_vals):
    nr = [0] * B
    nc = [0] * B
    for v in ref_vals:
        nr[min(v, B - 1)] += 1
    for v in cur_vals:
        nc[min(v, B - 1)] += 1
    tr, tc = sum(nr), sum(nc)
    return {
        b: (
            nr[b], nc[b],
            (nr[b] + 1) / (tr + B),
            (nc[b] + 1) / (tc + B),
        )
        for b in range(B)
    }


def test_profile_matches_reference_and_fills_empty_bands(spark):
    ref_vals = [0, 0, 1, 2, 2, 2, 9]  # band 3 empty, 9 clamps to 4
    cur_vals = [1, 1, 1, 4, 4]        # bands 0,2,3 empty
    prof = drift_profile(
        _df(spark, ref_vals), _df(spark, cur_vals), _band(), B
    ).collect()
    assert len(prof) == B  # every band present, even doubly-empty ones
    got = {
        r["band"]: (r["n_ref"], r["n_cur"], r["p_ref"], r["p_cur"])
        for r in prof
    }
    assert got == _ref_profile(ref_vals, cur_vals)
    for r in prof:
        assert r["gap"] == r["p_ref"] - r["p_cur"]


def test_psi_zero_on_identical_positive_on_shift(spark):
    same = [0, 1, 1, 2, 3, 4, 4]
    prof_same = drift_profile(
        _df(spark, same), _df(spark, same), _band(), B
    ).collect()
    assert psi_from_profile(prof_same) == pytest.approx(0.0, abs=1e-12)

    shifted = [4, 4, 4, 4, 3, 4, 4]
    prof_shift = drift_profile(
        _df(spark, same), _df(spark, shifted), _band(), B
    ).collect()
    psi = psi_from_profile(prof_shift)
    assert psi > 0.25  # a gross shift lands in the investigate tier
    # reference PSI from the same smoothed shares
    ref = _ref_profile(same, shifted)
    want = sum(
        (p - q) * math.log(p / q) for _, _, p, q in ref.values()
    )
    assert psi == pytest.approx(want, rel=1e-12)


def test_argument_validation(spark):
    with pytest.raises(ValueError, match="n_bands"):
        drift_profile(_df(spark, [1]), _df(spark, [1]), _band(), 1)
