"""Product quantization (operators/pq.py) — encode/ADC semantics and
plan shape. Cross-engine exactness is pinned by q147's DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_integration_openfoodfacts_spark.operators.pq import (
    head_codebook,
    pq_adc_topk,
    pq_encode,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _vec(seed: int, dim: int = 64):
    rng = np.random.RandomState(seed)
    return [float(x) for x in rng.randn(dim).astype(np.float32)]


def test_exact_duplicate_of_query_ranks_first(spark):
    """A vector identical to the query encodes to the per-subspace
    argmin codes, achieving the global ADC minimum -> always rank 1."""
    rows = [(i, _vec(i)) for i in range(40)]
    rows.append((999, _vec(0)))  # exact duplicate of vec 0
    emb = _emb(spark, rows)
    cb = head_codebook(emb, ksub=16)
    top = pq_adc_topk(emb, cb, query_vec_id=0, k=5).collect()
    assert top[0]["vec_id"] == 999
    # minimal possible ADC: every other candidate is >= it
    assert all(r["adc_micros"] >= top[0]["adc_micros"] for r in top)


def test_codes_in_range_and_m_per_vector(spark):
    emb = _emb(spark, [(i, _vec(i)) for i in range(30)])
    cb = head_codebook(emb, ksub=16)
    for r in pq_encode(emb, cb, m=8).collect():
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_encode_matches_numpy_reference(spark):
    """Brute-force numpy argmin per subspace == the UDF's codes."""
    rows = [(i, _vec(100 + i)) for i in range(20)]
    emb = _emb(spark, rows)
    cb = head_codebook(emb, ksub=8)
    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    for vid, vec in rows:
        v = np.array(vec, dtype=np.float64)
        want = []
        for s in range(8):
            sub = v[s * 8:(s + 1) * 8]
            d = ((cb[:, s * 8:(s + 1) * 8] - sub[None, :]) ** 2).sum(axis=1)
            want.append(int(np.argmin(d)))
        assert got[vid] == want, vid


def test_layout_independent(spark):
    emb = _emb(spark, [(i, _vec(i)) for i in range(60)])
    cb = head_codebook(emb, ksub=16)
    a = [tuple(r) for r in pq_adc_topk(emb, cb, 0, k=10).collect()]
    b = [
        tuple(r)
        for r in pq_adc_topk(emb.repartition(7), cb, 0, k=10).collect()
    ]
    assert a == b


def test_plan_narrow_encode_takeordered_topk(spark):
    emb = _emb(spark, [(i, _vec(i)) for i in range(20)])
    cb = head_codebook(emb, ksub=8)
    enc_plan = (
        pq_encode(emb, cb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in enc_plan  # encode is pure narrow
    top_plan = (
        pq_adc_topk(emb, cb, 0, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in top_plan
    assert "Exchange" not in top_plan  # no global sort either


def test_bad_query_id_raises(spark):
    emb = _emb(spark, [(1, _vec(1))])
    cb = head_codebook(emb, ksub=1)
    try:
        pq_adc_topk(emb, cb, query_vec_id=77)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
