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


def _clustered_vecs(n_clusters=6, per_cluster=20, dim=64):
    """Planted-neighbor fixture: tight clusters around well-separated
    centers; exact top-k of any member is its own cluster. Cluster 0
    is NOISELESS — its members are identical — so a head codebook
    (first ksub vectors = cluster 0) degenerates to one effective
    codeword: every candidate ties to code 0 per subspace and ADC
    carries zero information. The Lloyd fit's (md5(id), id) seeds
    spread across clusters instead."""
    rng = np.random.RandomState(7)
    centers = rng.randn(n_clusters, dim) * 5.0
    rows = []
    vid = 0
    for ci in range(n_clusters):
        for _ in range(per_cluster):
            noise = 0.0 if ci == 0 else 0.2
            v = centers[ci] + rng.randn(dim) * noise
            rows.append((vid, [float(x) for x in v.astype(np.float32)]))
            vid += 1
    return rows


def test_trained_codebook_beats_head_codebook_recall(spark):
    """Round-6 VERDICT #3 'done' criterion: ADC recall@k with the
    per-subspace Lloyd codebook improves on the head codebook against
    exact L2 top-k on the planted-cluster fixture."""
    from data_integration_openfoodfacts_spark.operators.pq import (
        subspace_lloyd_codebook,
    )

    # per_cluster=11 so the exact top-10 of any member is exactly the
    # REST OF ITS CLUSTER — recall measures cluster-level
    # separability, not noise-scale tie ordering (which PQ by design
    # collapses: same-cluster members share codes).  Query from
    # cluster 3: the head codebook is the first 8 vectors, all from
    # cluster 0, so every other cluster folds onto the same few codes.
    rows = _clustered_vecs(n_clusters=6, per_cluster=11)
    emb = _emb(spark, rows)
    X = np.array([v for _, v in rows], dtype=np.float64)
    qid, k = 33, 10
    exact = set(
        np.argsort(((X - X[qid]) ** 2).sum(axis=1))[1 : k + 1].tolist()
    )
    assert exact == {i for i in range(33, 44) if i != qid}  # its cluster

    def recall(cb):
        got = {
            r["vec_id"] for r in pq_adc_topk(emb, cb, qid, k=k, m=8).collect()
        }
        return len(got & exact) / k

    r_head = recall(head_codebook(emb, ksub=8))
    r_trained = recall(subspace_lloyd_codebook(emb, ksub=8, m=8, n_iters=3))
    assert r_trained > r_head, (r_trained, r_head)
    assert r_trained >= 0.8, r_trained


def test_trained_codebook_deterministic_and_layout_independent(spark):
    from data_integration_openfoodfacts_spark.operators.pq import (
        subspace_lloyd_codebook,
    )

    rows = _clustered_vecs(n_clusters=3, per_cluster=10)
    emb = _emb(spark, rows)
    a = subspace_lloyd_codebook(emb, ksub=4, m=8, n_iters=2)
    b = subspace_lloyd_codebook(
        emb.repartition(5), ksub=4, m=8, n_iters=2
    )
    assert np.array_equal(a, b)
