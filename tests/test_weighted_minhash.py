"""Integer-weighted MinHash (`operators/weighted_minhash.py`, round
10): weighted-Jaccard exactness on hand cases, binary-vector
degeneracy to set Jaccard, the replication cap, and the
candidate-bounded verify's plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.weighted_minhash import (
    token_tf,
    verify_weighted_jaccard,
    weighted_minhash_band_signatures,
    weighted_minhash_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _all_pairs(spark, ids):
    return spark.createDataFrame(
        [(a, b) for a in ids for b in ids if a < b], "id_a long, id_b long"
    )


def test_weighted_jaccard_hand_case(spark):
    """A = {x:3, y:1}, B = {x:1, y:1}: J_W = (1+1)/(3+1) = 0.5 — the
    multiset-faithful value, where set Jaccard would say 1.0."""
    tf = token_tf(_docs(spark, [(1, "x x x y"), (2, "x y")]), "doc_id", "text")
    got = verify_weighted_jaccard(
        tf, _all_pairs(spark, [1, 2]), "doc_id", threshold=0.0
    ).collect()
    assert len(got) == 1 and got[0]["w_jaccard"] == pytest.approx(0.5)


def test_binary_degeneracy_to_set_jaccard(spark):
    """All-distinct tokens (tf == 1 everywhere): weighted Jaccard must
    equal plain set Jaccard — |A∩B| / |A∪B| = 2/4 here."""
    tf = token_tf(
        _docs(spark, [(1, "a b c"), (2, "b c d")]), "doc_id", "text"
    )
    got = verify_weighted_jaccard(
        tf, _all_pairs(spark, [1, 2]), "doc_id", threshold=0.0
    ).collect()
    assert got[0]["w_jaccard"] == pytest.approx(2 / 4)


def test_cap_bounds_replication(spark):
    """cap=8: a token repeated 20 times weighs 8 — both in the tf
    table and therefore in the signature expansion and the verify."""
    tf = token_tf(
        _docs(spark, [(1, " ".join(["w"] * 20) + " z")]), "doc_id", "text",
        cap=8,
    )
    rows = {r["tok"]: r["ctf"] for r in tf.collect()}
    assert rows == {"w": 8, "z": 1}


def test_identical_docs_are_certain_candidates_and_score_one(spark):
    """Identical tf vectors agree on every min-hash, hence every band:
    LSH must surface the pair regardless of banding, and the verify
    scores exactly 1.0."""
    text = "the cat sat on the mat the end"
    tf = token_tf(
        _docs(spark, [(1, text), (2, text), (3, "completely different words")]),
        "doc_id", "text",
    )
    cands = weighted_minhash_pairs(tf, "doc_id", max_bucket_size=None)
    got = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (1, 2) in got
    ver = verify_weighted_jaccard(
        tf, cands, "doc_id", threshold=0.99
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in ver] == [(1, 2)]
    assert ver[0]["w_jaccard"] == 1.0


def test_bucket_cap_drops_hot_template_bucket(spark):
    """max_bucket_size: 20 identical template docs form a size-20
    bucket in every band — capped at 16 the pair list is empty, the
    m^2/2 blowup never reaches the join."""
    rows = [(i, "same template text here") for i in range(20)]
    tf = token_tf(_docs(spark, rows), "doc_id", "text")
    assert weighted_minhash_pairs(
        tf, "doc_id", max_bucket_size=16
    ).count() == 0
    assert weighted_minhash_pairs(
        tf, "doc_id", max_bucket_size=None
    ).count() == 20 * 19 // 2


def test_signature_expansion_shares_replica_prefix(spark):
    """Two docs with overlapping tf share exactly min(ctf) replicas
    per token, so a doc whose tf vector dominates another's agrees on
    every min-hash the smaller doc produced from shared tokens — here
    identical vectors give identical full signatures."""
    tf = token_tf(
        _docs(spark, [(1, "p p q"), (2, "p p q")]), "doc_id", "text"
    )
    sigs = weighted_minhash_band_signatures(tf, "doc_id")
    per_doc = (
        sigs.groupBy("band", "sig")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    )
    assert all(r["n"] == 2 for r in per_doc)


def test_verify_plan_no_cartesian_no_python(spark):
    """Scale-posture pin: the exact verify joins through the candidate
    pair table — no cartesian product, no Python in the plan."""
    tf = token_tf(
        _docs(spark, [(1, "a b"), (2, "a c"), (3, "b c")]), "doc_id", "text"
    )
    plan = (
        verify_weighted_jaccard(
            tf, _all_pairs(spark, [1, 2, 3]), "doc_id", 0.0
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
