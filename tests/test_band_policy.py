"""Corpus-size-aware re-banding policy for the persisted MinHash
ledger (`operators/band_policy.py`, round 12)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.band_policy import (
    current_band_size,
    ledger_band_size_for,
    maybe_rescale_bands,
)
from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
    minhash_band_signatures,
)


def test_reachable_width_ladder():
    # design corpus and below: the gate width
    assert ledger_band_size_for(5_000) == 2
    assert ledger_band_size_for(500) == 2
    # one decade: ideal width 3 -> next reachable divisor-multiple is 4
    assert ledger_band_size_for(50_000) == 4
    # two decades: ideal 4 -> 4 exactly
    assert ledger_band_size_for(500_000) == 4
    # three decades: ideal 5 -> 8 (one band of all hashes, the cap)
    assert ledger_band_size_for(5_000_000) == 8
    assert ledger_band_size_for(10**12) == 8
    with pytest.raises(ValueError, match="multiple"):
        ledger_band_size_for(5_000, num_hashes=8, base_band_size=3)


def _docs(spark):
    rows = [
        (i, f"alpha beta gamma delta epsilon zeta doc{i} eta theta")
        for i in range(20)
    ]
    rows += [(100, rows[0][1]), (101, rows[1][1])]  # exact dups
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rescale_lifecycle(spark, tmp_path):
    """Seed a width-2 ledger, outgrow it, fire the trigger: the
    rewritten ledger is bitwise the from-scratch width-4 banding, a
    second call is a no-op, and a shrinking policy never fires."""
    from data_integration_openfoodfacts_spark.streaming.corpus_ingest import (
        append_bands,
    )

    docs = _docs(spark)
    p = str(tmp_path / "bands")
    bands2 = minhash_band_signatures(
        docs, "doc_id", "text", n=3, num_hashes=8, band_size=2
    )
    append_bands(bands2, p)
    assert current_band_size(spark, p) == 2

    # corpus still small -> no-op
    res = maybe_rescale_bands(spark, p, corpus_n=1_000)
    assert res == {"current": 2, "target": 2, "rescaled": False}

    # corpus outgrew the width -> re-band to 4
    res = maybe_rescale_bands(spark, p, corpus_n=50_000)
    assert res == {"current": 2, "target": 4, "rescaled": True}
    assert current_band_size(spark, p) == 4
    got = {
        (r["doc_id"], r["band"], r["sig"])
        for r in spark.read.parquet(p)
        .select("doc_id", "band", "sig")
        .collect()
    }
    want = {
        (r["doc_id"], r["band"], r["sig"])
        for r in minhash_band_signatures(
            docs, "doc_id", "text", n=3, num_hashes=8, band_size=4
        ).collect()
    }
    assert got == want

    # idempotent: same policy input -> no further rewrite
    res = maybe_rescale_bands(spark, p, corpus_n=50_000)
    assert res == {"current": 4, "target": 4, "rescaled": False}

    # exact dups still collide at the wider band
    wide = spark.read.parquet(p)
    a = wide.filter(F.col("doc_id") == 0).select("band", "sig")
    b = wide.filter(F.col("doc_id") == 100).select("band", "sig")
    assert a.join(b, ["band", "sig"]).count() == 2  # 8/4 bands


def test_empty_ledger_width_is_loud(spark, tmp_path):
    p = str(tmp_path / "bands")
    spark.createDataFrame(
        [], "doc_id long, band long, sig string"
    ).write.parquet(p)
    with pytest.raises(ValueError, match="no live rows"):
        current_band_size(spark, p)
