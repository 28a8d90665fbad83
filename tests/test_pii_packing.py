"""PII redaction golden vectors + token-packing invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.functions.pii import (
    pii_match_count,
    redact_pii,
)
from data_integration_openfoodfacts_spark.operators.packing import (
    pack_by_token_budget,
)

VECTORS = [
    ("mail me at john.doe+x@sub.example.co.uk now", "mail me at [EMAIL] now", 1),
    ("ssn is 123-45-6789 ok", "ssn is [SSN] ok", 1),
    ("call (555) 867-5309 or 555-867-5309", "call [PHONE] or [PHONE]", 2),
    ("+1 555-867-5309 intl", "[PHONE] intl", 1),
    ("host 192.168.0.1 down", "host [IP] down", 1),
    ("a@b.io 10.0.0.7 111-22-3333", "[EMAIL] [IP] [SSN]", 3),
    ("no pii here 12345", "no pii here 12345", 0),
    ("", "", 0),
]


def test_redaction_golden_vectors(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(VECTORS)], ["i", "text"]
    )
    got = {
        r.i: (r.red, r.n)
        for r in df.select(
            "i",
            redact_pii("text").alias("red"),
            pii_match_count("text").alias("n"),
        ).collect()
    }
    for i, (_, want_red, want_n) in enumerate(VECTORS):
        assert got[i] == (want_red, want_n), f"vector {i}: {got[i]}"


def test_packing_respects_budget_with_one_straddler(spark):
    rows = [(i, 0, 100 + (i % 7) * 50) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "shard", "n_tokens"])
    packed = pack_by_token_budget(
        df, "doc_id", "n_tokens", budget=500, partition_cols=["shard"]
    )
    stats = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    assert len(stats) > 1
    for r in stats:
        # the documented contract: a pack only exceeds the budget by
        # (at most) its straddler doc
        assert r.tot < 500 + r.mx


def test_packing_stable_under_repartition(spark):
    rows = [(i, i % 3, 10 + i) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "shard", "n_tokens"])
    a = sorted(
        (r.doc_id, r.pack_id)
        for r in pack_by_token_budget(
            df, "doc_id", "n_tokens", 100, ["shard"]
        ).collect()
    )
    b = sorted(
        (r.doc_id, r.pack_id)
        for r in pack_by_token_budget(
            df.repartition(7), "doc_id", "n_tokens", 100, ["shard"]
        ).collect()
    )
    assert a == b


def test_packing_budget_validation(spark):
    df = spark.createDataFrame([(1, 1)], ["doc_id", "n_tokens"])
    with pytest.raises(ValueError):
        pack_by_token_budget(df, "doc_id", "n_tokens", 0)


def test_prepare_training_shards_composition(spark):
    from data_integration_openfoodfacts_spark.operators.curation import (
        prepare_training_shards,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    out = prepare_training_shards(docs, "doc_id", "text")
    rows = out.collect()
    assert 0 < len(rows) < docs.count()  # repetition gate dropped some
    assert all(0 <= r.shard < 8 and r.pack_id >= 0 for r in rows)
    assert all(r.n_pii == 0 for r in rows)  # corpus is PII-free
    # packs are dense per shard (0..max with no holes)
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r.shard, set()).add(r.pack_id)
    for packs in per_shard.values():
        assert packs == set(range(max(packs) + 1))
