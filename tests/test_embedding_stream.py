"""Streaming embedding ingest (`streaming/embedding_stream.py`):
stream == batch, replay idempotence at the batch level, and the
in-stream compaction cadence."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.embedding_ingest import (
    EB_COL,
    incremental_embedding_dedup,
)
from data_integration_openfoodfacts_spark.streaming.embedding_stream import (
    ingest_embedding_batch,
    run_embedding_ingest_stream,
)

DIM = 8


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _vecs():
    a = [1, 0, 0, 0, 1, 0, 0, 0]
    b = [0, 1, 0, 0, 0, -1, 0, 0]
    c = [0, 0, 1, 0, 0, 0, 1, 0]
    d = [0, 0, 0, 1, 0, 0, 0, -1]
    return a, b, c, d


def _stage_batches(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"_st{i}")
        _emb(spark, rows).coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.rename(f"{stage}/{part}", f"{src}/b{i}.parquet")
    return src


def test_stream_equals_sequential_batches(spark, tmp_path):
    """An availableNow drain equals the same batches ingested
    sequentially through the batch API: same surviving vectors, same
    ledger rows."""
    a, b, c, d = _vecs()
    batches = [
        [(1, a), (2, b)],
        [(10, a), (11, c)],   # 10 dups corpus vec 1; 11 is new
        [(20, c), (21, d), (22, d)],  # 20 dups 11; 22 dups 21 in-batch
    ]
    src = _stage_batches(spark, tmp_path, batches)
    s1, l1, k1 = (str(tmp_path / p) for p in ("store1", "led1", "ck1"))
    run_embedding_ingest_stream(spark, src, s1, l1, k1, DIM)

    l2 = str(tmp_path / "led2")
    s2 = str(tmp_path / "store2")
    for rows in batches:
        ingest_embedding_batch(_emb(spark, rows), s2, l2, DIM)

    got1 = {r["vec_id"] for r in spark.read.parquet(s1).collect()}
    got2 = {r["vec_id"] for r in spark.read.parquet(s2).collect()}
    assert got1 == got2 == {1, 2, 11, 21}
    led1 = {
        tuple(r)
        for r in spark.read.parquet(l1)
        .select("vec_id", "band", "sig")
        .collect()
    }
    led2 = {
        tuple(r)
        for r in spark.read.parquet(l2)
        .select("vec_id", "band", "sig")
        .collect()
    }
    assert led1 == led2
    assert {v for v, _, _ in led1} == {1, 2, 11, 21}


def test_replayed_batch_appends_nothing(spark, tmp_path):
    """Direct foreachBatch replay: the second ingest of the same batch
    sees every vector collide with its own ledgered signatures —
    store and ledger unchanged."""
    a, b, c, _ = _vecs()
    store = str(tmp_path / "store")
    ledger = str(tmp_path / "led")
    batch = _emb(spark, [(1, a), (2, b), (3, c)])
    ingest_embedding_batch(batch, store, ledger, DIM)
    n_store = spark.read.parquet(store).count()
    n_ledger = spark.read.parquet(ledger).count()
    ingest_embedding_batch(batch, store, ledger, DIM)
    assert spark.read.parquet(store).count() == n_store == 3
    assert spark.read.parquet(ledger).count() == n_ledger


def test_stream_compaction_cadence(spark, tmp_path):
    """compact_files_every=2 over a 4-batch drain: results equal the
    uncompacted run's and the ledger sits at one file per bucket."""
    a, b, c, d = _vecs()
    batches = [[(1, a)], [(2, b)], [(3, c)], [(4, d), (5, a)]]
    src = _stage_batches(spark, tmp_path, batches)
    s1, l1, k1 = (str(tmp_path / p) for p in ("c1", "g1", "x1"))
    run_embedding_ingest_stream(
        spark, src, s1, l1, k1, DIM, compact_files_every=2
    )
    s2, l2, k2 = (str(tmp_path / p) for p in ("c2", "g2", "x2"))
    run_embedding_ingest_stream(spark, src, s2, l2, k2, DIM)
    got1 = {r["vec_id"] for r in spark.read.parquet(s1).collect()}
    got2 = {r["vec_id"] for r in spark.read.parquet(s2).collect()}
    assert got1 == got2 == {1, 2, 3, 4}  # 5 dups vec 1
    led1 = {
        tuple(r)
        for r in spark.read.parquet(l1)
        .select("vec_id", "band", "sig")
        .collect()
    }
    led2 = {
        tuple(r)
        for r in spark.read.parquet(l2)
        .select("vec_id", "band", "sig")
        .collect()
    }
    assert led1 == led2
    for dirp in glob.glob(f"{l1}/{EB_COL}=*"):
        assert len(glob.glob(f"{dirp}/*.parquet")) == 1, dirp


def test_incremental_equals_all_at_once_same_banding(spark, tmp_path):
    """Sequential tranche ingest == one all-at-once ingest of the
    concatenation, UNDER THE SAME BANDING (the configs must match: the
    stream defaults to 16-bit bands, the operator to 8 — an earlier
    draft of this test mixed them and mis-diagnosed the difference as
    dedup semantics). Exact duplicates make the two orders provably
    identical: a dropped doc's signatures equal its surviving twin's,
    so the in-batch leg (which sees dropped members) and the ledger
    leg (which only holds survivors) agree. They can differ on
    NEAR-dup chains (z colliding only with a dropped x) — there
    all-at-once drops a conservative superset, never re-admits."""
    a, b, c, d = _vecs()
    batches = [[(1, a), (2, b)], [(3, a), (4, c)], [(5, d), (6, c)]]
    led_inc = str(tmp_path / "li")
    store_inc = str(tmp_path / "si")
    for rows in batches:
        ingest_embedding_batch(_emb(spark, rows), store_inc, led_inc, DIM)
    inc = {r["vec_id"] for r in spark.read.parquet(store_inc).collect()}

    led_all = str(tmp_path / "la")
    all_rows = [x for rows in batches for x in rows]
    survivors, _ = incremental_embedding_dedup(
        _emb(spark, all_rows), led_all, DIM,
        rows_per_band=16, num_bands=8,  # the stream's banding
    )
    once = {r["vec_id"] for r in survivors.collect()}
    assert inc == once == {1, 2, 4, 5}
