"""Windowed-ledger stream runner (`streaming/windowed_ingest.py`):
stream == sequential-batch parity, rolling expiry bounding the store,
and whole-stream replay as an end-to-end no-op."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.windowed_ledger import (
    score_tranche_windowed,
    window_meta,
)
from data_integration_openfoodfacts_spark.streaming.windowed_ingest import (
    run_windowed_ingest_stream,
    screen_batch_windowed,
)

NB = 8

ROWS = [
    (1, "alpha"), (2, "beta"),       # file 0
    (3, "beta"), (4, "gamma"),       # file 1
    (5, "gamma"), (6, "delta"),      # file 2
    (7, "alpha"), (8, "omega"),      # file 3
]


def _flat_source(spark, tmp_path, name):
    src = str(tmp_path / f"{name}_src")
    for i in range(4):
        spark.createDataFrame(
            ROWS[2 * i: 2 * i + 2], "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")
    files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(src) for f in fs if f.endswith(".parquet")
    )
    flat = str(tmp_path / f"{name}_flat")
    os.makedirs(flat)
    for i, f in enumerate(files):
        os.link(f, os.path.join(flat, f"part-{i}.parquet"))
    return flat


def _totals(spark, res):
    return sorted(
        (r["batch_id"], r["n_keys"], r["n_novel"], r["n_seen"])
        for r in spark.read.parquet(res).collect()
    )


def test_stream_matches_batch_and_rolls_the_window(spark, tmp_path):
    flat = _flat_source(spark, tmp_path, "a")
    sp, sres = str(tmp_path / "swin"), str(tmp_path / "sres")
    run_windowed_ingest_stream(
        spark, flat, sp, sres, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, n_buckets=NB, keep_epochs=2,
    )
    bp, bres = str(tmp_path / "bwin"), str(tmp_path / "bres")
    for bid in range(4):
        batch = spark.createDataFrame(
            ROWS[2 * bid: 2 * bid + 2], "doc_id long, text string"
        ).select(F.md5("text").alias("text_md5"))
        screen_batch_windowed(
            batch, "text_md5", bp, bres, bid, NB, keep_epochs=2
        )
    assert _totals(spark, sres) == _totals(spark, bres)
    # rolling window: epochs 0 and 1 expired after batch 2 and 3
    assert window_meta(spark, sp)["expired_through"] == 1
    assert not os.path.exists(os.path.join(sp, "epoch=0"))
    assert not os.path.exists(os.path.join(sp, "epoch=1"))
    assert os.path.exists(os.path.join(sp, "epoch=3"))
    # 'alpha' re-entered in epoch 3 (its epoch-0 copy aged out before
    # batch 3 probed), 'beta' aged out entirely
    probe = spark.createDataFrame(
        [("alpha",), ("beta",)], "t string"
    ).select(F.md5("t").alias("text_md5"))
    got = {
        r["text_md5"]: r["seen_in_window"]
        for r in score_tranche_windowed(probe, "text_md5", sp).collect()
    }
    import hashlib

    assert got[hashlib.md5(b"alpha").hexdigest()] is True
    assert got[hashlib.md5(b"beta").hexdigest()] is False


def test_whole_stream_replay_is_a_noop(spark, tmp_path):
    """Fresh checkpoint, same source: totals are first-writer-wins,
    live appends find completed dirs, expired appends hit the
    watermark — nothing changes end to end."""
    flat = _flat_source(spark, tmp_path, "b")
    sp, sres = str(tmp_path / "swin"), str(tmp_path / "sres")
    for ck in ("ck1", "ck2"):
        run_windowed_ingest_stream(
            spark, flat, sp, sres, str(tmp_path / ck),
            max_files_per_trigger=1, n_buckets=NB, keep_epochs=2,
        )
        if ck == "ck1":
            first_totals = _totals(spark, sres)
            first_meta = window_meta(spark, sp)
    assert _totals(spark, sres) == first_totals
    assert window_meta(spark, sp) == first_meta
