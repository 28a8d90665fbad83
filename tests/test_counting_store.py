"""Persisted counting-Bloom store (`streaming/counting_store.py`,
round 10): delta-layout idempotence (replay before AND after
compaction), takedown-by-negative-delta semantics, geometry sidecar
refusals, compaction invariance, and stream==batch parity through a
real availableNow drain."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.streaming.counting_store import (
    COUNTING_META,
    CountingLayoutError,
    compact_counting,
    probe_counting,
    read_counts,
    retract_counting,
    run_counting_screen_stream,
    screen_keys_batch,
    store_geometry,
    write_counting_delta,
)

NW, K = 64, 5


def _keys(spark, names):
    return spark.createDataFrame([(n,) for n in names], "k string")


def _counts(spark, path):
    return {(r["p"], r["cnt"]) for r in read_counts(spark, path).collect()}


def _members(spark, path, names):
    flags = probe_counting(_keys(spark, names), "k", path, NW, K)
    return {r["k"] for r in flags.collect() if r["maybe_member"]}


def test_delta_replay_is_idempotent(spark, tmp_path):
    """Writing the same delta_id twice appends nothing: the second
    write finds the partition directory and returns False."""
    p = str(tmp_path / "cnt")
    assert write_counting_delta(
        _keys(spark, ["a", "b"]), "k", p, "batch-1", NW, K
    )
    before = _counts(spark, p)
    assert not write_counting_delta(
        _keys(spark, ["a", "b"]), "k", p, "batch-1", NW, K
    )
    assert _counts(spark, p) == before


def test_takedown_unsets_only_last_owner(spark, tmp_path):
    """Two owners insert overlapping keys; retracting one owner's
    occurrences keeps the shared key a member and drops the key only
    that owner held."""
    p = str(tmp_path / "cnt")
    write_counting_delta(_keys(spark, ["shared", "only1"]), "k", p,
                         "batch-1", NW, K)
    write_counting_delta(_keys(spark, ["shared", "only2"]), "k", p,
                         "batch-2", NW, K)
    assert retract_counting(
        _keys(spark, ["shared", "only1"]), "k", p, "t1", NW, K
    )
    got = _members(spark, p, ["shared", "only1", "only2"])
    assert "shared" in got and "only2" in got
    assert "only1" not in got
    # takedown replay: same takedown_id writes nothing
    assert not retract_counting(
        _keys(spark, ["shared", "only1"]), "k", p, "t1", NW, K
    )


def test_compaction_invariant_and_tombstones_replays(spark, tmp_path):
    """Compaction leaves the live table bit-identical, and a replay of
    an ABSORBED batch (its directory is gone) is refused by the
    sidecar tombstone instead of silently double-counting."""
    p = str(tmp_path / "cnt")
    write_counting_delta(_keys(spark, ["a", "b"]), "k", p, "batch-1", NW, K)
    write_counting_delta(_keys(spark, ["b", "c"]), "k", p, "batch-2", NW, K)
    retract_counting(_keys(spark, ["a"]), "k", p, "t9", NW, K)
    before = _counts(spark, p)
    compact_counting(spark, p, NW, K)
    assert _counts(spark, p) == before
    _, _, absorbed, _ = store_geometry(spark, p, NW, K)
    assert set(absorbed) == {"batch-1", "batch-2", "takedown-t9"}
    assert not write_counting_delta(
        _keys(spark, ["a", "b"]), "k", p, "batch-1", NW, K
    )
    assert _counts(spark, p) == before
    # a genuinely NEW delta still lands after compaction
    assert write_counting_delta(_keys(spark, ["d"]), "k", p, "batch-3",
                                NW, K)
    assert _members(spark, p, ["b", "c", "d"]) == {"b", "c", "d"}


def test_geometry_refusals(spark, tmp_path):
    """Wrong caller geometry raises; a sidecar-less existing store is
    refused outright; the reserved base id is rejected."""
    p = str(tmp_path / "cnt")
    write_counting_delta(_keys(spark, ["a"]), "k", p, "batch-1", NW, K)
    with pytest.raises(CountingLayoutError, match="geometry"):
        store_geometry(spark, p, NW + 1, K)
    with pytest.raises(CountingLayoutError, match="reserved"):
        write_counting_delta(_keys(spark, ["a"]), "k", p, "base", NW, K)
    os.remove(os.path.join(p, COUNTING_META))
    with pytest.raises(CountingLayoutError, match="sidecar"):
        store_geometry(spark, p, NW, K)


def test_screen_totals_first_writer_wins(spark, tmp_path):
    """Batch totals are computed against the pre-batch state and kept
    across replays: replaying batch 3 after its delta landed would
    recompute all-maybe totals, which mode('ignore') discards."""
    p, res = str(tmp_path / "cnt"), str(tmp_path / "res")
    screen_keys_batch(_keys(spark, ["a", "b"]), "k", p, res, 3, NW, K)
    first = {
        r["batch_id"]: (r["n_keys"], r["n_definitely_new"], r["n_maybe"])
        for r in spark.read.parquet(res).collect()
    }
    assert first == {3: (2, 2, 0)}
    screen_keys_batch(_keys(spark, ["a", "b"]), "k", p, res, 3, NW, K)
    again = {
        r["batch_id"]: (r["n_keys"], r["n_definitely_new"], r["n_maybe"])
        for r in spark.read.parquet(res).collect()
    }
    assert again == first
    assert _counts(spark, p) == _counts(spark, p)  # no double insert
    # occurrences inserted ONCE despite the replay: retracting one
    # occurrence of 'a' must fully remove it
    retract_counting(_keys(spark, ["a"]), "k", p, "t1", NW, K)
    assert _members(spark, p, ["a", "b"]) == {"b"}


def test_stream_matches_batch_trajectory(spark, tmp_path):
    """A real availableNow drain (1 file per trigger, in-stream
    compaction) reaches the same store state as sequential batch
    calls over the same files."""
    src = str(tmp_path / "src")
    rows = [
        (1, "alpha"), (2, "beta"),       # file 0
        (3, "beta"), (4, "gamma"),       # file 1
        (5, "gamma"), (6, "delta"),      # file 2
    ]
    for i in range(3):
        spark.createDataFrame(
            rows[2 * i: 2 * i + 2], "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")
    # flatten: read_docs_stream lists files recursively per trigger
    files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(src) for f in fs if f.endswith(".parquet")
    )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, f in enumerate(files):
        os.link(f, os.path.join(flat, f"part-{i}.parquet"))

    sp, sres = str(tmp_path / "scnt"), str(tmp_path / "sres")
    run_counting_screen_stream(
        spark, flat, sp, sres, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, n_words=NW, k=K, compact_every=2,
    )
    bp, bres = str(tmp_path / "bcnt"), str(tmp_path / "bres")
    batches = [
        spark.read.parquet(f).select(F.md5("text").alias("text_md5"))
        for f in files
    ]
    for bid, b in enumerate(batches):
        screen_keys_batch(b, "text_md5", bp, bres, bid, NW, K)
    assert _counts(spark, sp) == _counts(spark, bp)
    # totals trajectories match as multisets of rows (stream batch ids
    # follow file order, same as the sequential loop)
    s_tot = sorted(
        (r["n_keys"], r["n_definitely_new"], r["n_maybe"])
        for r in spark.read.parquet(sres).collect()
    )
    b_tot = sorted(
        (r["n_keys"], r["n_definitely_new"], r["n_maybe"])
        for r in spark.read.parquet(bres).collect()
    )
    assert s_tot == b_tot
