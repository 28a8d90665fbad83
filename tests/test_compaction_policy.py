"""State-based compaction triggers (`operators/compaction_policy.py`):
threshold semantics, metadata-only probes, stream-runner wiring, the
legacy-flat migration trigger, and the vacuum interaction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.compaction_policy import (
    bucket_file_stats,
    counting_delta_count,
    maybe_compact_bucketed,
    maybe_compact_counting,
)
from data_integration_openfoodfacts_spark.operators.novelty_ledger import (
    KB_COL,
    append_ledger_delta,
    compact_ledger_path,
    read_ledger,
)
from data_integration_openfoodfacts_spark.streaming.counting_store import (
    read_counts,
    read_counts_as_of,
    store_versions,
    write_counting_delta,
)

NW, K = 64, 3
NB = 4


def _keys(spark, names):
    return spark.createDataFrame([(n,) for n in names], "k string")


def _state(spark, p):
    return {(r["p"], r["cnt"]) for r in read_counts(spark, p).collect()}


def test_counting_threshold_and_state_preserved(spark, tmp_path):
    p = str(tmp_path / "cnt")
    assert counting_delta_count(spark, p) == 0
    for i, b in enumerate([["a"], ["b"], ["c", "c"]]):
        write_counting_delta(_keys(spark, b), "k", p, f"d{i}", NW, K)
    assert counting_delta_count(spark, p) == 3
    before = _state(spark, p)
    # under the bound: no-op
    assert not maybe_compact_counting(spark, p, NW, K, 3)
    assert counting_delta_count(spark, p) == 3
    # over the bound: compacts to the single base partition
    assert maybe_compact_counting(spark, p, NW, K, 2)
    assert counting_delta_count(spark, p) == 1
    assert _state(spark, p) == before
    # the vacuum interaction: pre-horizon versions are gone
    assert store_versions(spark, p)["min_readable"] == 3
    from data_integration_openfoodfacts_spark.streaming.counting_store import (
        CountingLayoutError,
    )

    with pytest.raises(CountingLayoutError, match="horizon"):
        read_counts_as_of(spark, p, 1)
    with pytest.raises(ValueError, match="max_deltas"):
        maybe_compact_counting(spark, p, NW, K, 0)


def test_bucketed_threshold_and_flat_migration(spark, tmp_path):
    p = str(tmp_path / "led")
    md5s = lambda names: spark.createDataFrame(  # noqa: E731
        [(n,) for n in names], "k string"
    ).select(F.md5("k").alias("shingle_md5"),
             F.lit(0).cast("long").alias("first_doc"))
    # 'a' appended in two separate deltas -> its bucket holds 2 files
    for batch in (["a", "b"], ["c"], ["a", "e"]):
        append_ledger_delta(md5s(batch), p, n_buckets=NB)
    n_files, n_dirs, max_in = bucket_file_stats(spark, p, KB_COL)
    assert n_dirs >= 1 and n_files >= 3 and max_in >= 2
    rows_before = read_ledger(spark, p).count()
    ran = {"n": 0}

    def compact():
        ran["n"] += 1
        compact_ledger_path(spark, p, n_buckets=NB)

    # generous bound: no-op
    assert not maybe_compact_bucketed(spark, p, KB_COL, compact, 10)
    assert ran["n"] == 0
    # tight bound: compacts to <= 1 file per bucket
    assert maybe_compact_bucketed(spark, p, KB_COL, compact, 1)
    assert ran["n"] == 1
    _n2, _d2, max_in2 = bucket_file_stats(spark, p, KB_COL)
    assert max_in2 <= 1
    assert read_ledger(spark, p).count() == rows_before
    # now under the bound again: no-op
    assert not maybe_compact_bucketed(spark, p, KB_COL, compact, 1)
    assert ran["n"] == 1

    # legacy FLAT store: any parquet file triggers (compaction is the
    # migration into the layout)
    flat = str(tmp_path / "flat")
    md5s(["x", "y"]).write.parquet(flat)
    assert bucket_file_stats(spark, flat, KB_COL) == (0, 0, 0)
    migrated = {"n": 0}

    def migrate():
        migrated["n"] += 1
        compact_ledger_path(spark, flat, n_buckets=NB)

    assert maybe_compact_bucketed(spark, flat, KB_COL, migrate, 5)
    assert migrated["n"] == 1
    _, n_dirs3, _ = bucket_file_stats(spark, flat, KB_COL)
    assert n_dirs3 >= 1  # now bucketed
    assert not maybe_compact_bucketed(spark, flat, KB_COL, migrate, 5)


def test_stream_runner_state_based_trigger(spark, tmp_path):
    """run_counting_screen_stream(compact_max_deltas=2): the drain
    compacts whenever live deltas exceed the bound, so the store ends
    bounded regardless of trigger count."""
    from data_integration_openfoodfacts_spark.streaming.counting_store import (
        run_counting_screen_stream,
    )

    src = str(tmp_path / "src")
    for i in range(4):
        spark.createDataFrame(
            [(i, f"text-{i}", "en", "s", 6)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).coalesce(1).write.parquet(f"{tmp_path}/part{i}")
    os.makedirs(src)
    for i in range(4):
        part = f"{tmp_path}/part{i}"
        f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
        os.link(os.path.join(part, f), os.path.join(src, f"p{i}.parquet"))
    p = str(tmp_path / "store")
    run_counting_screen_stream(
        spark, src, p, str(tmp_path / "res"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1, n_words=NW, k=K,
        compact_max_deltas=2,
    )
    # 4 deltas landed; every time the count hit 3 it compacted
    assert counting_delta_count(spark, p) <= 2
    # all four docs' keys are present in the final state
    from data_integration_openfoodfacts_spark.operators.bloom import (
        bloom_probe_keys,
        counting_to_words,
    )

    keys = spark.createDataFrame(
        [(f"text-{i}",) for i in range(4)], "t string"
    ).select(F.md5("t").alias("k"))
    flags = bloom_probe_keys(
        keys, "k", counting_to_words(read_counts(spark, p)), NW, K
    )
    assert all(r["maybe_member"] for r in flags.collect())
