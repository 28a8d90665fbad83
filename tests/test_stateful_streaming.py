"""applyInPandasWithState: state must accumulate across micro-batches."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.sources.parquet_source import load_events
from data_integration_openfoodfacts_spark.streaming.events_stream import (
    read_events_stream,
)
from data_integration_openfoodfacts_spark.streaming.stateful import (
    running_user_totals,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def two_drop_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("drops"))
    ev = load_events(spark, SF_DIR).drop("ts_ns")
    for i, cond in enumerate(["event_id < 500", "event_id >= 500"]):
        tmp = str(tmp_path_factory.mktemp(f"t{i}"))
        ev.filter(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(tmp, f), os.path.join(d, f"d{i}.parquet"))
    return d


def test_state_accumulates_across_batches(spark, two_drop_dir):
    # maxFilesPerTrigger=1 forces TWO micro-batches over the two drops.
    stream = read_events_stream(spark, two_drop_dir, max_files_per_trigger=1)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # memory sink accumulates one row per user per batch; the final
    # (max n_events) row per user must equal the batch ground truth.
    out = (
        spark.table("totals")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
        .collect()
    )
    truth = {
        r["user_id"]: (r["n"], r["s"])
        for r in load_events(spark, SF_DIR)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert len(out) == len(truth)
    for r in out:
        n, s = truth[r["user_id"]]
        assert r["n_events"] == n
        assert abs(r["total_value"] - s) < 1e-6
    # at least one user must have been updated in both batches
    per_batch = spark.table("totals").groupBy("user_id").count()
    assert per_batch.filter("count >= 2").count() > 0


def test_transitions_stream_equals_batch(spark, two_drop_dir):
    """The per-user last-event STATE must bridge micro-batch
    boundaries: the transition crossing the two drops only exists if
    state carried the first drop's final event."""
    from data_integration_openfoodfacts_spark.streaming.stateful import (
        user_transitions_stream,
    )

    stream = read_events_stream(spark, two_drop_dir, max_files_per_trigger=1)
    with_ns = stream.withColumn(
        "ts_ns", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
    )
    q = (
        user_transitions_stream(with_ns)
        .writeStream.format("memory")
        .queryName("transitions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["prev_type"], r["event_type"]): r["n"]
        for r in spark.table("transitions")
        .groupBy("prev_type", "event_type")
        .agg(F.sum("n_steps").alias("n"))
        .collect()
    }
    from pyspark.sql.window import Window

    ev = load_events(spark, SF_DIR)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    truth = {
        (r["prev_type"], r["event_type"]): r["n"]
        for r in ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            "event_type",
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == truth
