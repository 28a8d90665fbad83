"""Skew stress benchmark: salted vs unsalted operators on a hot key.

VERDICT r03 item 6 — demonstrate the 100x posture empirically: build a
deliberately skewed dataset (one key holding ``hot_frac`` of all rows,
the rest uniform over ``n_cold_keys``), then time

- ``dedup_keep_latest``        vs ``dedup_keep_latest_salted``  (window skew)
- plain ``groupBy().count()``  vs ``salted_group_count``        (agg skew)

with AQE on (the session default). AQE splits skewed JOIN partitions but
not skewed WINDOW partitions, so the window pair is where salting must
win; hash aggregation already does map-side partial aggregation, so the
plain groupBy pair is the control where salting should NOT win (its
second shuffle is pure overhead) — both claims are printed, not assumed.

Each timing is the min of ``repeats`` runs to a noop sink (no collect).
Equivalence is asserted (same row count + same checksum) so the fast
path can't silently be a wrong path.

Usage:
    python tools/bench_skew.py [rows] [hot_frac]
Prints one JSON line; SKEW.md records a committed run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_integration_openfoodfacts_spark.operators.dedup import (  # noqa: E402
    dedup_keep_latest,
    dedup_keep_latest_salted,
)
from data_integration_openfoodfacts_spark.operators.skew import (  # noqa: E402
    salted_group_count,
)
from data_integration_openfoodfacts_spark.session import get_spark  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time(fn, repeats: int) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def build_skewed(spark, rows: int, hot_frac: float, n_cold_keys: int):
    """rows with one hot key ("HOT") holding hot_frac of them; a value
    column and a unique total-order column for keep-latest."""
    base = spark.range(rows).select(
        F.when(
            (F.col("id") % 1_000_000) < int(hot_frac * 1_000_000), F.lit("HOT")
        )
        .otherwise(
            F.concat(F.lit("k"), (F.xxhash64("id") % n_cold_keys).cast("string"))
        )
        .alias("key"),
        F.col("id").alias("seq"),
        (F.xxhash64("id") % 1000).alias("val"),
    )
    # Materialize so generation cost isn't re-paid inside each timing.
    return base.localCheckpoint(eager=True)


def checksum(df):
    """Order-insensitive content checksum for equivalence assertions."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: 8M longs can overflow a bigint accumulator
        # under ANSI mode
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    repeats = int(os.environ.get("SPARK_GRAFT_SKEW_REPEATS", "3"))

    spark = get_spark(
        "bench-skew",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = build_skewed(spark, rows, hot_frac, n_cold_keys=100_000)
    order = [F.col("seq").desc()]

    # Window keep-latest: the case AQE cannot split.
    plain_dedup = lambda: _noop(dedup_keep_latest(df, ["key"], order))  # noqa: E731
    salted_dedup = lambda: _noop(  # noqa: E731
        dedup_keep_latest_salted(df, ["key"], order, n_salts=32)
    )
    assert checksum(dedup_keep_latest(df, ["key"], order)) == checksum(
        dedup_keep_latest_salted(df, ["key"], order, n_salts=32)
    ), "salted dedup diverged from unsalted"
    t_dedup_plain = _time(plain_dedup, repeats)
    t_dedup_salted = _time(salted_dedup, repeats)

    # Hash-agg control: partial aggregation already tames the hot key.
    plain_count = lambda: _noop(df.groupBy("key").count())  # noqa: E731
    salted_count = lambda: _noop(salted_group_count(df, ["key"]))  # noqa: E731
    assert checksum(df.groupBy("key").count()) == checksum(
        salted_group_count(df, ["key"])
    ), "salted count diverged from plain"
    t_count_plain = _time(plain_count, repeats)
    t_count_salted = _time(salted_count, repeats)

    print(
        json.dumps(
            {
                "metric": "skew_stress",
                "rows": rows,
                "hot_frac": hot_frac,
                "unit": "sec",
                "dedup_window_plain": t_dedup_plain,
                "dedup_window_salted": t_dedup_salted,
                "dedup_speedup": round(t_dedup_plain / t_dedup_salted, 2),
                "group_count_plain": t_count_plain,
                "group_count_salted": t_count_salted,
                "group_count_speedup": round(
                    t_count_plain / t_count_salted, 2
                ),
            },
            separators=(",", ":"),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
