"""Skew stress benchmark: hot-key mitigation strategies, measured.

VERDICT r03 item 6 — demonstrate the 100x posture empirically: build a
deliberately skewed dataset (one key holding ``hot_frac`` of all rows,
the rest uniform over ``n_cold_keys``), then time three pairs with AQE
on (the session default):

1. ``dedup_keep_latest`` vs ``dedup_keep_latest_salted``. On Spark
   >= 3.5 the UNSALTED form is expected to win: ``InferWindowGroupLimit``
   inserts a map-side ``WindowGroupLimit(Partial)`` for ``rank <= k``
   filters, so each map task forwards at most one row per key and the
   hot key reaches the reducer with <= n_map_partitions rows — the
   window analogue of partial aggregation. The bench ASSERTS the
   Partial node is in the plan so a config/version change that silently
   removes the protection fails loudly here.
2. Window-attached aggregate (``max over (partition by key)`` kept on
   every row) vs ``attach_grouped_agg`` (groupBy + broadcast join
   back). No partial pruning exists for aggregate-over-window — the
   hot key's full row set serializes through one sorter — so the
   rewrite is where the real 100 TB win lives.
3. Plain ``groupBy().count()`` vs ``salted_group_count`` (control:
   hash aggregation already does map-side partials, salting's second
   shuffle should be pure overhead).

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
    attach_grouped_agg,
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

    # 1. rn==1 keep-latest: protected by WindowGroupLimit(Partial) on
    # Spark >= 3.5 — assert the protection is actually in the plan.
    deduped = dedup_keep_latest(df, ["key"], order)
    plan = deduped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan, (
        "InferWindowGroupLimit did not fire: rn==1 dedup has lost its "
        "map-side skew protection"
    )
    plain_dedup = lambda: _noop(dedup_keep_latest(df, ["key"], order))  # noqa: E731
    salted_dedup = lambda: _noop(  # noqa: E731
        dedup_keep_latest_salted(df, ["key"], order, n_salts=32)
    )
    assert checksum(deduped) == checksum(
        dedup_keep_latest_salted(df, ["key"], order, n_salts=32)
    ), "salted dedup diverged from unsalted"
    t_dedup_plain = _time(plain_dedup, repeats)
    t_dedup_salted = _time(salted_dedup, repeats)

    # 2. Aggregate attached to every row: window (no partial pruning
    # exists — hot key serializes through one sorter) vs groupBy +
    # broadcast join back.
    from pyspark.sql import Window

    w = Window.partitionBy("key")
    windowed = df.withColumn("max_seq", F.max("seq").over(w))
    rewritten = attach_grouped_agg(
        df, ["key"], [F.max("seq").alias("max_seq")]
    )
    assert checksum(windowed) == checksum(
        rewritten
    ), "attach_grouped_agg diverged from window"
    t_attach_window = _time(lambda: _noop(windowed), repeats)
    t_attach_join = _time(lambda: _noop(rewritten), repeats)

    # 3. Hash-agg control: partial aggregation already tames the hot key.
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
                "attach_agg_window": t_attach_window,
                "attach_agg_join": t_attach_join,
                "attach_agg_speedup": round(
                    t_attach_window / t_attach_join, 2
                ),
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
