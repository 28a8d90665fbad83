"""As-of join and range join exposed to the correctness gate.

DuckDB has a native ASOF JOIN, which makes it the perfect adversarial
oracle for our composition-based Spark implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dedup_keep_latest
from ..operators.temporal import asof_join, range_join_bucketed
from ..sources.parquet_source import load_events, load_table


def q36_asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event: the value of the user's most recent
    view event at-or-before the purchase (NULL when none)."""
    ev = load_events(spark, sf_dir).drop("ts_ns", "props")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value"), "event_id"
    )
    # unique per (user, ts): keep the max event_id among exact ts ties
    views = dedup_keep_latest(
        views, ["user_id", "ts"], [F.col("event_id").desc()]
    ).drop("event_id")
    joined = asof_join(
        purchases,
        views,
        on="ts",
        by=["user_id"],
        right_cols=["view_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").cast("string").alias("purchase_ts"),
        "purchase_value",
        "view_value",
    )


Q36_ORACLE = """
WITH ev AS (
  -- make_timestamp(us): naive micro-precision timestamp (to_timestamp
  -- would yield TIMESTAMPTZ whose VARCHAR form grows a '+00' suffix)
  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts,
         user_id, event_type, value
  FROM events
),
purchases AS (
  SELECT event_id, user_id, ts, value AS purchase_value
  FROM ev WHERE event_type = 'purchase'
),
views AS (
  SELECT user_id, ts, value AS view_value
  FROM ev WHERE event_type = 'view'
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
)
SELECT p.event_id, p.user_id,
       CAST(p.ts AS VARCHAR) AS purchase_ts,
       p.purchase_value, v.view_value
FROM purchases p
ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def q37_price_band_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-uniform price-band range join (bucket-accelerated scale
    path) + per-band rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = li.sparkSession.createDataFrame(
        [
            ("budget", 900.0, 5000.0),
            ("mid", 5000.0, 20000.0),
            ("high", 20000.0, 60000.0),
            ("luxury", 60000.0, 120000.0),
        ],
        "band string, lo double, hi double",
    )
    joined = range_join_bucketed(
        li.select("l_extendedprice"),
        bands,
        value_col="l_extendedprice",
        lo_col="lo",
        hi_col="hi",
        bucket_width=5000.0,
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("nb_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_price"),
    )


Q37_ORACLE = """
WITH bands(band, lo, hi) AS (
  VALUES ('budget', 900.0, 5000.0), ('mid', 5000.0, 20000.0),
         ('high', 20000.0, 60000.0), ('luxury', 60000.0, 120000.0)
)
SELECT b.band, COUNT(*) AS nb_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
FROM lineitem l
JOIN bands b ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
GROUP BY b.band
"""

TEMPORAL_QUERIES = {
    "q36_asof_purchase_last_view": q36_asof_purchase_last_view,
    "q37_price_band_rollup": q37_price_band_rollup,
}

TEMPORAL_ORACLES = {
    "q36_asof_purchase_last_view": Q36_ORACLE,
    "q37_price_band_rollup": Q37_ORACLE,
}
