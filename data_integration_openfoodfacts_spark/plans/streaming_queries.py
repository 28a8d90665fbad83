"""Batch twins of the streaming aggregations (streaming/events_stream.py).

The window/session aggregations are batch/stream agnostic, so the
correctness gate runs them as batch queries against DuckDB oracles
(``time_bucket`` for tumbling windows, lag+cumsum for sessions); the
streaming tests in tests/test_streaming.py run the same functions as
real streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet_source import load_events
from ..streaming.events_stream import sessionized_events, windowed_event_stats


def q27_windowed_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event stats (streaming operator, batch twin)."""
    return windowed_event_stats(load_events(spark, sf_dir), window="1 hour")


Q27_ORACLE = """
SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS VARCHAR) AS window_start,
       event_type,
       COUNT(*) AS nb_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value
FROM events
GROUP BY 1, 2
"""


def q125_hopping_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window event stats: 1-hour windows sliding every 15
    minutes (each event belongs to 4 overlapping windows). Spark
    expands the window assignment map-side; the DuckDB oracle
    reconstructs the same 4-way assignment with an explicit k=0..3
    cross join — identical window sets by the half-open [start,
    start+size) definition."""
    return windowed_event_stats(
        load_events(spark, sf_dir), window="1 hour", slide="15 minutes"
    )


Q125_ORACLE = """
SELECT CAST(time_bucket(INTERVAL '15 minutes', ts)
            - k.k * INTERVAL '15 minutes' AS VARCHAR) AS window_start,
       event_type,
       COUNT(*) AS nb_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
         AS avg_value
FROM events
CROSS JOIN (VALUES (0), (1), (2), (3)) k(k)
GROUP BY 1, 2
"""


def q28_sessionized_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user (30 min), batch twin of the
    streaming ``session_window`` operator."""
    out = sessionized_events(load_events(spark, sf_dir), gap="30 minutes")
    return out.select(
        "session_start", "user_id", "nb_events", "first_event_id", "last_event_id"
    )


# Sessionization in plain SQL: a session break is a gap >= 30 min from
# the previous event of the same user; session id = running count of
# breaks; session_start = min(ts) in the session. Boundary semantics
# match Spark's session_window half-open [start, start+gap) interval.
Q28_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '30 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM events
),
sess AS (
  SELECT user_id, event_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT CAST(MIN(ts) AS VARCHAR) AS session_start,
       user_id,
       COUNT(*) AS nb_events,
       MIN(event_id) AS first_event_id,
       MAX(event_id) AS last_event_id
FROM sess
GROUP BY user_id, session_id
"""

def q38_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one pass produces
    (year, month, day), (year, month), (year), and grand-total rows via
    ROLLUP — the multi-granularity time-series rollup TimescaleDB-class
    engines materialize. Map-side partial aggregation applies at every
    level, so this is one shuffle regardless of granularity count."""
    ev = load_events(spark, sf_dir)
    return (
        ev.rollup(
            F.year("ts").cast("long").alias("y"),
            F.month("ts").cast("long").alias("m"),
            F.dayofmonth("ts").cast("long").alias("d"),
        )
        .agg(
            F.count(F.lit(1)).alias("nb_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


Q38_ORACLE = """
SELECT CAST(YEAR(ts) AS BIGINT) AS y,
       CAST(MONTH(ts) AS BIGINT) AS m,
       CAST(DAY(ts) AS BIGINT) AS d,
       COUNT(*) AS nb_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY ROLLUP (YEAR(ts), MONTH(ts), DAY(ts))
"""

def q39_user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values (alpha=0.3) via applyInPandas — a
    recursive aggregate no window function expresses. The DuckDB oracle
    reproduces the identical left fold over the identically-ordered list,
    so results are bit-exact."""
    from ..operators.grouped_pandas import grouped_ewma

    ev = load_events(spark, sf_dir)
    return grouped_ewma(
        ev, key_col="user_id", order_cols=["ts", "event_id"], value_col="value"
    )


Q39_ORACLE = """
-- order by the MICRO-truncated ts (what Spark sees) + event_id, so a
-- same-microsecond pair can't order differently via the raw nanos;
-- FILTER mirrors the Spark fold's skip-null semantics. The COUNT(value)
-- guard mirrors Spark's NULL ewma for an all-NULL user — DuckDB's
-- list_reduce raises on an empty list instead of returning NULL.
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CASE WHEN COUNT(value) = 0 THEN NULL
            ELSE list_reduce(
              list(value ORDER BY make_timestamp(epoch_us(ts)), event_id)
                FILTER (WHERE value IS NOT NULL),
              (acc, x) -> acc + 0.3 * (x - acc))
       END AS ewma
FROM events
GROUP BY user_id
"""


def q40_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (absent from the reference, SURVEY §2.13):
    users who viewed but never purchased (EXCEPT) and users who did both
    (INTERSECT), unioned with a tag."""
    ev = load_events(spark, sf_dir)
    viewers = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    only_view = viewers.exceptAll(buyers).select(
        F.lit("view_only").alias("segment"), "user_id"
    )
    both = viewers.intersect(buyers).select(
        F.lit("view_and_buy").alias("segment"), "user_id"
    )
    return only_view.unionByName(both)


Q40_ORACLE = """
WITH viewers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
     buyers  AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT 'view_only' AS segment, user_id FROM (SELECT user_id FROM viewers EXCEPT SELECT user_id FROM buyers)
UNION ALL
SELECT 'view_and_buy' AS segment, user_id FROM (SELECT user_id FROM viewers INTERSECT SELECT user_id FROM buyers)
"""


def q44_scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 history over the events CDC feed: each user's
    event_type becomes a tracked dimension attribute; every attribute
    change opens a version with effective_from/effective_to/is_current.
    The reference designed exactly this as future work
    (vincent_valentin/docs/architecture_notes.md:263-331,
    docs/data_dictionary.md:456-464); the oracle reconstructs the
    version intervals with lag/lead window functions."""
    from ..operators.dedup import dedup_keep_latest
    from ..operators.scd import scd2_history

    ev = load_events(spark, sf_dir)
    # one change per (user, micro-ts): latest event_id wins the tie
    changes = dedup_keep_latest(
        ev.select("user_id", "ts", "event_type", "event_id"),
        keys=["user_id", "ts"],
        order_by=[F.col("event_id").desc()],
    )
    hist = scd2_history(
        changes, keys=["user_id"], order_col="ts", tracked_cols=["event_type"]
    )
    return hist.select(
        "user_id",
        "event_type",
        F.col("effective_from").cast("string").alias("effective_from"),
        F.col("effective_to").cast("string").alias("effective_to"),
        "is_current",
        "version",
    )


Q44_ORACLE = """
WITH ch AS (
  SELECT user_id, make_timestamp(epoch_us(ts)) AS mts, event_type
  FROM events
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, make_timestamp(epoch_us(ts))
                             ORDER BY event_id DESC) = 1
),
flagged AS (
  SELECT user_id, mts, event_type,
         (ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY mts) = 1
          OR event_type IS DISTINCT FROM
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY mts)) AS brk
  FROM ch
),
vers AS (SELECT user_id, mts, event_type FROM flagged WHERE brk)
SELECT user_id, event_type,
       CAST(mts AS VARCHAR) AS effective_from,
       CAST(LEAD(mts) OVER (PARTITION BY user_id ORDER BY mts) AS VARCHAR)
         AS effective_to,
       (LEAD(mts) OVER (PARTITION BY user_id ORDER BY mts) IS NULL)
         AS is_current,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY mts) AS BIGINT)
         AS version
FROM vers
"""


def q129_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 lookup — THE consumption pattern q44's
    history exists for: every purchase event joined to the dimension
    version valid AT the purchase timestamp
    (effective_from <= ts < effective_to, open-ended current version).

    Scale: the join is an EQUI join on the natural key (user_id) with
    the validity range as a residual filter — per-key version counts
    are small, so the fan-out is bounded; never a blind range
    cross-join. Purchases at a version boundary land in the NEWER
    version (from-inclusive/to-exclusive), pinned by the oracle."""
    from ..operators.dedup import dedup_keep_latest
    from ..operators.scd import scd2_history

    ev = load_events(spark, sf_dir)
    changes = dedup_keep_latest(
        ev.select("user_id", "ts", "event_type", "event_id"),
        keys=["user_id", "ts"],
        order_by=[F.col("event_id").desc()],
    )
    hist = scd2_history(
        changes, keys=["user_id"], order_col="ts", tracked_cols=["event_type"]
    ).select(
        F.col("user_id").alias("h_user"),
        F.col("event_type").alias("state_at_purchase"),
        "effective_from",
        "effective_to",
        "version",
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    return (
        purchases.join(
            hist,
            (F.col("user_id") == F.col("h_user"))
            & (F.col("effective_from") <= F.col("ts"))
            & (
                F.col("effective_to").isNull()
                | (F.col("ts") < F.col("effective_to"))
            ),
        )
        .select(
            "purchase_id", "user_id", "state_at_purchase", "version"
        )
    )


Q129_ORACLE = """
WITH ch AS (
  SELECT user_id, make_timestamp(epoch_us(ts)) AS mts, event_type
  FROM events
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, make_timestamp(epoch_us(ts))
                             ORDER BY event_id DESC) = 1
),
flagged AS (
  SELECT user_id, mts, event_type,
         (ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY mts) = 1
          OR event_type IS DISTINCT FROM
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY mts)) AS brk
  FROM ch
),
vers AS (SELECT user_id, mts, event_type FROM flagged WHERE brk),
hist AS (
  SELECT user_id, event_type AS state_at_purchase,
         mts AS effective_from,
         LEAD(mts) OVER (PARTITION BY user_id ORDER BY mts) AS effective_to,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY mts) AS BIGINT)
           AS version
  FROM vers
)
SELECT p.event_id AS purchase_id, p.user_id, h.state_at_purchase, h.version
FROM events p
JOIN hist h
  ON p.user_id = h.user_id
 AND h.effective_from <= make_timestamp(epoch_us(p.ts))
 AND (h.effective_to IS NULL OR make_timestamp(epoch_us(p.ts)) < h.effective_to)
WHERE p.event_type = 'purchase'
"""


def q56_view_purchase_interval_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval join (stream-stream join's batch twin): every purchase
    matched to ALL of the same user's views in the preceding 30 minutes
    (q36's as-of join keeps only the latest view; this keeps the full
    attribution window). On streams the same operator is a watermarked
    stream-stream inner join whose state is evicted past the gap bound
    (see streaming/events_stream.interval_join + real-stream test)."""
    from ..streaming.events_stream import interval_join

    ev = load_events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    j = interval_join(
        p, v, "p_user", "v_user", "p_ts", "v_ts", max_gap="30 minutes"
    )
    return j.select(
        "purchase_id",
        "view_id",
        F.col("p_user").alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("gap_us"),
    )


Q56_ORACLE = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id,
         make_timestamp(epoch_us(ts)) AS p_ts
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT event_id AS view_id, user_id,
         make_timestamp(epoch_us(ts)) AS v_ts
  FROM events WHERE event_type = 'view'
)
SELECT p.purchase_id, v.view_id, p.user_id,
       epoch_us(p.p_ts) - epoch_us(v.v_ts) AS gap_us
FROM p JOIN v ON p.user_id = v.user_id
  AND v.v_ts <= p.p_ts
  AND p.p_ts <= v.v_ts + INTERVAL 30 MINUTE
"""


STREAMING_QUERIES = {
    "q27_windowed_event_stats": q27_windowed_event_stats,
    "q28_sessionized_events": q28_sessionized_events,
    "q38_time_rollup": q38_time_rollup,
    "q39_user_value_ewma": q39_user_value_ewma,
    "q40_set_operations": q40_set_operations,
    "q44_scd2_user_history": q44_scd2_user_history,
    "q56_view_purchase_interval_join": q56_view_purchase_interval_join,
    "q125_hopping_window_stats": q125_hopping_window_stats,
    "q129_point_in_time_lookup": q129_point_in_time_lookup,
}

STREAMING_ORACLES = {
    "q27_windowed_event_stats": Q27_ORACLE,
    "q28_sessionized_events": Q28_ORACLE,
    "q38_time_rollup": Q38_ORACLE,
    "q39_user_value_ewma": Q39_ORACLE,
    "q40_set_operations": Q40_ORACLE,
    "q44_scd2_user_history": Q44_ORACLE,
    "q56_view_purchase_interval_join": Q56_ORACLE,
    "q125_hopping_window_stats": Q125_ORACLE,
    "q129_point_in_time_lookup": Q129_ORACLE,
}
