"""As-of join and range join exposed to the correctness gate.

DuckDB has a native ASOF JOIN, which makes it the perfect adversarial
oracle for our composition-based Spark implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.localframe import local_rows_df

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
    bands = local_rows_df(
        li.sparkSession,
        [
            ("budget", 900.0, 5000.0),
            ("mid", 5000.0, 20000.0),
            ("high", 20000.0, 60000.0),
            ("luxury", 60000.0, 120000.0),
        ],
        "band string, lo double, hi double",
    )
    # The band table is a local relation with UNKNOWN stats; without a
    # hint Spark instead broadcasts the (known-small-at-toy-scale) fact
    # side — building a fact-cardinality hash relation, exactly the
    # plan that dies at 100x. The caller knows bands is tiny, so it
    # says so; the hint survives the operator's explode/projection.
    joined = range_join_bucketed(
        li.select("l_extendedprice"),
        F.broadcast(bands),
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

def q69_gap_filled_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: per event type, a complete daily spine
    (min..max active date) with event counts (0 on silent days) and the
    last-seen daily value sum carried forward — the standard
    dashboard/feature-store densification.

    Scale: the spine is built by exploding a per-type date ``sequence``
    (a few thousand rows per type, never a driver loop); the forward
    fill is one window per type ordered by day. Shuffles: daily agg +
    window, both keyed on event_type."""
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
    )
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
        .select(
            "event_type",
            F.explode(F.sequence("mn", "mx")).alias("d"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(daily, ["event_type", "d"], "left")
    return joined.select(
        "event_type",
        F.col("d").cast("string").alias("day"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.last("sum_value", ignorenulls=True)
        .over(w)
        .cast("double")
        .alias("carried_sum"),
    )


Q69_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS sum_value
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT event_type, CAST(u.g AS DATE) AS d
  FROM (SELECT event_type, MIN(d) AS mn, MAX(d) AS mx FROM daily GROUP BY 1) b,
       LATERAL (SELECT UNNEST(generate_series(b.mn, b.mx, INTERVAL 1 DAY)) AS g) u
)
SELECT s.event_type,
       CAST(s.d AS VARCHAR) AS day,
       COALESCE(dl.n, 0) AS n_events,
       CAST(last_value(dl.sum_value IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS carried_sum
FROM spine s LEFT JOIN daily dl ON s.event_type = dl.event_type AND s.d = dl.d
"""


def q70_signup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup -> view -> purchase): how many users
    completed each stage IN ORDER (a later-stage event only counts if
    it happened strictly after the user's previous qualifying stage).

    Stage timestamps compare at full nanosecond precision (``ts_ns``
    raw longs) so ties inside one microsecond can't diverge between
    engines. One shuffle: the per-user min-conditional agg; the final
    count is a scalar."""
    ev = load_events(spark, sf_dir)

    def first_ts(t: str) -> F.Column:
        return F.min(F.when(F.col("event_type") == t, F.col("ts_ns")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("view").alias("t_view"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view") > F.col("t_signup")
    purchased = viewed & (F.col("t_purchase") > F.col("t_view"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.col("t_signup")).alias("n_signup"),
        F.sum(viewed.cast("long")).alias("n_viewed_after_signup"),
        F.sum(purchased.cast("long")).alias("n_purchased_after_view"),
    )


Q70_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN epoch_ns(ts) END) AS t_signup,
         MIN(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS t_view,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS t_purchase
  FROM events GROUP BY 1
)
SELECT COUNT(*) AS n_users,
       COUNT(t_signup) AS n_signup,
       CAST(SUM(CAST(t_view > t_signup AS BIGINT)) AS BIGINT) AS n_viewed_after_signup,
       CAST(SUM(CAST(t_view > t_signup AND t_purchase > t_view AS BIGINT)) AS BIGINT)
         AS n_purchased_after_view
FROM per_user
"""


def q83_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining: the user-journey transition matrix —
    counts of consecutive (prev_event_type -> event_type) steps per
    user timeline. One lag window over (user, time) + one grouped
    count; output cardinality is #event_types², independent of event
    volume. The (ts, event_id) ordering is collision-free, so the lag
    is deterministic on both engines."""
    ev = load_events(spark, sf_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        "event_type",
    ).filter(F.col("prev_type").isNotNull())
    return (
        steps.groupBy("prev_type", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_steps"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


Q83_ORACLE = """
WITH steps AS (
  SELECT user_id,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type
  FROM events
)
SELECT prev_type, event_type,
       COUNT(*) AS n_steps,
       COUNT(DISTINCT user_id) AS n_users
FROM steps WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


TEMPORAL_QUERIES = {
    "q36_asof_purchase_last_view": q36_asof_purchase_last_view,
    "q37_price_band_rollup": q37_price_band_rollup,
    "q69_gap_filled_daily": q69_gap_filled_daily,
    "q70_signup_funnel": q70_signup_funnel,
    "q83_event_transitions": q83_event_transitions,
}

TEMPORAL_ORACLES = {
    "q36_asof_purchase_last_view": Q36_ORACLE,
    "q37_price_band_rollup": Q37_ORACLE,
    "q69_gap_filled_daily": Q69_ORACLE,
    "q70_signup_funnel": Q70_ORACLE,
    "q83_event_transitions": Q83_ORACLE,
}
