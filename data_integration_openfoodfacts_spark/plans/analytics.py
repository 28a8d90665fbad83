"""The reference's six OLAP queries (sql/requetes_analytiques.sql:1-100)
re-expressed Spark-first over the driver's star schema (TESTDATA.md).

The reference runs these inside MySQL over the OpenFoodFacts gold schema;
here each is a DataFrame plan over the TPC-H-ish tables exercising the
same operator shapes (SURVEY.md §2.3-2.6):

- q1: star join + conditional COUNT(DISTINCT CASE) ratio + HAVING + top-k
  (A4/A5/O3, requetes_analytiques.sql:1-16)
- q2: 4-table star join + multi-key grouped count (A6/J4, :18-34)
- q3: lateral array unnest + grouped avg (J5/A7, :36-52)
- q4: boolean-sum completeness rate (A8, :54-73)
- q5: OR-predicate anomaly scan (P9, :75-90)
- q6: calendar-bucketed grouped avg (A7/D4, :92-100)

Determinism contract (for the DuckDB oracle hash gate): every aggregate
is either an exact integer sum or a decimal-cast sum collapsed to double
at the end; averages/ratios are a single IEEE division of those exact
operands (bit-identical across engines) and are NOT post-rounded —
``round(x, n)`` on a double that sits a hair from a decimal midpoint is
resolved differently by different engines; every top-k order has a
unique tiebreaker; every computed column carries the same alias on both
sides.

Scale notes: all joins here are fact⋈dim with small dims — Catalyst
broadcasts them (verify ``BroadcastHashJoin`` in .explain); the only
shuffles are the final hash aggregations on the group keys, which
partial-aggregate map-side first. No driver-side collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet_source import load_table


def _dec_sum(col, scale: int = 6):
    """Exact, order-independent sum: accumulate as decimal, emit double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,6)")).cast("double")


def q1_brand_return_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 brands by proportion of distinct parts ever returned.

    Shape of requetes_analytiques.sql:1-16 (top brands by nutriscore-A/B
    proportion, HAVING >= 10 products).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
    agg = j.groupBy(F.col("p_brand").alias("brand")).agg(
        F.countDistinct("p_partkey").cast("long").alias("nb_parts"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("p_partkey"))
        )
        .cast("long")
        .alias("nb_returned"),
    )
    return (
        agg.filter(F.col("nb_parts") >= 5)
        .withColumn(
            "return_ratio",
            F.col("nb_returned").cast("double") / F.col("nb_parts"),
        )
        .orderBy(F.desc("return_ratio"), F.asc("brand"))
        .limit(10)
    )


Q1_ORACLE = """
SELECT brand, nb_parts, nb_returned,
       CAST(nb_returned AS DOUBLE) / nb_parts AS return_ratio
FROM (
  SELECT p.p_brand AS brand,
         COUNT(DISTINCT p.p_partkey) AS nb_parts,
         COUNT(DISTINCT CASE WHEN l.l_returnflag = 'R' THEN p.p_partkey END) AS nb_returned
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
  HAVING COUNT(DISTINCT p.p_partkey) >= 5
)
ORDER BY return_ratio DESC, brand ASC
LIMIT 10
"""


def q2_orders_by_geo_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts by (region, nation, status) — 4-table star join +
    multi-key grouped count (requetes_analytiques.sql:18-34)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        j.groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count(F.lit(1)).alias("nb_orders"))
    )


Q2_ORACLE = """
SELECT r.r_name AS region_name, n.n_name AS nation_name,
       o.o_orderstatus AS status, COUNT(*) AS nb_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2, 3
"""


def q3_discount_by_name_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average discount by exploded part-name word — the reference's
    JSON_TABLE country unnest re-expressed as a native array explode
    (requetes_analytiques.sql:36-52, SURVEY.md J5/AR3)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
    exploded = j.select(
        F.explode(F.split(F.col("p_name"), " ")).alias("name_word"),
        "l_discount",
    )
    return (
        exploded.groupBy("name_word")
        .agg(
            F.count(F.lit(1)).alias("nb_lines"),
            (_dec_sum("l_discount") / F.count(F.lit(1))).alias("avg_discount"),
        )
    )


Q3_ORACLE = """
SELECT w.name_word AS name_word, COUNT(*) AS nb_lines,
       CAST(SUM(CAST(l.l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_discount
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey,
LATERAL (SELECT UNNEST(string_split(p.p_name, ' ')) AS name_word) w
GROUP BY 1
"""


def q4_brand_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute-completeness rate per brand via boolean sums — the
    reference's 8-nutrient completeness rate (requetes_analytiques.sql:54-73,
    A8). Booleans must be cast explicitly in Spark; the sum is an exact
    integer sum so the ratio is deterministic."""
    part = load_table(spark, sf_dir, "part")
    flags = (
        F.col("p_size").cast("int").isNotNull() & (F.col("p_size") > 25)
    ).cast("long") + (F.col("p_retailprice") > 1500).cast("long") + F.col(
        "p_name"
    ).contains("a").cast("long")
    return (
        part.groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("nb_parts"),
            (F.sum(flags).cast("double") / (3 * F.count(F.lit(1)))).alias(
                "completeness_rate"
            ),
        )
    )


Q4_ORACLE = """
SELECT p_brand AS brand, COUNT(*) AS nb_parts,
       CAST(SUM(CAST(p_size > 25 AS BIGINT)
                + CAST(p_retailprice > 1500 AS BIGINT)
                + CAST(p_name LIKE '%a%' AS BIGINT)) AS DOUBLE)
             / (3 * COUNT(*)) AS completeness_rate
FROM part
GROUP BY p_brand
"""


def q5_anomaly_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-predicate anomaly listing (requetes_analytiques.sql:75-90:
    salt > 25 OR sugars > 80). Filter-only plan: both predicates push
    down to the parquet scan."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.filter(
        (F.col("l_extendedprice") > 90000) | (F.col("l_quantity") >= 49)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
    )


Q5_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem
WHERE l_extendedprice > 90000 OR l_quantity >= 49
"""


def q6_weekly_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average order price by (year, iso-week) — the reference's weekly
    completeness trend (requetes_analytiques.sql:92-100; D4 calendar
    extraction, weekofyear is ISO week in both engines)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        )
        .agg(
            F.count(F.lit(1)).alias("nb_orders"),
            (_dec_sum("o_totalprice") / F.count(F.lit(1))).alias("avg_price"),
        )
    )


Q6_ORACLE = """
SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
       CAST(WEEKOFYEAR(o_orderdate) AS BIGINT) AS iso_week,
       COUNT(*) AS nb_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price
FROM orders
GROUP BY 1, 2
"""

ANALYTICS_QUERIES = {
    "q1_brand_return_ratio": q1_brand_return_ratio,
    "q2_orders_by_geo_status": q2_orders_by_geo_status,
    "q3_discount_by_name_word": q3_discount_by_name_word,
    "q4_brand_completeness": q4_brand_completeness,
    "q5_anomaly_scan": q5_anomaly_scan,
    "q6_weekly_avg_price": q6_weekly_avg_price,
}

ANALYTICS_ORACLES = {
    "q1_brand_return_ratio": Q1_ORACLE,
    "q2_orders_by_geo_status": Q2_ORACLE,
    "q3_discount_by_name_word": Q3_ORACLE,
    "q4_brand_completeness": Q4_ORACLE,
    "q5_anomaly_scan": Q5_ORACLE,
    "q6_weekly_avg_price": Q6_ORACLE,
}
