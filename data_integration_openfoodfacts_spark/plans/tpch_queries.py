"""Classic TPC-H-shaped OLAP queries (Q1/Q3/Q5/Q6 adapted to the
driver's star schema) — breadth evidence that the engine serves standard
warehouse analytics beyond the reference's six queries.

Determinism: revenue terms are per-row double products (identical in
both engines) decimal-cast before summation (order-independent exact
sums), divisions raw IEEE; top-k has unique tiebreakers.

Scale notes: Q1/Q6 are scan+partial-agg (no join shuffle at all);
Q3/Q5 are star joins with broadcast dims and a single agg shuffle,
exactly the 100 TB-friendly plan Catalyst picks here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet_source import load_table


def _dec(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,6)")


def q32_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report by (returnflag, linestatus)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec(disc_price)).cast("double").alias("sum_disc_price"),
            F.sum(_dec(charge)).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


Q32_ORACLE = """
SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
"""


def q33_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue for one segment."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01")
    )
    # orders/customer are NOT broadcast-hinted: at real scale they blow
    # the 8 GB broadcast limit — AQE picks broadcast when they fit and
    # shuffle joins when they don't (only true dims get hints).
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(F.sum(_dec(revenue)).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q33_ORACLE = """
SELECT l.l_orderkey,
       CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS orderdate,
       o.o_orderpriority AS orderpriority,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
"""


def q34_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where supplier and customer share the
    nation — a 6-table star/snowflake join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_dec(revenue)).cast("double").alias("revenue"))
    )


Q34_ORACLE = """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


def q35_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-scan forecast-revenue-change aggregate — every
    predicate pushes to the parquet scan, no shuffle at all before the
    final single-group agg."""
    li = load_table(spark, sf_dir, "lineitem")
    out = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return out.agg(
        F.sum(_dec(F.col("l_extendedprice") * F.col("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("nb_lines"),
    )


Q35_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS nb_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

def q63_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count (left join so
    zero-order customers land in the 0 bucket).

    Scale: the join and the per-customer count share the c_custkey/
    o_custkey hash partitioning, so Catalyst runs them in ONE shuffle;
    the second agg groups the tiny (order-count, n) set."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


Q63_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
GROUP BY 1
"""


def q64_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: yearly revenue lost if small-quantity orders (below
    20% of the part's average quantity) were not taken, for one brand +
    size band.

    Scale: the brand/size filter prunes part to ~1/50 and BROADCASTS it,
    so lineitem is reduced before the per-part average — the agg and the
    avg-join then share the l_partkey partitioning (one shuffle).
    The 0.2*avg threshold uses exact-decimal sum / count (a single IEEE
    division) so the comparison is bit-identical in both engines."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 15)
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    small = li.join(avg_qty, li.l_partkey == avg_qty.a_partkey).filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return small.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"),
        F.count(F.lit(1)).alias("nb_lines"),
    )


Q64_ORACLE = """
WITH filtered AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = 'Brand#12' AND p.p_size <= 15
),
avgs AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
           AS avg_qty
  FROM filtered GROUP BY 1
)
SELECT CAST(SUM(CAST(f.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS nb_lines
FROM filtered f JOIN avgs a ON f.l_partkey = a.l_partkey
WHERE f.l_quantity < 0.2 * a.avg_qty
"""


def q65_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: top-100 customers whose single orders exceed 250 units.

    Scale: the HAVING prefilter aggregates lineitem FIRST (map-side
    partial sums shrink the shuffle), and only qualifying orderkeys
    flow into the orders/customer joins; the exact-decimal sum makes
    the >250 gate order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 250)
    )
    j = big.join(orders, big.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    return (
        j.select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q65_ORACLE = """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS orderdate,
       o.o_totalprice,
       CAST(s.sum_qty_dec AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty_dec
  FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250
) s
JOIN orders o ON s.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 100
"""


def q66_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted (no phone column): per-nation count and total
    balance of customers whose balance beats the positive-balance
    average but who placed no order since 2000-06-01.

    Scale: the global average is a one-row broadcast cross join (stays
    declarative, no driver collect); the "no recent order" test is a
    LEFT ANTI join against the date-filtered distinct custkeys —
    Catalyst pushes the date filter to the orders scan."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-06-01")
    ).select("o_custkey")
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return (
        dormant.join(F.broadcast(nation), dormant.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


Q66_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
           AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT n.n_name AS nation,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
CROSS JOIN avg_bal a
WHERE c.c_acctbal > a.avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-06-01'
  )
GROUP BY 1
"""


def q98_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year, both
    directions (supplier in one, customer in the other).

    Scale: nation/supplier/customer are the small sides — supplier and
    nation broadcast outright; the lineitem<->orders join is the only
    big shuffle (orderkey), then orders<->customer shuffles on custkey
    with customer already nation-pruned. Revenue uses the decimal-cast
    order-independent sum."""
    n1 = "NATION_1"
    n2 = "NATION_2"
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.withColumnRenamed("n_name", "supp_nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("supp_nation").isin(n1, n2))
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.withColumnRenamed("n_name", "cust_nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("cust_nation").isin(n1, n2))
        .select("c_custkey", "cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    joined = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("nb_lines"),
        )
    )


Q98_ORACLE = """
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS nb_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""


def q99_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returned items
    ('R' lineitems) for orders placed in 1996 Q1.

    Scale: the quarter filter prunes orders before the big join;
    lineitem<->orders shuffles on orderkey, the per-customer agg reuses
    the custkey partitioning, customer+nation broadcast onto the tiny
    aggregate. Top-20 is TakeOrderedAndProject with c_custkey as the
    deterministic tiebreaker (revenue ties across a double sum)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    cust = load_table(spark, sf_dir, "customer")
    rev = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            )
            .cast("double")
            .alias("revenue")
        )
    )
    return (
        rev.join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "nation", "c_acctbal", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q99_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name AS nation, c.c_acctbal,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q103_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum 3-month revenue — the
    scalar-subquery-against-an-aggregate-view shape.

    Scale: one partial-agg shuffle builds the per-supplier revenue;
    the max attaches via a broadcast 1-row aggregate (no second scan,
    no driver read); the equality filter compares the same decimal-
    exact double both sides so the tie set is engine-stable."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("double")
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(
            F.broadcast(supp),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q103_ORACLE = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r
JOIN supplier s ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


def q107_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag linear revenue trend (least-squares slope +
    intercept over weekly revenue) — grouped regression, the
    trend-detection shape BI dashboards run.

    NOT regr_slope(): both engines implement it as streaming covariance
    updates whose float accumulation order differs. Instead the five
    sufficient statistics (n, Sx, Sy, Sxy, Sxx) are decimal-exact sums
    over the weekly points, and slope/intercept are computed from them
    in one fixed expression tree — bit-identical across engines.

    Scale: two hash aggregations (weekly rollup, per-group stats) that
    share the returnflag key; the regression math is on k rows."""
    li = load_table(spark, sf_dir, "lineitem")
    wk = F.floor(
        F.datediff(F.to_date("l_shipdate"), F.to_date(F.lit("1995-01-02")))
        / 7
    ).cast("long")
    weekly = (
        li.groupBy(F.col("l_returnflag").alias("returnflag"), wk.alias("wk"))
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("rev")
        )
    )
    stats = weekly.groupBy("returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("wk").cast("double").alias("sx"),
        F.sum(F.col("wk") * F.col("wk")).cast("double").alias("sxx"),
        F.sum(_dec("rev")).cast("double").alias("sy"),
        F.sum(_dec(F.col("wk") * F.col("rev"))).cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return stats.select(
        "returnflag",
        F.col("n").cast("long").alias("n_weeks"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias(
            "intercept"
        ),
    )


Q107_ORACLE = """
WITH weekly AS (
  SELECT l_returnflag AS returnflag,
         CAST(FLOOR(date_diff('day', DATE '1995-01-02',
                              CAST(l_shipdate AS DATE)) / 7.0)
              AS BIGINT) AS wk,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM lineitem
  GROUP BY 1, 2
),
stats AS (
  SELECT returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(wk) AS BIGINT) AS DOUBLE) AS sx,
         CAST(CAST(SUM(wk * wk) AS BIGINT) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(wk * rev AS DECIMAL(18,6))) AS DOUBLE) AS sxy
  FROM weekly
  GROUP BY 1
)
SELECT returnflag,
       CAST(n AS BIGINT) AS n_weeks,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
         AS intercept
FROM stats
"""


TPCH_QUERIES = {
    "q32_pricing_summary": q32_pricing_summary,
    "q33_shipping_priority": q33_shipping_priority,
    "q34_local_supplier_volume": q34_local_supplier_volume,
    "q35_forecast_revenue": q35_forecast_revenue,
    "q63_customer_distribution": q63_customer_distribution,
    "q64_small_quantity_revenue": q64_small_quantity_revenue,
    "q65_large_volume_customers": q65_large_volume_customers,
    "q66_dormant_rich_customers": q66_dormant_rich_customers,
    "q98_volume_shipping": q98_volume_shipping,
    "q99_returned_items": q99_returned_items,
    "q103_top_supplier": q103_top_supplier,
    "q107_revenue_trend": q107_revenue_trend,
}

TPCH_ORACLES = {
    "q32_pricing_summary": Q32_ORACLE,
    "q33_shipping_priority": Q33_ORACLE,
    "q34_local_supplier_volume": Q34_ORACLE,
    "q35_forecast_revenue": Q35_ORACLE,
    "q63_customer_distribution": Q63_ORACLE,
    "q64_small_quantity_revenue": Q64_ORACLE,
    "q65_large_volume_customers": Q65_ORACLE,
    "q66_dormant_rich_customers": Q66_ORACLE,
    "q98_volume_shipping": Q98_ORACLE,
    "q99_returned_items": Q99_ORACLE,
    "q103_top_supplier": Q103_ORACLE,
    "q107_revenue_trend": Q107_ORACLE,
}
