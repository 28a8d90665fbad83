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


def q108_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted (testdata has no partsupp table): the supply
    relation is derived from lineitem — the supply cost of a
    (part, supplier) pair is the minimum unit price
    (l_extendedprice / l_quantity) that supplier ever charged for the
    part. For LARGE parts up to size 10, return the EUROPE suppliers
    charging each part's region-wide minimum, top-100 by account
    balance (unique (s_name, p_partkey) tiebreak).

    Determinism: unit price is one per-row IEEE division (identical in
    both engines); MIN over identical double sets is order-independent;
    the min-cost equality join compares those exact doubles.

    Scale: part (filtered) / supplier / nation / region all broadcast;
    the only big shuffle is the (partkey, suppkey) supply aggregation.
    The per-part minimum joins back as a broadcast (|filtered parts|
    rows), avoiding a second lineitem-sized shuffle."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 10) & (F.col("p_type") == "LARGE"))
        .select("p_partkey")
    )
    supply = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "supply_cost"
            )
        )
    )
    min_cost = supply.groupBy(F.col("p_partkey").alias("mc_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        supply.join(
            F.broadcast(min_cost),
            (F.col("p_partkey") == F.col("mc_partkey"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


Q108_ORACLE = """
WITH supply AS (
  SELECT l.l_partkey AS p_partkey,
         s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
         MIN(l.l_extendedprice / l.l_quantity) AS supply_cost
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey
                 AND p.p_size <= 10 AND p.p_type = 'LARGE'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
                 AND r.r_name = 'EUROPE'
  GROUP BY 1, 2, 3, 4, 5
)
SELECT s_acctbal, s_name, n_name, p_partkey, supply_cost
FROM supply e
WHERE supply_cost = (SELECT MIN(supply_cost) FROM supply m
                     WHERE m.p_partkey = e.p_partkey)
ORDER BY s_acctbal DESC, s_name, p_partkey
LIMIT 100
"""


def q109_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's market share of ECONOMY-part revenue sold
    to AMERICA customers, per order year 1995-1998.

    Determinism: numerator and denominator are decimal-exact sums cast
    to double, divided in one IEEE step — identical in both engines.

    Scale: part/customer/supplier/nation all broadcast after their
    filters; lineitem<->orders is the one big (orderkey) shuffle, then
    a tiny per-year aggregation."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    nation = load_table(spark, sf_dir, "nation")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("sn_nationkey"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", _dec(vol)).otherwise(
                    F.lit(0).cast("decimal(18,6)")
                )
            )
            .cast("double")
            .alias("nation_vol"),
            F.sum(_dec(vol)).cast("double").alias("total_vol"),
        )
        .select(
            "o_year",
            (F.col("nation_vol") / F.col("total_vol")).alias("mkt_share"),
        )
    )


Q109_ORACLE = """
SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                     THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,6))
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
       / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN region r   ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate <  TIMESTAMP '1999-01-01'
GROUP BY 1
"""


def q110_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp.ps_supplycost): supply cost is
    proxied as 10% of p_retailprice per unit. Profit on red parts by
    (supplier nation, order year).

    Determinism: the per-row amount is ONE double expression with
    identical association in both engines, decimal-cast before the sum.

    Scale: part filter + supplier/nation broadcast; lineitem<->orders
    is the big (orderkey) shuffle; agg output is |nations|x|years|."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select(
                    "n_nationkey", F.col("n_name").alias("nation")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "nation")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.1)
    return (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_dec(amount)).cast("double").alias("sum_profit"))
    )


Q110_ORACLE = """
SELECT n.n_name AS nation,
       CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - p.p_retailprice * l.l_quantity * 0.1
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
"""


def q111_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (no partsupp): a part's "stock value" is the
    discounted revenue shipped by EUROPE suppliers; return parts whose
    value exceeds 0.01% of the total (the scalar-subquery HAVING).

    Determinism: values are decimal-exact; the threshold compare runs
    as the SAME IEEE expression (value_double > total_double * 1e-4) on
    identical inputs in both engines, so the cut is engine-identical.

    Scale: the global total is a 1-row broadcast (cross join), never a
    driver collect; one (partkey) agg shuffle."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    vals = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("value_dec")
        )
    )
    total = vals.agg(
        F.sum("value_dec").cast("double").alias("total_value")
    )
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec").cast("double")
            > F.col("total_value") * F.lit(0.0001)
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_dec").cast("double").alias("stock_value"),
        )
    )


Q111_ORACLE = """
WITH vals AS (
  SELECT l.l_partkey AS p_partkey,
         SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(18,6))) AS value_dec
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
  GROUP BY 1
)
SELECT p_partkey, CAST(value_dec AS DOUBLE) AS stock_value
FROM vals
WHERE CAST(value_dec AS DOUBLE) >
      (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM vals) * 0.0001
"""


def q112_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (no l_shipmode column): lines are banded by
    shipping delay (SLOW = shipped >60 days after order) and 1997
    shipments counted by order-priority class per band.

    Scale: lineitem<->orders is a large-large (orderkey) equi join —
    at cluster scale both sides co-partition on the join key (or read
    from orderkey-bucketed tables); the band agg output is 2 rows."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    delay_band = F.when(
        F.to_date("l_shipdate")
        > F.date_add(F.to_date("o_orderdate"), 60),
        F.lit("SLOW"),
    ).otherwise(F.lit("FAST"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(delay_band.alias("delay_band"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q112_ORACLE = """
SELECT CASE WHEN CAST(l.l_shipdate AS DATE)
                 > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
            THEN 'SLOW' ELSE 'FAST' END AS delay_band,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
"""


def q113_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: distinct suppliers per (brand, type, size)
    for selected sizes, excluding Brand#1 / PROMO parts and suppliers
    with negative balance (the "complaints" NOT-IN, planned as an
    anti join). Supply facts come from lineitem (no partsupp).

    Scale: part broadcast after its selective filter; the excluded
    suppliers are a tiny broadcast anti join; COUNT(DISTINCT) is the
    one two-phase shuffle."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    complained = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(complained),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q113_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


def q114_discounted_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from three OR'd (brand, quantity-band,
    size-band) predicates — the disjunctive-pushdown stress query.

    Scale: one broadcast hash join with the disjunction evaluated
    post-join; part's residual (brand/size) predicate prunes the
    broadcast side. Single-row decimal-exact output."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & q.between(1, 11)
            & sz.between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & q.between(10, 20)
            & sz.between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & q.between(20, 30)
            & sz.between(1, 15)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("nb_lines"),
        )
    )


Q114_ORACLE = """
SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS nb_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11
       AND p.p_size BETWEEN 1 AND 5)
   OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20
       AND p.p_size BETWEEN 1 AND 10)
   OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30
       AND p.p_size BETWEEN 1 AND 15)
"""


def q115_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (availqty proxied by shipped quantity): the
    NATION_5 suppliers who shipped more than 10% of some small-named
    part's total shipped quantity — the nested-semijoin chain.

    Determinism: quantities are integral doubles; sums are decimal-
    exact; the 10% compare is the same IEEE expression per engine.

    Scale: filtered part broadcast; per-(part, supplier) agg is the
    one shuffle; per-part totals broadcast back; final supplier join
    broadcast."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("supp_qty"))
    )
    tot = ps.groupBy(F.col("p_partkey").alias("t_partkey")).agg(
        F.sum("supp_qty").cast("double").alias("part_qty")
    )
    qualifying = (
        ps.join(F.broadcast(tot), F.col("p_partkey") == F.col("t_partkey"))
        .filter(
            F.col("supp_qty").cast("double")
            > F.col("part_qty") * F.lit(0.1)
        )
        .select("l_suppkey")
        .distinct()
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_5"
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    return (
        supp.join(
            qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q115_ORACLE = """
WITH ps AS (
  SELECT l.l_partkey AS p_partkey, l.l_suppkey,
         SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS supp_qty
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE 'small%'
  GROUP BY 1, 2
),
tot AS (
  SELECT p_partkey, CAST(SUM(supp_qty) AS DOUBLE) AS part_qty
  FROM ps GROUP BY 1
)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_5'
WHERE s.s_suppkey IN (
  SELECT ps.l_suppkey
  FROM ps JOIN tot ON ps.p_partkey = tot.p_partkey
  WHERE CAST(ps.supp_qty AS DOUBLE) > tot.part_qty * 0.1
)
ORDER BY s.s_name
"""


def q116_suppliers_who_kept_waiting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q21 adapted (lateness = shipped >45 days after order
    date; testdata has no commit/receipt dates): for finalized ('F')
    multi-supplier orders where EXACTLY ONE supplier shipped late,
    count such orders per late supplier — the EXISTS / NOT-EXISTS
    correlated pair, planned as one per-order aggregation plus a
    self-join instead of two correlated scans.

    Scale: lineitem<->orders (orderkey) is the big shuffle; the
    per-order supplier/late-supplier distinct counts reuse the same
    key; supplier is broadcast at the end. Top-20 has the unique
    s_name tiebreak."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "late",
            F.to_date("l_shipdate")
            > F.date_add(F.to_date("o_orderdate"), 45),
        )
    )
    per_order = li.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    waiting = (
        li.filter(F.col("late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order.filter(
                (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
            ),
            F.col("l_orderkey") == F.col("po_orderkey"),
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q116_ORACLE = """
WITH li AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CAST(l.l_shipdate AS DATE)
           > CAST(o.o_orderdate AS DATE) + INTERVAL 45 DAY AS late
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
               AND o.o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
  FROM li GROUP BY 1
),
waiting AS (
  SELECT DISTINCT li.l_orderkey, li.l_suppkey
  FROM li
  JOIN per_order p ON li.l_orderkey = p.l_orderkey
  WHERE li.late AND p.n_supp >= 2 AND p.n_late_supp = 1
)
SELECT s.s_name, COUNT(*) AS numwait
FROM waiting w
JOIN supplier s ON w.l_suppkey = s.s_suppkey
GROUP BY 1
ORDER BY numwait DESC, s.s_name
LIMIT 20
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
    "q108_min_cost_supplier": q108_min_cost_supplier,
    "q109_national_market_share": q109_national_market_share,
    "q110_product_type_profit": q110_product_type_profit,
    "q111_important_stock": q111_important_stock,
    "q112_shipmode_priority": q112_shipmode_priority,
    "q113_parts_supplier_counts": q113_parts_supplier_counts,
    "q114_discounted_band_revenue": q114_discounted_band_revenue,
    "q115_part_promotion_suppliers": q115_part_promotion_suppliers,
    "q116_suppliers_kept_waiting": q116_suppliers_who_kept_waiting,
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
    "q108_min_cost_supplier": Q108_ORACLE,
    "q109_national_market_share": Q109_ORACLE,
    "q110_product_type_profit": Q110_ORACLE,
    "q111_important_stock": Q111_ORACLE,
    "q112_shipmode_priority": Q112_ORACLE,
    "q113_parts_supplier_counts": Q113_ORACLE,
    "q114_discounted_band_revenue": Q114_ORACLE,
    "q115_part_promotion_suppliers": Q115_ORACLE,
    "q116_suppliers_kept_waiting": Q116_ORACLE,
}
