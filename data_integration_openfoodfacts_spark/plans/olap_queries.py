"""OLAP operator breadth beyond the reference's surface: window-frame
functions, pivot, and EXISTS-style semi-join shapes — the analytics any
warehouse user expects, each with a DuckDB oracle.

Determinism notes (see the oracle-parity rules in plans/llm_queries.py):
windowed running sums accumulate in DECIMAL so segment-tree vs
sequential accumulation order cannot produce last-ulp drift; every
window order is a total order (unique key appended); divisions happen
once, on exact inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.localframe import local_rows_df

from ..sources.parquet_source import load_table


def q51_window_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame battery over lineitem per return flag: running
    revenue (unbounded-preceding frame), 3-row moving sum, row_number
    and ntile(4) — the WindowExec shapes (running/sliding/ranking) in
    one pass. One hash shuffle on the partition key; frames are
    per-partition sorted scans."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
    # appending price makes every remaining tie between rows identical
    # in all sum-relevant columns, so prefix sums are order-invariant
    order = [F.col("l_orderkey"), F.col("l_linenumber"), F.col("price")]
    w = Window.partitionBy("l_returnflag").orderBy(*order)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliding = w.rowsBetween(-2, Window.currentRow)
    rank_w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("price"), *order
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        # accumulate in DECIMAL (exact, order-insensitive), cast the
        # final value to double for engine-neutral comparison
        F.sum("price").over(running).cast("double").alias("running_revenue"),
        F.sum("price").over(sliding).cast("double").alias("moving_sum3"),
        F.row_number().over(rank_w).cast("long").alias("price_rank"),
        F.ntile(4).over(rank_w).cast("long").alias("price_quartile"),
    )


Q51_ORACLE = """
SELECT l_orderkey, l_linenumber, l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
         OVER (PARTITION BY l_returnflag ORDER BY l_orderkey, l_linenumber,
                        CAST(l_extendedprice AS DECIMAL(18,2))
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
         OVER (PARTITION BY l_returnflag ORDER BY l_orderkey, l_linenumber,
                        CAST(l_extendedprice AS DECIMAL(18,2))
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3,
       CAST(ROW_NUMBER()
         OVER (PARTITION BY l_returnflag
               ORDER BY CAST(l_extendedprice AS DECIMAL(18,2)) DESC,
                        l_orderkey, l_linenumber) AS BIGINT) AS price_rank,
       CAST(NTILE(4)
         OVER (PARTITION BY l_returnflag
               ORDER BY CAST(l_extendedprice AS DECIMAL(18,2)) DESC,
                        l_orderkey, l_linenumber) AS BIGINT) AS price_quartile
FROM lineitem
"""


def q52_order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: orders per (month, status) with statuses as columns.
    Spark's ``pivot`` with EXPLICIT values compiles to one pass of
    conditional aggregation (no second distinct-values job and no
    driver-side value collection — the scale-safe form)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.month(F.to_date("o_orderdate")).cast("long").alias("order_month"),
            "o_orderstatus",
        )
        .groupBy("order_month")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "order_month",
            F.coalesce("O", F.lit(0)).alias("open_cnt"),
            F.coalesce("F", F.lit(0)).alias("filled_cnt"),
            F.coalesce("P", F.lit(0)).alias("pending_cnt"),
        )
    )


Q52_ORACLE = """
SELECT CAST(MONTH(CAST(o_orderdate AS DATE)) AS BIGINT) AS order_month,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_cnt,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS filled_cnt,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS pending_cnt
FROM orders
GROUP BY 1
"""


def q53_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order counts per priority for orders with at
    least one late line (shipped > 30 days after order date) — the
    EXISTS correlated subquery, planned as a left-semi hash join (the
    scan-once, never-duplicate form)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .filter(
            F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 30)
        )
        .select("l_orderkey")
    )
    return (
        orders.join(late, orders["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q53_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY
)
GROUP BY 1
"""


def q54_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface: parse the events ``props`` JSON column
    with a TYPED schema (``from_json`` — single parse, pushdown-friendly,
    vs per-field ``get_json_object`` which re-parses per extraction) and
    aggregate the extracted field per event type."""
    from pyspark.sql.types import LongType, StructField, StructType

    ev = load_table(spark, sf_dir, "events")
    props_schema = StructType([StructField("k", LongType())])
    parsed = ev.select(
        "event_type",
        F.from_json(F.col("props"), props_schema).getField("k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("nb_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


Q54_ORACLE = """
SELECT event_type,
       COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS nb_with_k,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY 1
"""


def q55_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long): lineitem's numeric measures melt into
    (key, measure_name, value) rows — the inverse of q52's pivot, one
    narrow per-row expansion (Spark ``unpivot``/``melt``, no shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_discount").cast("double").alias("discount"),
        F.col("l_tax").cast("double").alias("tax"),
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount", "tax"],
        "measure",
        "value",
    )


Q55_ORACLE = """
SELECT l_orderkey, l_linenumber, m.measure, m.value
FROM lineitem,
LATERAL (
  SELECT * FROM (VALUES
    ('quantity', CAST(l_quantity AS DOUBLE)),
    ('extendedprice', CAST(l_extendedprice AS DOUBLE)),
    ('discount', CAST(l_discount AS DOUBLE)),
    ('tax', CAST(l_tax AS DOUBLE))
  ) AS t(measure, value)
) m
"""


def q57_rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: order counts and totals at (year, status),
    (year), and grand-total levels in ONE aggregation pass — Spark
    expands the grouping sets map-side (an Expand node feeding a single
    hash aggregate), so the hierarchy costs one shuffle, not three
    separate scans. GROUPING flags disambiguate subtotal NULLs from
    genuine NULL keys."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.year(F.to_date("o_orderdate")).cast("long").alias("order_year"),
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,6)").alias("total_dec"),
    )
    return base.rollup("order_year", "o_orderstatus").agg(
        F.grouping("order_year").cast("long").alias("g_year"),
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.count(F.lit(1)).alias("nb_orders"),
        F.sum("total_dec").cast("double").alias("sum_total"),
    )


Q57_ORACLE = """
SELECT CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT) AS order_year,
       o_orderstatus,
       CAST(GROUPING(CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT)) AS BIGINT) AS g_year,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       COUNT(*) AS nb_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY ROLLUP(1, 2)
"""


def q72_cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: order counts/totals across ALL subsets of
    (orderpriority, orderstatus) — the full cross-classification a BI
    layer asks for. Like ROLLUP (q57), Spark expands the 4 grouping
    sets map-side into one Expand + single hash aggregate: one shuffle
    for the whole lattice."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderpriority",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,6)").alias("total_dec"),
    )
    return base.cube("o_orderpriority", "o_orderstatus").agg(
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.count(F.lit(1)).alias("nb_orders"),
        F.sum("total_dec").cast("double").alias("sum_total"),
    )


Q72_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       COUNT(*) AS nb_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY CUBE(1, 2)
"""


def q58_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): share of one-month revenue
    from a part class — fact⋈dim join where the date predicate pushes to
    the lineitem scan and the part side broadcasts; the share is a single
    division of exact decimal sums (cast double), so both engines emit
    the identical IEEE quotient."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    promo = F.sum(
        F.when(F.col("p_type") == "ECONOMY", rev)
        .otherwise(F.lit(0.0))
        .cast("decimal(18,6)")
    ).cast("double")
    total = F.sum(rev.cast("decimal(18,6)")).cast("double")
    return j.agg(
        promo.alias("promo_revenue"),
        total.alias("total_revenue"),
        (promo / total).alias("promo_share"),
    )


Q58_ORACLE = """
SELECT CAST(SUM(CAST(CASE WHEN p.p_type = 'ECONOMY'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue,
       CAST(SUM(CAST(CASE WHEN p.p_type = 'ECONOMY'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
       / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS promo_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
  AND l.l_shipdate < TIMESTAMP '1997-04-01'
"""


def q79_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond the ROLLUP/CUBE specializations,
    q57/q72): the two *non-hierarchical* aggregation grains an order
    dashboard wants — (status) and (priority) — in ONE pass. Same
    Expand-then-single-hash-aggregate physical shape: one shuffle for
    N grains, vs N separate scans."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__q79_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               COUNT(*) AS nb_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                 AS sum_total
        FROM __q79_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


Q79_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       COUNT(*) AS nb_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


def q80_blocked_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage fuzzy dedup (operators/linkage.py): candidate
    part-name pairs within a cheap BLOCK (same first word + same size),
    verified by Levenshtein distance <= 4 — the classic blocking +
    edit-distance pattern for entity resolution at scale. The block key
    bounds the quadratic pair scan to block-local work exactly like LSH
    bands bound the shingle scan; the operator's ``max_block_size`` cap
    handles degenerate blocks (uncapped here for exact oracle parity —
    the testdata has no pathological block)."""
    from ..operators.linkage import blocked_fuzzy_pairs

    part = load_table(spark, sf_dir, "part")
    block = F.concat_ws(
        "|",
        F.split(F.col("p_name"), " ").getItem(0),
        F.col("p_size").cast("string"),
    )
    return blocked_fuzzy_pairs(
        part, "p_partkey", "p_name", block, max_distance=4
    )


Q80_ORACLE = """
WITH base AS (
  SELECT p_partkey,
         p_name AS name,
         string_split(p_name, ' ')[1] || '|' || CAST(p_size AS VARCHAR) AS block
  FROM part
)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS distance
FROM base a JOIN base b ON a.block = b.block AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.name, b.name) <= 4
"""


def q81_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (operators/diff.py): diff orders against
    a synthetic next-day version (1/97 of keys deleted, 1/89 with a
    flipped status, one new key) and report every non-identical key.
    One full-outer hash join on the key over (key, md5 fingerprint)
    projections — each side shuffles once, no broadcast assumption."""
    from ..operators.diff import table_diff

    orders = load_table(spark, sf_dir, "orders")
    old = orders
    new = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 89 == 0, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .unionByName(
            local_rows_df(
                spark,
                [(999999999, 1, "O", 0.0, None, "1-URGENT")],
                orders.schema,
            )
        )
    )
    diff = table_diff(
        old,
        new,
        keys=["o_orderkey"],
        compare_cols=["o_orderstatus", "o_orderpriority", "o_custkey"],
    )
    return diff.filter(F.col("status") != "same")


Q81_ORACLE = """
WITH old AS (
  SELECT o_orderkey,
         md5(concat_ws(chr(31),
             COALESCE(CAST(o_orderstatus AS VARCHAR), chr(0) || '<null>'),
             COALESCE(CAST(o_orderpriority AS VARCHAR), chr(0) || '<null>'),
             COALESCE(CAST(o_custkey AS VARCHAR), chr(0) || '<null>'))) AS fp_old
  FROM orders
),
new AS (
  SELECT o_orderkey,
         md5(concat_ws(chr(31),
             COALESCE(CAST(CASE WHEN o_orderkey % 89 = 0 THEN 'X'
                                ELSE o_orderstatus END AS VARCHAR),
                      chr(0) || '<null>'),
             COALESCE(CAST(o_orderpriority AS VARCHAR), chr(0) || '<null>'),
             COALESCE(CAST(o_custkey AS VARCHAR), chr(0) || '<null>'))) AS fp_new
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT 999999999,
         md5(concat_ws(chr(31), 'O', '1-URGENT', '1'))
),
joined AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.fp_old, n.fp_new
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT o_orderkey,
       CASE WHEN fp_old IS NULL THEN 'added'
            WHEN fp_new IS NULL THEN 'removed'
            WHEN fp_old <> fp_new THEN 'changed'
            ELSE 'same' END AS status
FROM joined
WHERE (CASE WHEN fp_old IS NULL THEN 'added'
            WHEN fp_new IS NULL THEN 'removed'
            WHEN fp_old <> fp_new THEN 'changed'
            ELSE 'same' END) <> 'same'
"""


def q84_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature discretization: bin every order into its total-price
    quartile. The exact quartile boundaries come from ONE aggregation
    (Spark ``percentile`` == DuckDB ``quantile_cont``, bit-exact per
    q41); the 3-value boundary row then broadcasts into a narrow CASE
    per row — no second sort, no shuffle of the fact side. At 100 TB
    swap the boundary pass to approx_percentile, same shape."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.percentile("o_totalprice", 0.25).alias("q1"),
        F.percentile("o_totalprice", 0.5).alias("q2"),
        F.percentile("o_totalprice", 0.75).alias("q3"),
    )
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("o_totalprice") <= F.col("q1"), F.lit(1))
        .when(F.col("o_totalprice") <= F.col("q2"), F.lit(2))
        .when(F.col("o_totalprice") <= F.col("q3"), F.lit(3))
        .otherwise(F.lit(4))
        .cast("long")
        .alias("price_bin"),
        "o_totalprice",
    )
    return binned.groupBy("price_bin").agg(
        F.count(F.lit(1)).alias("nb_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


Q84_ORACLE = """
WITH bounds AS (
  SELECT quantile_cont(o_totalprice, 0.25) AS q1,
         quantile_cont(o_totalprice, 0.5) AS q2,
         quantile_cont(o_totalprice, 0.75) AS q3
  FROM orders
)
SELECT CASE WHEN o_totalprice <= q1 THEN 1
            WHEN o_totalprice <= q2 THEN 2
            WHEN o_totalprice <= q3 THEN 3
            ELSE 4 END AS price_bin,
       COUNT(*) AS nb_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders, bounds
GROUP BY 1
"""


def q86_cheapest_order_per_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q2 shape): each customer's
    cheapest order(s), written as the correlated form so Catalyst's
    decorrelation rewrite (subquery -> aggregate + join on the
    correlation key) is exercised — the physical plan is ONE grouped
    min plus one equi-join, not a per-row subquery execution."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__q86_orders")
    return spark.sql(
        """
        SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
        FROM __q86_orders o
        WHERE o.o_totalprice = (
            SELECT MIN(o2.o_totalprice)
            FROM __q86_orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


Q86_ORACLE = """
SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice = (
    SELECT MIN(o2.o_totalprice)
    FROM orders o2
    WHERE o2.o_custkey = o.o_custkey
)
"""


def q87_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): match
    events on the nullable JSON field ``props.k`` so NULL keys pair
    with NULL keys — the semantic a plain equi-join silently drops
    (NULL = NULL is never true). Counts matched pairs per key class.
    Null-safe equality stays a hashable join key in Spark (NULLs hash
    to one partition — skew-capped here by pre-aggregating each side to
    distinct keys + counts before the join, so the NULL group is one
    row, not a row explosion)."""
    from pyspark.sql.types import LongType, StructField, StructType

    ev = load_table(spark, sf_dir, "events")
    props_schema = StructType([StructField("k", LongType())])
    keyed = ev.select(
        F.from_json(F.col("props"), props_schema).getField("k").alias("k"),
    )
    counts_a = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("na"))
    counts_b = keyed.groupBy(F.col("k").alias("kb")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    return (
        counts_a.join(counts_b, F.col("k").eqNullSafe(F.col("kb")))
        .select(
            F.coalesce(F.col("k").cast("string"), F.lit("<null>")).alias(
                "key_class"
            ),
            (F.col("na") * F.col("nb")).alias("n_pairs"),
        )
        .groupBy("key_class")
        .agg(F.sum("n_pairs").cast("long").alias("n_pairs"))
    )


Q87_ORACLE = """
WITH keyed AS (
  SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
),
ca AS (SELECT k, COUNT(*) AS na FROM keyed GROUP BY k),
cb AS (SELECT k AS kb, COUNT(*) AS nb FROM keyed GROUP BY k)
SELECT COALESCE(CAST(k AS VARCHAR), '<null>') AS key_class,
       CAST(SUM(na * nb) AS BIGINT) AS n_pairs
FROM ca JOIN cb ON k IS NOT DISTINCT FROM kb
GROUP BY 1
"""


_EDGES_MEMO: dict[tuple[str, str], DataFrame] = {}

#: the queries sharing the memoized edge checkpoint; once ALL of them
#: have registered consumption the blocks are released (round-10
#: VERDICT #3 / SURVEY candidate #1)
_EDGES_CONSUMERS = frozenset({"q97_bfs_reachability", "q104_pagerank"})
_EDGES_CONSUMED: dict[tuple[str, str], set[str]] = {}


def _release_local_checkpoint(df: DataFrame) -> None:
    """Deterministically free the executor blocks behind an eager
    ``localCheckpoint``: the checkpointed Dataset's analyzed plan is a
    LogicalRDD whose backing RDD holds the cached blocks — unpersist
    it. The frame is DEAD afterwards (lineage was truncated at
    checkpoint time, so there is nothing to recompute from); callers
    must drop every reference. Transient per-call checkpoints don't
    need this — the ContextCleaner unpersists them once the driver
    references are garbage-collected — but a module-level memo keeps a
    strong reference for the application's lifetime, which round 9
    measured as block-manager pressure amplifying degraded-host stalls
    on the Arrow-heavy pair queries that run later in the suite."""
    df._jdf.queryExecution().analyzed().rdd().unpersist(False)


def _mark_edges_consumed(
    spark: SparkSession, sf_dir: str, consumer: str
) -> None:
    """Register that ``consumer`` finished MATERIALIZING its result
    from the memoized edge list (both q97 and q104 return eagerly
    checkpointed frames, so their results never read the edge blocks
    again). When every consumer in ``_EDGES_CONSUMERS`` has registered,
    the checkpoint is released and the memo entry dropped — a later
    call to ``_co_order_edges`` simply rebuilds, starting a new
    consumption cycle."""
    key = (spark.sparkContext.applicationId, sf_dir)
    seen = _EDGES_CONSUMED.setdefault(key, set())
    seen.add(consumer)
    if seen >= _EDGES_CONSUMERS:
        df = _EDGES_MEMO.pop(key, None)
        if df is not None:
            _release_local_checkpoint(df)
        _EDGES_CONSUMED.pop(key, None)


def _co_order_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed co-order part graph: parts sharing an order are
    neighbours (both directions present by construction). Built as ONE
    groupBy(l_orderkey) collect_set + a narrow double-explode of the
    per-order part set — the set is bounded by order size (<= 7 items
    in TPC-H), so collect_set state is constant per group and the pair
    fan-out stays |order|². This replaces the two-sided self-join
    shuffle with a single grouping shuffle (measured 5.6s -> 2.6s at
    sf0.1, identical 2.39M edges). Materialized once (eager
    localCheckpoint) because the iterative consumers (BFS hops,
    PageRank rounds) re-read it every round — without this each round
    re-runs the build — and memoized per (application, dataset)
    because q97 and q104 share the same deterministic edge list
    (applicationId key, same invalidation reasoning as
    clustering._CENTERS_MEMO)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _EDGES_MEMO:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        per_order = li.groupBy("l_orderkey").agg(
            F.collect_set("l_partkey").alias("ps")
        )
        _EDGES_MEMO[key] = (
            per_order.select(F.explode("ps").alias("src"), "ps")
            .select("src", F.explode("ps").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    return _EDGES_MEMO[key]


# Shared oracle CTE: the same co-order edge list in DuckDB.
_EDGES_CTE = """
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey
)
"""


def q97_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest hop-distance (<= 3) from the minimum part over the
    co-order graph (parts sharing an order are neighbours) — iterative
    BFS (``operators/graph.py::bfs_distances``) checked against a
    recursive-CTE oracle; the graph-traversal shape (impact analysis,
    recommendation radius, lineage walks) warehouses express with
    WITH RECURSIVE and Spark expresses as a frontier loop.

    Scale shape: edge building is one self-join of lineitem on
    l_orderkey (hash shuffle; per-order fan-out bounded by order size);
    each hop is frontier |x| edges keyed on src + an anti-join on the
    visited set; the seed is a 1-row aggregate DataFrame (never a
    driver-side min())."""
    from ..operators.graph import bfs_distances

    edges = _co_order_edges(spark, sf_dir)
    seeds = (
        load_table(spark, sf_dir, "part")
        .agg(F.min("p_partkey").alias("node"))
    )
    # bfs_distances eagerly checkpoints `visited` every hop, so `out`
    # is materialized independent of the edge blocks by the time it
    # returns — safe to register consumption (and possibly release the
    # shared checkpoint) before the driver collects.
    out = bfs_distances(edges, seeds, max_hops=3)
    _mark_edges_consumed(spark, sf_dir, "q97_bfs_reachability")
    return out.select("node", F.col("dist").cast("long").alias("dist"))


Q97_ORACLE = """
WITH RECURSIVE
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey
),
seed AS (SELECT MIN(p_partkey) AS node FROM part),
bfs(node, dist) AS (
  SELECT node, 0 FROM seed
  UNION
  SELECT e.dst, b.dist + 1
  FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.dist < 3
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
FROM bfs GROUP BY 1
"""


def q104_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (3 synchronous iterations, damping 0.85)
    over the co-order part graph — ``operators/graph.py::
    pagerank_fixed_point``. All-integer arithmetic (ranks in micros,
    FLOOR divisions) so the iterative float-summation drift that makes
    textbook PageRank unverifiable across engines cannot occur: DuckDB
    replays the exact same three unrolled iterations and every rank
    hash-matches.

    Scale shape: per iteration one rank|x|edges join (hash shuffle on
    src) + one groupBy-sum on dst, lineage cut per round — the Pregel
    cost model, nothing quadratic."""
    from ..operators.graph import pagerank_fixed_point

    edges = _co_order_edges(spark, sf_dir)
    # the returned ranks are eagerly checkpointed per iteration, so the
    # result never re-reads the edge blocks — consumption can register
    # (and release the shared checkpoint) before the driver collects
    out = pagerank_fixed_point(edges, n_iters=3)
    _mark_edges_consumed(spark, sf_dir, "q104_pagerank")
    return out


def _pagerank_oracle() -> str:
    # unrolled synchronous iterations: r_{i+1} from r_i; identical
    # integer arithmetic to the Spark operator (FLOOR divisions)
    iters = []
    prev = "r0"
    for i in range(1, 4):
        iters.append(
            f"""c{i} AS (
  SELECT e.dst AS node,
         CAST(SUM(FLOOR(r.rank_micros / d.out_deg)) AS BIGINT) AS in_sum
  FROM {prev} r
  JOIN deg d ON d.node = r.node
  JOIN edges e ON e.src = r.node
  GROUP BY 1
),
r{i} AS (
  SELECT n.node,
         CAST(150000 + FLOOR(85 * COALESCE(c.in_sum, 0) / 100) AS BIGINT)
           AS rank_micros
  FROM nodes n LEFT JOIN c{i} c ON c.node = n.node
)"""
        )
        prev = f"r{i}"
    return f"""
WITH {_EDGES_CTE.strip().rstrip()},
deg AS (SELECT src AS node, COUNT(*) AS out_deg FROM edges GROUP BY 1),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micros FROM nodes),
{",".join(iters)}
SELECT node, rank_micros FROM r3
"""




def q133_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksum of orders (key + status +
    priority + custkey): `operators/diff.py::table_checksum` — the
    one-scan migration-validation primitive (equal row multisets <=>
    equal (n_rows, checksum), up to md5 collisions). The DuckDB twin
    recomputes the identical 60-bit row hashes and exact decimal sum,
    proving the checksum is engine-portable — exactly what a
    cross-system migration check needs."""
    from ..operators.diff import table_checksum

    orders = load_table(spark, sf_dir, "orders")
    out = table_checksum(
        orders, ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_custkey"]
    )
    # checksums emitted as exact digit strings: DuckDB downcasts
    # DECIMAL(38) to float64 in pandas, which would corrupt the compare
    return out.select(
        "n_rows",
        F.col("checksum").cast("string").alias("checksum"),
        F.col("checksum_sq").cast("string").alias("checksum_sq"),
    )


_CK_COLS = ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_custkey"]
_CK_PARTS = ", ".join(
    f"COALESCE(CAST({c} AS VARCHAR), chr(0) || '<null>')" for c in _CK_COLS
)
Q133_ORACLE = f"""
WITH h AS (
  SELECT CAST(concat('0x',
              substring(md5(concat_ws(chr(31), {_CK_PARTS})), 1, 15))
         AS BIGINT) AS fp
  FROM orders
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(fp) AS VARCHAR) AS checksum,
       CAST(SUM((fp % 1073741789) * (fp % 1073741789)) AS VARCHAR)
         AS checksum_sq
FROM h
"""


OLAP_QUERIES = {
    "q79_grouping_sets": q79_grouping_sets,
    "q133_table_checksum": q133_table_checksum,
    "q80_blocked_fuzzy_match": q80_blocked_fuzzy_match,
    "q81_table_diff": q81_table_diff,
    "q84_quantile_binning": q84_quantile_binning,
    "q86_cheapest_order_per_customer": q86_cheapest_order_per_customer,
    "q87_null_safe_join": q87_null_safe_join,
    "q51_window_battery": q51_window_battery,
    "q52_order_status_pivot": q52_order_status_pivot,
    "q53_late_shipment_priority": q53_late_shipment_priority,
    "q54_json_props": q54_json_props,
    "q55_unpivot_measures": q55_unpivot_measures,
    "q57_rollup_order_totals": q57_rollup_order_totals,
    "q72_cube_priority_status": q72_cube_priority_status,
    "q58_promo_revenue_share": q58_promo_revenue_share,
    "q97_bfs_reachability": q97_bfs_reachability,
    "q104_pagerank": q104_pagerank,
}

OLAP_ORACLES = {
    "q79_grouping_sets": Q79_ORACLE,
    "q133_table_checksum": Q133_ORACLE,
    "q81_table_diff": Q81_ORACLE,
    "q84_quantile_binning": Q84_ORACLE,
    "q86_cheapest_order_per_customer": Q86_ORACLE,
    "q87_null_safe_join": Q87_ORACLE,
    "q80_blocked_fuzzy_match": Q80_ORACLE,
    "q51_window_battery": Q51_ORACLE,
    "q52_order_status_pivot": Q52_ORACLE,
    "q53_late_shipment_priority": Q53_ORACLE,
    "q54_json_props": Q54_ORACLE,
    "q55_unpivot_measures": Q55_ORACLE,
    "q57_rollup_order_totals": Q57_ORACLE,
    "q72_cube_priority_status": Q72_ORACLE,
    "q58_promo_revenue_share": Q58_ORACLE,
    "q97_bfs_reachability": Q97_ORACLE,
    "q104_pagerank": _pagerank_oracle(),
}
