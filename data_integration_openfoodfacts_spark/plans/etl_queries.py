"""ETL operators from SURVEY.md §2 expressed as verifiable queries over
the driver's testdata, each with a DuckDB oracle.

These exercise the engine's operator library (operators/*, functions/*)
on the synthetic tables so the driver's correctness gate covers the same
codepaths the OpenFoodFacts medallion pipeline (plans/pipeline.py) uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cleaning import clean_text_chain, impute_with_default
from ..operators.dedup import dedup_keep_latest
from ..operators.keys import add_surrogate_key
from ..operators.validation import bounded_expr
from ..sources.parquet_source import load_events, load_table


def q7_dim_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_time build: distinct timestamps -> calendar parts + surrogate
    key. Reference: pipeline_etl.ipynb:496-505 (A3/D2-D4) + §2.12 SK.
    The reference duplicates weekofyear into both ``week`` and
    ``iso_week`` (pipeline_etl.ipynb:504-505) — kept for parity."""
    orders = load_table(spark, sf_dir, "orders")
    dates = orders.select(F.to_date("o_orderdate").alias("date")).distinct()
    dim = dates.select(
        F.col("date").cast("string").alias("date_iso"),
        "date",
        F.year("date").cast("long").alias("year"),
        F.month("date").cast("long").alias("month"),
        F.dayofmonth("date").cast("long").alias("day"),
        F.weekofyear("date").cast("long").alias("week"),
        F.weekofyear("date").cast("long").alias("iso_week"),
    ).drop("date")
    return add_surrogate_key(dim, "time_sk", ["date_iso"])


Q7_ORACLE = """
SELECT CAST(date AS VARCHAR) AS date_iso,
       CAST(YEAR(date) AS BIGINT) AS year,
       CAST(MONTH(date) AS BIGINT) AS month,
       CAST(DAY(date) AS BIGINT) AS day,
       CAST(WEEKOFYEAR(date) AS BIGINT) AS week,
       CAST(WEEKOFYEAR(date) AS BIGINT) AS iso_week,
       CAST(ROW_NUMBER() OVER (ORDER BY CAST(date AS VARCHAR)) AS BIGINT) AS time_sk
FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS date FROM orders)
"""


def q8_events_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup per user — THE canonical reference dedup (W1,
    pipeline_etl.ipynb:425-429): window row_number over (key, ts desc),
    with event_id as the deterministic tiebreaker the reference lacks."""
    events = load_events(spark, sf_dir)
    # Order on the micro-precision normalized ts (load_events) — the
    # same granularity the oracle engine sees — with event_id breaking
    # same-microsecond ties deterministically.
    latest = dedup_keep_latest(
        events,
        keys=["user_id"],
        order_by=[F.col("ts").desc(), F.col("event_id").desc()],
    )
    return latest.select("user_id", "event_id", "event_type", "value")


Q8_ORACLE = """
SELECT user_id, event_id, event_type, value
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def q9_dim_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_brand build: distinct non-empty names, truncation, row_number
    surrogate key (pipeline_etl.ipynb:510-517,553; §2.12)."""
    part = load_table(spark, sf_dir, "part")
    brands = (
        part.select(F.substring(F.col("p_brand"), 1, 500).alias("brand_name"))
        .filter(F.col("brand_name").isNotNull() & (F.col("brand_name") != ""))
        .distinct()
    )
    return add_surrogate_key(brands, "brand_sk", ["brand_name"])


Q9_ORACLE = """
SELECT brand_name, CAST(ROW_NUMBER() OVER (ORDER BY brand_name) AS BIGINT) AS brand_sk
FROM (SELECT DISTINCT substring(p_brand, 1, 500) AS brand_name
      FROM part WHERE p_brand IS NOT NULL AND p_brand <> '')
"""


def q10_orphan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity anti join (reference DQ test T2,
    docs/quality_report.md:536-544): events whose user has no customer
    row. LEFT ANTI join — at scale the distinct dim-key side is small
    and broadcast."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    cust_keys = customer.select(F.col("c_custkey").alias("user_id")).distinct()
    orphans = events.join(F.broadcast(cust_keys), "user_id", "left_anti")
    return orphans.groupBy(F.col("event_type").alias("event_type")).agg(
        F.count(F.lit(1)).alias("nb_orphans")
    )


Q10_ORACLE = """
SELECT event_type, COUNT(*) AS nb_orphans
FROM events e
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
GROUP BY event_type
"""


def q11_clean_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native text-cleaning chain F2+F5 (pipeline_etl.ipynb:212-234) +
    whitespace token count: strip non-alphanumerics, lower, trim,
    collapse spaces, truncate to 255."""
    docs = load_table(spark, sf_dir, "documents")
    cleaned = clean_text_chain("text", max_len=255)
    return docs.select(
        "doc_id",
        cleaned.alias("clean_text"),
        F.size(F.split(cleaned, " ")).cast("long").alias("n_tokens"),
    )


# DuckDB regexp_replace is first-match unless the 'g' flag is set.
Q11_ORACLE = """
SELECT doc_id,
       substring(regexp_replace(trim(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))), '\\s+', ' ', 'g'), 1, 255) AS clean_text,
       CAST(len(string_split(substring(regexp_replace(trim(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))), '\\s+', ' ', 'g'), 1, 255), ' ')) AS BIGINT) AS n_tokens
FROM documents
"""


def q12_impute_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invalid-token NULLing + default imputation P5/P6
    (pipeline_etl.ipynb:268-302): ``coalesce(valid(main),
    valid(fallback), default)``. ``nullif(lang,'es')`` manufactures the
    missing-main case on clean synthetic data."""
    docs = load_table(spark, sf_dir, "documents")
    imputed = impute_with_default(
        F.nullif(F.col("lang"), F.lit("es")),
        default="non classe",
        fallback=F.col("source"),
    )
    return docs.select("doc_id", "lang", imputed.alias("lang_imputed"))


Q12_ORACLE = """
SELECT doc_id, lang,
       COALESCE(
         CASE WHEN NULLIF(lang, 'es') IS NOT NULL
                   AND lower(NULLIF(lang, 'es')) NOT IN ('undefined','null','unknown','none','n/a','')
              THEN NULLIF(lang, 'es') END,
         CASE WHEN source IS NOT NULL
                   AND lower(source) NOT IN ('undefined','null','unknown','none','n/a','')
              THEN source END,
         'non classe') AS lang_imputed
FROM documents
"""


def q13_bounded_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range validation P4 (pipeline_etl.ipynb:348-363): out-of-bounds
    values -> NULL, row kept; then per-type survivor stats (A7)."""
    events = load_table(spark, sf_dir, "events")
    bounded = events.select(
        "event_type", bounded_expr("value", 0.0, 100.0).alias("value_ok")
    )
    return bounded.groupBy(F.col("event_type").alias("event_type")).agg(
        F.count(F.lit(1)).alias("nb_events"),
        F.count("value_ok").alias("nb_in_bounds"),
        F.try_divide(
            F.sum(F.col("value_ok").cast("decimal(18,6)")).cast("double"),
            F.count("value_ok"),
        ).alias("avg_in_bounds"),
    )


Q13_ORACLE = """
SELECT event_type, COUNT(*) AS nb_events,
       COUNT(CASE WHEN value >= 0 AND value <= 100 THEN value END) AS nb_in_bounds,
       CAST(SUM(CAST(CASE WHEN value >= 0 AND value <= 100 THEN value END AS DECIMAL(18,6))) AS DOUBLE)
             / NULLIF(COUNT(CASE WHEN value >= 0 AND value <= 100 THEN value END), 0) AS avg_in_bounds
FROM events
GROUP BY event_type
"""


def q14_derived_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic derivation + unit conversion + rounding M1-M3
    (pipeline_etl.ipynb:365-391: sodium*2.5, kcal*4.184, round(x,1))."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # revenue/charged stay raw doubles: identical IEEE operand chains are
    # bit-identical across engines, while round() at a near-midpoint is
    # not. quantity_kj CAN be rounded safely: integer*4.184 never lands
    # on a .x5 midpoint (184k ≡ 50 mod 1000 has no solution).
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charged"),
        F.round(F.col("l_quantity") * 4.184, 1).alias("quantity_kj"),
    )


Q14_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
       ROUND(l_quantity * 4.184, 1) AS quantity_kj
FROM lineitem
"""


def q15_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array split + explode + grouped count + deterministic top-k
    (F6/AR1/AR3/O3; split at pipeline_etl.ipynb:304-307, top-k at
    requetes_analytiques.sql:15-16)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("nb_occurrences"))
        .orderBy(F.desc("nb_occurrences"), F.asc("word"))
        .limit(20)
    )


Q15_ORACLE = """
SELECT w.word AS word, COUNT(*) AS nb_occurrences
FROM documents d, LATERAL (SELECT UNNEST(string_split(d.text, ' ')) AS word) w
GROUP BY w.word
ORDER BY nb_occurrences DESC, word ASC
LIMIT 20
"""


def q16_distinct_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct projection A3 (pipeline_etl.ipynb:496,511)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("lang", "source").distinct()


Q16_ORACLE = "SELECT DISTINCT lang, source FROM documents"


def q17_run_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's run-metrics block (pipeline_etl.ipynb:708-717:
    counts, avg completeness, predicate counts) computed in ONE
    aggregation pass instead of 5 separate actions (SURVEY.md §3.3)."""
    events = load_table(spark, sf_dir, "events")
    # sum_value is the double cast of an EXACT decimal sum (bit-identical
    # across engines); the consumer divides sum_value / nb_rows for the
    # average. Hashing a post-division double is engine-divergent at the
    # last ulp (round-1 q17 lesson), so no division happens here.
    return events.agg(
        F.count(F.lit(1)).alias("nb_rows"),
        F.countDistinct("user_id").cast("long").alias("nb_users"),
        F.sum((F.col("value") > 100).cast("long")).alias("nb_high_value"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )


Q17_ORACLE = """
SELECT COUNT(*) AS nb_rows,
       COUNT(DISTINCT user_id) AS nb_users,
       CAST(SUM(CAST(value > 100 AS BIGINT)) AS BIGINT) AS nb_high_value,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
"""

def q30_unixtime_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 alternate date path (pipeline_etl.ipynb:497): unix seconds ->
    from_unixtime -> date, session timezone pinned UTC. Counts events
    per derived calendar date."""
    events = load_events(spark, sf_dir)
    secs = F.expr("ts_ns div 1000000000")
    date_s = F.from_unixtime(secs).cast("date").cast("string")
    return (
        events.select(date_s.alias("event_date"))
        .groupBy("event_date")
        .agg(F.count(F.lit(1)).alias("nb_events"))
    )


Q30_ORACLE = """
SELECT CAST(CAST(to_timestamp(epoch_ns(ts) // 1000000000) AS DATE) AS VARCHAR) AS event_date,
       COUNT(*) AS nb_events
FROM events
GROUP BY 1
"""


def q31_mixed_join_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: INNER + LEFT join mix with a non-equi condition producing
    NULLs on the left side (the reference's example query shape,
    data_dictionary.md:434-448)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    big_parts = part.filter(F.col("p_size") > 47).select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    j = lineitem.join(
        F.broadcast(orders.select("o_orderkey", "o_orderstatus")),
        lineitem.l_orderkey == orders.o_orderkey,
        "inner",
    ).join(F.broadcast(big_parts), "l_partkey", "left")
    return j.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.col("p_brand").isNotNull().cast("long").alias("has_big_part"),
    ).agg(F.count(F.lit(1)).alias("nb_lines"))


Q31_ORACLE = """
SELECT o.o_orderstatus AS status,
       CAST(p.p_brand IS NOT NULL AS BIGINT) AS has_big_part,
       COUNT(*) AS nb_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
LEFT JOIN (SELECT p_partkey, p_brand FROM part WHERE p_size > 47) p
       ON p.p_partkey = l.l_partkey
GROUP BY 1, 2
"""


def q41_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, verified bit-exact). The exact form sorts
    within groups; at 100 TB swap to ``approx_percentile`` (t-digest
    sketch, map-side combinable) — same call shape."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count(F.lit(1)).alias("nb_lines"),
        F.percentile("l_extendedprice", 0.5).alias("p50_price"),
        F.percentile("l_extendedprice", 0.95).alias("p95_price"),
    )


Q41_ORACLE = """
SELECT l_returnflag AS returnflag, COUNT(*) AS nb_lines,
       quantile_cont(l_extendedprice, 0.5) AS p50_price,
       quantile_cont(l_extendedprice, 0.95) AS p95_price
FROM lineitem
GROUP BY 1
"""


def q102_approx_percentile_bounds(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """t-digest ``approx_percentile`` under a rank-error-bound oracle —
    q100's pattern (sketch computed by Spark, invariant independently
    checkable): the approximate p50/p90 must land inside the EXACT
    [p48, p52] / [p88, p92] windows (DuckDB recomputes the exact bounds
    with ``quantile_cont``, bit-equal to Spark's ``percentile`` — the
    q41-verified pairing; accuracy=10000 gives rank error <= 1e-4, a
    ~200x margin on the +-0.02 windows, so the gate is stable).

    Scale: exact percentiles sort every group; the t-digest is a
    fixed-size mergeable sketch, map-side combined — THE quantile
    operator at 100 TB. The exact columns exist to power the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    # array-argument percentile: ONE sort per group serves all four
    # exact quantiles, one t-digest serves both approx ones (vs a
    # buffer per scalar call — 4.4s -> ~2s at sf0.1)
    g = (
        li.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.expr(
                "percentile(l_extendedprice, "
                "array(0.48D, 0.52D, 0.88D, 0.92D))"
            ).alias("pe"),
            F.expr(
                "approx_percentile(l_extendedprice, "
                "array(0.5D, 0.9D), 10000)"
            ).alias("pa"),
        )
        .select(
            "returnflag",
            F.col("pe")[0].alias("p48_exact"),
            F.col("pe")[1].alias("p52_exact"),
            F.col("pe")[2].alias("p88_exact"),
            F.col("pe")[3].alias("p92_exact"),
            F.col("pa")[0].alias("p50_approx"),
            F.col("pa")[1].alias("p90_approx"),
        )
    )
    viol = (
        (F.col("p50_approx") < F.col("p48_exact"))
        | (F.col("p50_approx") > F.col("p52_exact"))
        | (F.col("p90_approx") < F.col("p88_exact"))
        | (F.col("p90_approx") > F.col("p92_exact"))
    )
    return g.select(
        "returnflag",
        "p48_exact",
        "p52_exact",
        "p88_exact",
        "p92_exact",
        viol.cast("long").alias("violation"),
    )


Q102_ORACLE = """
SELECT l_returnflag AS returnflag,
       quantile_cont(l_extendedprice, 0.48) AS p48_exact,
       quantile_cont(l_extendedprice, 0.52) AS p52_exact,
       quantile_cont(l_extendedprice, 0.88) AS p88_exact,
       quantile_cont(l_extendedprice, 0.92) AS p92_exact,
       CAST(0 AS BIGINT) AS violation
FROM lineitem
GROUP BY 1
"""


def q45_dim_country(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_country build through the PRODUCTION builder
    (plans/pipeline.build_dim_country): a comma-joined multi-value
    geo string per customer (nation, region — the testdata stand-in for
    OFF's ``countries_en``) is split to an array, exploded to DISTINCT
    country names, and surrogate-keyed. Oracle-pins the engine's
    deliberate divergence from the reference's one-row-per-product
    no-dedup shape (pipeline_etl.ipynb:523-525; see the builder's
    docstring)."""
    from .pipeline import build_dim_country

    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = (
        customer.join(
            F.broadcast(nation),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
        )
        .select(
            F.split(F.concat_ws(", ", "n_name", "r_name"), ",\\s*").alias(
                "countries_en"
            )
        )
    )
    return build_dim_country(base)


Q45_ORACLE = """
SELECT country_name,
       CAST(ROW_NUMBER() OVER (ORDER BY country_name) AS BIGINT) AS country_sk
FROM (
  SELECT DISTINCT u.x AS country_name
  FROM (SELECT n_name || ', ' || r_name AS cs
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey) t,
  LATERAL (SELECT UNNEST(string_split_regex(cs, ',\\s*')) AS x) u
  WHERE u.x IS NOT NULL AND u.x <> ''
)
"""


ETL_QUERIES = {
    "q7_dim_time": q7_dim_time,
    "q8_events_keep_latest": q8_events_keep_latest,
    "q9_dim_brand": q9_dim_brand,
    "q10_orphan_events": q10_orphan_events,
    "q11_clean_documents": q11_clean_documents,
    "q12_impute_lang": q12_impute_lang,
    "q13_bounded_event_values": q13_bounded_event_values,
    "q14_derived_measures": q14_derived_measures,
    "q15_top_words": q15_top_words,
    "q16_distinct_lang_source": q16_distinct_lang_source,
    "q17_run_metrics": q17_run_metrics,
    "q30_unixtime_dates": q30_unixtime_dates,
    "q31_mixed_join_null_handling": q31_mixed_join_null_handling,
    "q41_price_percentiles": q41_price_percentiles,
    "q102_approx_percentile_bounds": q102_approx_percentile_bounds,
    "q45_dim_country": q45_dim_country,
}

ETL_ORACLES = {
    "q7_dim_time": Q7_ORACLE,
    "q8_events_keep_latest": Q8_ORACLE,
    "q9_dim_brand": Q9_ORACLE,
    "q10_orphan_events": Q10_ORACLE,
    "q11_clean_documents": Q11_ORACLE,
    "q12_impute_lang": Q12_ORACLE,
    "q13_bounded_event_values": Q13_ORACLE,
    "q14_derived_measures": Q14_ORACLE,
    "q15_top_words": Q15_ORACLE,
    "q16_distinct_lang_source": Q16_ORACLE,
    "q17_run_metrics": Q17_ORACLE,
    "q30_unixtime_dates": Q30_ORACLE,
    "q31_mixed_join_null_handling": Q31_ORACLE,
    "q41_price_percentiles": Q41_ORACLE,
    "q102_approx_percentile_bounds": Q102_ORACLE,
    "q45_dim_country": Q45_ORACLE,
}
