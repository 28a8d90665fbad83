"""Pipeline-level data-quality suite: run the reference's validation
tests T1-T4 (docs/quality_report.md:516-572) as one report.

Usage:
    report = run_dq_suite(result.tables)
    assert report["passed"], report
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from ..operators.dq import (
    assert_count_parity,
    assert_no_orphans,
    assert_unique,
    assert_within_bounds,
)
from ..operators.validation import NUTRIENT_BOUNDS


def run_dq_suite(tables: dict[str, DataFrame]) -> dict[str, Any]:
    """T1 PK uniqueness, T2 referential integrity, T3 count parity,
    T4 range survival — each a violation count (0 == pass)."""
    silver = tables["silver_products"]
    fact = tables["fact_nutrition_snapshot"]
    checks: dict[str, int] = {
        "t1_unique_silver_code": assert_unique(silver, ["code"]),
        "t1_unique_product_code": assert_unique(tables["dim_product"], ["code"]),
        "t1_unique_brand_name": assert_unique(tables["dim_brand"], ["brand_name"]),
        "t1_unique_category_name": assert_unique(
            tables["dim_category"], ["category_name"]
        ),
        "t2_fact_product_orphans": assert_no_orphans(
            fact, tables["dim_product"], "product_sk"
        ),
        "t2_fact_time_orphans": assert_no_orphans(
            fact, tables["dim_time"], "time_sk"
        ),
        "t3_silver_vs_dim_product": assert_count_parity(
            silver, tables["dim_product"]
        ),
        "t3_silver_vs_fact": assert_count_parity(silver, fact),
        "t4_fact_bounds": assert_within_bounds(
            fact, {k: v for k, v in NUTRIENT_BOUNDS.items() if k != "completeness"}
        ),
    }
    return {"passed": all(v == 0 for v in checks.values()), "checks": checks}
