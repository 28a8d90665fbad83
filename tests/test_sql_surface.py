"""The SQL surface must agree row-for-row with the DataFrame plans."""

from __future__ import annotations

import pytest

from data_integration_openfoodfacts_spark.plans.registry import QUERIES
from data_integration_openfoodfacts_spark.plans.sql_surface import (
    SQL_QUERIES,
    run_sql,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(SQL_QUERIES))
def test_sql_matches_dataframe(spark, name):
    got = run_sql(spark, SF_DIR, name)
    want = QUERIES[name](spark, SF_DIR)
    assert sorted(got.columns) == sorted(want.columns)
    g = sorted(map(tuple, got.select(*sorted(got.columns)).collect()))
    w = sorted(map(tuple, want.select(*sorted(want.columns)).collect()))
    assert g == w
