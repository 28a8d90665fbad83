"""Smoke: every registered query runs at sf0.001 and returns a stable,
non-degenerate schema; every oracle parses in DuckDB."""

from __future__ import annotations

import duckdb
import pytest

from data_integration_openfoodfacts_spark.plans.registry import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_oracles_parse_in_duckdb():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    for name, sql in ORACLES.items():
        con.execute(sql).fetchone()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)
