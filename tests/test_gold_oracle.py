"""q89-q94: real-pipeline gold analytics vs the DuckDB pipeline-replica
oracle, plus the invariants the oracle's fidelity depends on."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest

from data_integration_openfoodfacts_spark.plans.gold_oracle_queries import (
    FIXTURE_PATH,
    FOLD_MAP,
    GOLD_ORACLE_ORACLES,
    GOLD_ORACLE_QUERIES,
    _gold_tables,
)


def _py_ascii_fold(s: str) -> str:
    return (
        unicodedata.normalize("NFD", unicodedata.normalize("NFKC", s))
        .encode("ascii", "ignore")
        .decode("ascii")
    )


def _map_fold(s: str) -> str:
    for src, dst in FOLD_MAP:
        s = s.replace(src, dst)
    return s


def test_fold_inventory_closed():
    """Every non-ASCII character in the fixture must be in FOLD_MAP and
    the map image must equal the real NFKC->NFD->ascii-ignore fold — the
    oracle's replace() chain silently diverges otherwise. Checks BOTH
    clean orders (fold-then-lower and lower-then-fold)."""
    text = open(FIXTURE_PATH, encoding="utf-8").read()
    mapped = {src for src, _ in FOLD_MAP}
    for ch in set(text):
        if not ch.isascii():
            assert ch in mapped, f"fixture char {ch!r} missing from FOLD_MAP"
    for value in set(text.replace("\t", "\n").split("\n")):
        assert _map_fold(value) == _py_ascii_fold(value), value
        low = value.lower()
        assert _map_fold(low) == _py_ascii_fold(low), low


def test_duplicate_codes_never_tie_on_timestamp():
    """The keep-latest tiebreaker (xxhash64) is not SQL-replicable; the
    fixture must keep (code, last_modified_t) unique so it never fires."""
    con = duckdb.connect()
    ties = con.execute(
        f"""SELECT code, last_modified_t, COUNT(*) FROM read_csv(
            '{FIXTURE_PATH}', delim='\t', header=true, all_varchar=true)
            WHERE code IS NOT NULL AND code <> '' AND code <> 'null'
            GROUP BY 1, 2 HAVING COUNT(*) > 1"""
    ).fetchall()
    assert ties == []


def test_silver_nutriscore_never_null(spark):
    """Pins the invariant gold_analytics Q1/Q2 rely on to omit the
    reference's ``WHERE nutriscore_grade IS NOT NULL``
    (requetes_analytiques.sql:12,27): imputation makes it a no-op. If a
    future imputation change breaks this, Q1/Q2 must add the filter."""
    silver = _gold_tables(spark)["silver_products"]
    assert silver.filter("nutriscore_grade IS NULL").count() == 0
    assert silver.count() > 250  # fixture-scale, not a toy


@pytest.mark.parametrize("name", sorted(GOLD_ORACLE_QUERIES))
def test_gold_query_matches_oracle(spark, name):
    """Spark real-pipeline output == DuckDB full-pipeline replica, value
    for value (the in-repo twin of the driver's hash gate)."""
    sdf = GOLD_ORACLE_QUERIES[name](spark, "unused").toPandas()
    ddf = duckdb.connect().execute(GOLD_ORACLE_ORACLES[name]).df()
    assert len(sdf) == len(ddf), name
    assert sorted(sdf.columns) == sorted(ddf.columns), name
    cols = sorted(sdf.columns)

    def canon(df):
        rows = []
        for row in df[cols].itertuples(index=False):
            rows.append(
                "|".join(
                    f"{v:.10g}" if isinstance(v, float) else repr(v)
                    for v in row
                )
            )
        return sorted(rows)

    assert canon(sdf) == canon(ddf), name
