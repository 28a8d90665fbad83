"""Phrase search (`operators/phrase_search.py`): adjacency/order
semantics, overlapping matches, position indexing, single-pass
multi-phrase ranking, and the narrow (no-shuffle-before-topk) plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.phrase_search import (
    phrase_hits,
    phrase_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _hits(spark, rows, phrase):
    return {
        r["doc_id"]: (r["tf"], r["first_pos"])
        for r in phrase_hits(
            _docs(spark, rows), "doc_id", "text", phrase
        ).collect()
    }


def test_adjacency_and_order_required(spark):
    rows = [
        (1, "full table scan here"),          # match at pos 2
        (2, "table full scan"),               # words present, not adjacent
        (3, "scan table"),                    # wrong order
        (4, "table scan and table scan"),     # two matches
        (5, "table"),                         # shorter than the phrase
    ]
    got = _hits(spark, rows, "table scan")
    assert got == {1: (1, 2), 4: (2, 1)}


def test_overlapping_matches_all_count(spark):
    got = _hits(spark, [(1, "a a a a")], "a a")
    assert got == {1: (3, 1)}


def test_topk_ranks_by_tf_with_unique_tiebreak(spark):
    rows = [
        (1, "x y x y x y"),   # tf 3
        (2, "x y x y"),       # tf 2
        (3, "x y"),           # tf 1
        (4, "x y"),           # tf 1 (tie with 3 -> md5 order)
        (5, "nothing here"),
    ]
    out = phrase_topk(_docs(spark, rows), "doc_id", "text", ["x y"], 3)
    ranked = [(r["rank"], r["doc_id"], r["tf"]) for r in out.collect()]
    ranked.sort()
    assert [r[1] for r in ranked[:2]] == [1, 2]
    assert ranked[2][2] == 1 and ranked[2][1] in (3, 4)
    assert len(ranked) == 3


def test_multi_phrase_single_scan(spark):
    """All phrases ride one scan: the plan below the top-k window has
    no shuffle (Exchange appears only for the window itself)."""
    rows = [(1, "a b c"), (2, "b c d")]
    out = phrase_topk(
        _docs(spark, rows), "doc_id", "text", ["a b", "b c", "c d"], 5
    )
    got = {(r["phrase"], r["doc_id"]) for r in out.collect()}
    assert got == {("a b", 1), ("b c", 1), ("b c", 2), ("c d", 2)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only repartitioning is the per-phrase window's — nothing
    # shuffles between the scan and the top-k (under AQE the plan
    # string repeats the exchange in initial+final form, so pin the
    # KEY of every exchange rather than the count)
    import re

    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert keys and set(keys) == {"phrase"}, plan


def test_oracle_block_matches_spark_at_text_end(spark):
    """Regression (round 11): the q187 DuckDB oracle used a
    stop-EXCLUSIVE range(1, len-(n-1)) and silently dropped any match
    ending at the LAST token (doc == phrase, or trailing hit) — a
    latent gate mismatch the testdata happened not to trigger. Pin the
    generated oracle block against Spark on exactly those shapes."""
    import duckdb

    from data_integration_openfoodfacts_spark.plans.phrase_queries import (
        _phrase_block,
    )

    rows = [
        (1, "hash join"),            # doc IS the phrase
        (2, "a hash join"),          # hit ends at the last token
        (3, "hash join wins"),       # interior hit
        (4, "hash join hash join"),  # tf 2, second hit at text end
        (5, "join hash"),            # wrong order
    ]
    got = _hits(spark, rows, "hash join")
    assert got == {1: (1, 1), 2: (1, 2), 3: (1, 1), 4: (2, 1)}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") v(doc_id, text)"
    )
    sql = (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t"
        " FROM documents) " + _phrase_block("hash join")
    )
    oracle = {
        r[1]: (r[2], r[3]) for r in con.execute(sql).fetchall()
    }
    assert oracle == got


def test_argument_validation(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError, match="at least one token"):
        phrase_hits(df, "doc_id", "text", "")
    with pytest.raises(ValueError, match="at least one phrase"):
        phrase_topk(df, "doc_id", "text", [], 3)
