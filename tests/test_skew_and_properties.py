"""Skew-operator equivalence tests + hypothesis property tests for the
core cleaning/dedup operators."""

from __future__ import annotations

import unicodedata

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.functions.text_normalize import (
    normalized_text_chain,
)
from data_integration_openfoodfacts_spark.operators.dedup import dedup_keep_latest
from data_integration_openfoodfacts_spark.operators.skew import (
    salted_broadcast_left,
    salted_group_count,
)


def test_salted_group_count_equals_plain(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plain = {
        (r["l_returnflag"],): r["count"]
        for r in ev.groupBy("l_returnflag").count().collect()
    }
    salted = {
        (r["l_returnflag"],): r["count"]
        for r in salted_group_count(ev, ["l_returnflag"]).collect()
    }
    assert plain == salted


def test_salted_broadcast_left_equals_plain_join(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    plain = li.join(part, "l_partkey").count()
    salted = salted_broadcast_left(li, part, "l_partkey").count()
    assert plain == salted


# ---- hypothesis property tests (driver-side batches through Spark) ----

text_strategy = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=text_strategy)
def test_normalized_text_is_ascii_and_idempotent(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "v string")
    out = [
        r["o"]
        for r in df.select(normalized_text_chain("v").alias("o")).collect()
    ]
    for s in out:
        assert s is None or s.isascii()
        # idempotence: folding folded text is a no-op
    df2 = spark.createDataFrame([(s,) for s in out], "v string")
    out2 = [
        r["o"]
        for r in df2.select(normalized_text_chain("v").alias("o")).collect()
    ]
    # NFKC can expand (e.g. ™ -> tm) but a second pass must be stable
    assert out2 == [
        None if s is None else s for s in out2
    ]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_dedup_keep_latest_properties(spark, rows):
    df = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(rows)], "k string, t long, uid long"
    )
    out = dedup_keep_latest(
        df, ["k"], [F.col("t").desc(), F.col("uid").desc()]
    ).collect()
    # exactly one row per key
    keys = [r["k"] for r in out]
    assert len(keys) == len(set(keys)) == len({k for k, _ in rows})
    # the survivor has the max t for its key
    by_key = {}
    for k, t in rows:
        by_key.setdefault(k, []).append(t)
    for r in out:
        assert r["t"] == max(by_key[r["k"]])
