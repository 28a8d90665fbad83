"""Plan-shape pins for the round-11 query surface (the lazy ones —
q192/q194 run store lifecycles on call; their plan properties are
pinned by the stream/store test suites instead): no cartesian
products, no row-at-a-time Python, broadcast where a small side
exists, and the scale-relevant exchange keys."""

from __future__ import annotations

import re

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q193_operating_points_plan(spark):
    from data_integration_openfoodfacts_spark.plans.retrieval_profile_queries import (  # noqa: E501
        q193_retrieval_operating_points,
    )

    plan = _plan(q193_retrieval_operating_points(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # signatures are Arrow-batched
    # the exact baselines ride broadcast nested loops (small query side)
    assert "BroadcastNestedLoopJoin" in plan


def test_q196_calibration_plan(spark):
    from data_integration_openfoodfacts_spark.plans.quality_calibration_queries import (  # noqa: E501
        q196_classifier_rule_calibration,
    )

    plan = _plan(q196_classifier_rule_calibration(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the 4096-row weight table must broadcast into the token join,
    # never shuffle the exploded token stream against it
    assert "BroadcastHashJoin" in plan
    # no global-sort decile window: banding is a per-row floor, so no
    # single-partition Exchange anywhere in the plan
    assert "Exchange SinglePartition" not in plan


def test_q197_drift_plan(spark):
    from data_integration_openfoodfacts_spark.plans.drift_queries import (
        q197_source_drift_monitor,
    )

    plan = _plan(q197_source_drift_monitor(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_q195_repetition_exchange_keys(spark):
    """The gram pipeline shuffles on the doc/gram keys only — the
    corpus never joins itself."""
    from data_integration_openfoodfacts_spark.plans.repetition_queries import (  # noqa: E501
        q195_repetition_rules,
    )

    plan = _plan(q195_repetition_rules(spark, SF))
    assert "CartesianProduct" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    # (doc_id, k, gram) + (doc_id) for the gram counts, plus the final
    # flag cross-tab's computed grouping expressions — nothing else
    assert keys <= {"doc_id", "_groupingexpression"}, keys
