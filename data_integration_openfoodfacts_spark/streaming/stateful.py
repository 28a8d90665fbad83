"""Custom stateful streaming operator via ``applyInPandasWithState``.

``session_window``/windowed aggs cover the declarative cases; this is
the arbitrary-state-machine escape hatch (SURVEY.md: "custom stateful
operators"). The example operator keeps per-user running totals across
micro-batches — the pattern generalizes to CDC accumulators, fraud
counters, dedup-seen-sets, etc.

Scale notes: state lives in the state store partitioned by key (RocksDB
in production — fixed memory per executor); processing is Arrow-batched
per key group. A timeout (here: none) is how unbounded keyspaces get
evicted at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (event count, value sum), updated every
    micro-batch; state persists across batches via the state store."""

    # Nested so cloudpickle ships it by value (workers don't import us).
    def update_totals(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
