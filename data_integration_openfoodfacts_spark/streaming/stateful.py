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
    StringType,
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


TRANSITIONS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("prev_type", StringType()),
        StructField("event_type", StringType()),
        StructField("n_steps", LongType()),
    ]
)

_LAST_EVENT_STATE = StructType(
    [
        StructField("last_ts_ns", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_type", StringType()),
    ]
)


def user_transitions_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the q83 transition matrix: per-user
    (prev_type -> event_type) step counts, emitted per micro-batch.

    The lag that batch mode gets from a window function needs STATE
    here — the last event of each user must survive across micro-batch
    boundaries, or every batch boundary silently drops one transition
    per active user. State = (last_ts_ns, last_event_id, last_type);
    within a batch events sort by the collision-free (ts_ns, event_id)
    before pairing, matching the batch ordering exactly. Downstream, a
    grouped sum over (prev_type, event_type) aggregates the per-user
    steps into the matrix; equivalence with batch is pinned by test.
    """

    # Nested so cloudpickle ships it by value (workers don't import us).
    def update_transitions(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_ts, last_id, last_type = state.get
        else:
            last_ts, last_id, last_type = None, None, None
        rows: dict[tuple[str, str], int] = {}
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts_ns", "event_id"])
            for ts_ns, eid, etype in zip(
                pdf["ts_ns"], pdf["event_id"], pdf["event_type"]
            ):
                if last_type is not None:
                    k = (last_type, etype)
                    rows[k] = rows.get(k, 0) + 1
                last_ts, last_id, last_type = int(ts_ns), int(eid), etype
        if last_type is not None:
            state.update((last_ts, last_id, last_type))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(rows),
                "prev_type": [k[0] for k in rows],
                "event_type": [k[1] for k in rows],
                "n_steps": list(rows.values()),
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_transitions,
        outputStructType=TRANSITIONS_SCHEMA,
        stateStructType=_LAST_EVENT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
