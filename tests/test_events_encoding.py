"""load_events must normalize BOTH physical ts encodings the driver's
generator has shipped (TIMESTAMP(NANOS)-as-int64 and timestamp[us]) to
the same (ts TimestampType, ts_ns long) surface."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from data_integration_openfoodfacts_spark.sources.parquet_source import (
    load_events,
)


def _write_events(tmp_path, ts_array, name):
    d = tmp_path / name
    d.mkdir()
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.5, 2.5]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def test_nanos_and_micros_encodings_normalize_identically(spark, tmp_path):
    us = [1_700_000_000_123_456, 1_700_000_100_654_321]  # epoch micros
    micros_dir = _write_events(
        tmp_path, pa.array(us, pa.timestamp("us")), "micros"
    )
    nanos_dir = _write_events(
        tmp_path, pa.array([u * 1000 for u in us], pa.timestamp("ns")), "nanos"
    )
    a = load_events(spark, micros_dir).orderBy("event_id").collect()
    b = load_events(spark, nanos_dir).orderBy("event_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert [r["ts_ns"] for r in a] == [u * 1000 for u in us]
    assert str(a[0].__fields__) == str(b[0].__fields__)
    schema = dict(load_events(spark, micros_dir).dtypes)
    assert schema["ts"] == "timestamp"
    assert schema["ts_ns"] == "bigint"
