"""Round-start canary: the driver regenerates /root/testdata between
rounds and has changed physical types before (events.ts nanos->micros
in round 3, which silently broke 12 queries until caught). This test
fails LOUDLY if column NAMES shift, and asserts the two adapter
contracts the engine depends on. Physical TYPES are deliberately not
pinned — load_events normalizes those.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

EXPECTED_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
             "p_retailprice"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}


@pytest.mark.parametrize("table", sorted(EXPECTED_COLUMNS))
def test_testdata_columns_unchanged(table):
    schema = pq.read_schema(f"{SF}/{table}.parquet")
    assert schema.names == EXPECTED_COLUMNS[table], (
        f"{table} columns changed to {schema.names} — testdata was "
        f"regenerated with a new layout; audit every query touching it "
        f"(types: {[str(f.type) for f in schema]})"
    )


def test_events_ts_is_a_known_encoding():
    t = pq.read_schema(f"{SF}/events.parquet").field("ts").type
    assert str(t) in ("timestamp[us]", "timestamp[ns]", "int64"), (
        f"events.ts arrived as {t} — extend "
        "sources/parquet_source.load_events for this encoding"
    )
