"""Testdata-drift tripwire.

The driver regenerates /root/testdata between rounds and has already
changed a physical type once (events.ts: TIMESTAMP(NANOS) →
TIMESTAMP(MICROS, isAdjustedToUTC=0)), silently breaking every consumer
that assumed the old encoding. This test reads only the parquet footers
(no Spark job — runs in milliseconds) and fails loudly the moment any
key column's physical/logical type changes again, naming the adaptive
loader that must absorb the change:
``etl_developstoday_test_spark/sources/tables.py`` (``_normalize_ts`` /
``load_table`` / ``events_stream``).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]

# Arrow type strings as of the round-4 testdata generation.
EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp[us]",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp[us]",
    },
    "events": {
        "event_id": "int64",
        "ts": "timestamp[us]",
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}

# Encodings the adaptive events loader is known to absorb without a code
# change. Anything outside this set needs a new branch in _normalize_ts.
ABSORBED_TS_TYPES = {"timestamp[ns]", "timestamp[us]", "timestamp[us, tz=UTC]"}

DRIFT_MSG = (
    "testdata schema drifted since this expectation was recorded — "
    "verify etl_developstoday_test_spark/sources/tables.py "
    "(_normalize_ts / load_table / events_stream) still handles the new "
    "encoding, then update tests/test_testdata_drift.py"
)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_footer_types_pinned(sf_dir: str, table: str) -> None:
    schema = pq.read_schema(os.path.join(sf_dir, f"{table}.parquet"))
    actual = {f.name: str(f.type) for f in schema}
    assert actual == EXPECTED[table], f"{table} @ {sf_dir}: {DRIFT_MSG}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_encoding_absorbable(sf_dir: str) -> None:
    """Even if the pin above is relaxed, events.ts must stay within the
    encodings _normalize_ts can map to plain TimestampType."""
    schema = pq.read_schema(os.path.join(sf_dir, "events.parquet"))
    ts = str(schema.field("ts").type)
    assert ts in ABSORBED_TS_TYPES, (
        f"events.ts is now {ts!r}, outside the set the adaptive loader "
        f"handles ({sorted(ABSORBED_TS_TYPES)}) — add a branch in "
        "etl_developstoday_test_spark/sources/tables.py:_normalize_ts"
    )
