"""Offline JDBC sink contract test — the Spark analogue of the
reference's BuildDataTable unit tests (SqlBulkTripInserterServiceTests
.cs:127-212), which also run without a live SQL Server: assert the
bulk column mapping, order, Spark→SQL-Server type compatibility, and
batchsize option plumbing."""

from __future__ import annotations

from pyspark.sql import types as T

from etl_developstoday_test_spark import schemas as S
from etl_developstoday_test_spark.config import EtlSettings
from etl_developstoday_test_spark.pipeline import build_stages
from etl_developstoday_test_spark.sinks import JDBC_BULK_COLUMNS, jdbc_write_plan
from tests.conftest import SAMPLE_CSV

# reference BulkSchema.Columns (SqlBulkTripInserterService.cs:143-155):
# name order is the mapping order; CLR type governs the DataTable column
REFERENCE_BULK_COLUMNS = [
    ("tpep_pickup_datetime", T.TimestampType()),   # DateTime → DATETIME2(0)
    ("tpep_dropoff_datetime", T.TimestampType()),  # DateTime → DATETIME2(0)
    ("passenger_count", T.ShortType()),            # byte → TINYINT (0-255 enforced at parse)
    ("trip_distance", T.DecimalType(9, 3)),        # decimal → DECIMAL(9,3)
    ("store_and_fwd_flag", T.StringType()),        # string → VARCHAR(3)
    ("PULocationID", T.IntegerType()),             # int → INT
    ("DOLocationID", T.IntegerType()),             # int → INT
    ("fare_amount", T.DecimalType(10, 2)),         # decimal → DECIMAL(10,2)
    ("tip_amount", T.DecimalType(10, 2)),          # decimal → DECIMAL(10,2)
]


def test_jdbc_frame_matches_reference_bulk_schema(spark):
    settings = EtlSettings(input_path=SAMPLE_CSV, duplicates_path="/tmp/unused")
    unique = build_stages(spark, settings)["unique"]
    frame, options = jdbc_write_plan(unique, batch_size=5000)

    got = [(f.name, f.dataType) for f in frame.schema.fields]
    assert got == REFERENCE_BULK_COLUMNS

    # Id (identity) and TravelTimeSeconds (persisted computed column,
    # script.sql:44) must NOT be bulk-mapped — inserting into either
    # would fail against the reference DDL
    assert "TravelTimeSeconds" not in frame.columns
    assert "Id" not in frame.columns

    # SqlBulkCopy BatchSize=5000 ↔ JDBC batchsize option
    assert options == {"batchsize": "5000"}


def test_jdbc_batchsize_is_configurable(spark):
    settings = EtlSettings(input_path=SAMPLE_CSV, duplicates_path="/tmp/unused")
    unique = build_stages(spark, settings)["unique"]
    _, options = jdbc_write_plan(unique, batch_size=1234)
    assert options["batchsize"] == "1234"


def test_jdbc_column_constant_is_clean_schema_minus_derived():
    derived = {"TravelTimeSeconds"}
    clean_names = [f.name for f in S.CLEAN_SCHEMA.fields if f.name not in derived]
    assert JDBC_BULK_COLUMNS == clean_names
