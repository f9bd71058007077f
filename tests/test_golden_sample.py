"""Golden end-to-end test: reproduce the reference's published run
statistics on its own 30k-row sample CSV (reference README.md:43-44):

    Total=30000, Parsed=29855, Invalid=145, Duplicates=15,
    Inserted=29840, DuplicatesFile=15

plus the SURVEY-verified decomposition of the 145 invalid rows
(96 negative fare_amount + 49 empty passenger_count).
"""

from __future__ import annotations

import csv
import glob
import os

import pytest
from pyspark.sql import functions as F

from etl_developstoday_test_spark.config import EtlSettings
from etl_developstoday_test_spark.operators.parse import ERROR_COL
from etl_developstoday_test_spark.pipeline import build_stages, run
from tests.conftest import SAMPLE_CSV

pytestmark = pytest.mark.skipif(
    not os.path.exists(SAMPLE_CSV), reason="reference sample CSV not present"
)


def test_golden_counts(spark, tmp_path):
    settings = EtlSettings(
        input_path=SAMPLE_CSV,
        duplicates_path=str(tmp_path / "duplicates"),
        output_path=str(tmp_path / "trips"),
    )
    stats = run(spark, settings)
    assert stats == {
        "TotalRowsRead": 30000,
        "ParsedRows": 29855,
        "InvalidRows": 145,
        "DuplicateRows": 15,
        "InsertedRows": 29840,
        "DuplicatesFileRows": 15,
    }

    # duplicates side-output: header + 15 raw rows, LineNumber first
    files = glob.glob(str(tmp_path / "duplicates" / "part-*.csv"))
    assert len(files) == 1
    with open(files[0], newline="") as fh:
        rows = list(csv.reader(fh))
    assert rows[0][0] == "LineNumber"
    assert rows[0][1] == "tpep_pickup_datetime"
    assert len(rows) == 16

    # clean output is readable and has the persisted-stage schema
    clean = spark.read.parquet(str(tmp_path / "trips"))
    assert clean.count() == 29840
    assert "TravelTimeSeconds" in clean.columns


def test_invalid_decomposition(spark):
    settings = EtlSettings(input_path=SAMPLE_CSV, duplicates_path="/tmp/unused")
    parsed = build_stages(spark, settings)["parsed"]
    by_error = {
        r[ERROR_COL]: r["cnt"]
        for r in parsed.filter(F.col(ERROR_COL).isNotNull())
        .groupBy(ERROR_COL)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert by_error == {
        "invalid fare_amount": 96,
        "invalid passenger_count": 49,
    }


def test_utc_conversion_and_travel_time(spark):
    settings = EtlSettings(input_path=SAMPLE_CSV, duplicates_path="/tmp/unused")
    stages = build_stages(spark, settings)
    row = (
        stages["unique"]
        .filter(F.col("line_number") == 1)
        .select("tpep_pickup_datetime", "TravelTimeSeconds", "store_and_fwd_flag")
        .collect()[0]
    )
    # 01/01/2020 12:28:15 AM EST == 2020-01-01 05:28:15 UTC; dropoff 12:33:03 AM
    assert str(row["tpep_pickup_datetime"]) == "2020-01-01 05:28:15"
    assert row["TravelTimeSeconds"] == (33 * 60 + 3) - (28 * 60 + 15)
    assert row["store_and_fwd_flag"] == "No"


def test_quarantine_sink_holds_invalid_rows(spark, tmp_path):
    settings = EtlSettings(
        input_path=SAMPLE_CSV,
        duplicates_path=str(tmp_path / "dups"),
        quarantine_path=str(tmp_path / "quarantine"),
    )
    run(spark, settings)
    q = spark.read.parquet(str(tmp_path / "quarantine"))
    assert q.count() == 145
    by_error = {
        r[ERROR_COL]: r["cnt"]
        for r in q.groupBy(ERROR_COL).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert by_error == {
        "invalid fare_amount": 96,
        "invalid passenger_count": 49,
    }
    # raw strings preserved for replay
    assert any(c.startswith("raw_") for c in q.columns)
    assert "line_number" in q.columns
