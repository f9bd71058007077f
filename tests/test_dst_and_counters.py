"""DST-edge parity and stage-correct counters.

Reference semantics under test:
- .NET ``ConvertTimeToUtc`` THROWS on spring-forward gap times → the row
  is routed to invalid by the normalizer (TripRowNormalizerService.cs:
  84-97);
- ambiguous fall-back times resolve to the STANDARD offset (.NET rule),
  not the daylight offset java.time prefers;
- ParsedRows increments BEFORE normalization, so normalize-stage
  failures count in both ParsedRows and InvalidRows
  (TripEtlPipelineService.cs:103-126).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_developstoday_test_spark import schemas as S
from etl_developstoday_test_spark.config import EtlSettings
from etl_developstoday_test_spark.operators.normalize import normalize_trips
from etl_developstoday_test_spark.operators.parse import (
    ERROR_COL,
    UTC_CONVERT_ERROR,
    parse_trips,
)
from etl_developstoday_test_spark.pipeline import run

CSV_HEADER = ",".join(S.REQUIRED_COLUMNS)


def _raw(spark, rows):
    data = [tuple(r) + (i + 1,) for i, r in enumerate(rows)]
    schema = ", ".join(f"`{c}` string" for c in S.REQUIRED_COLUMNS) + ", line_number long"
    return spark.createDataFrame(data, schema)


def _row(pickup, dropoff="1/1/2020 10:10:00 AM", flag="N"):
    return (pickup, dropoff, "1", "1.0", flag, "1", "2", "10", "1")


def test_dst_gap_routes_to_invalid(spark):
    # 2:30 AM on 2019-03-10 does not exist in America/New_York
    parsed = parse_trips(
        _raw(
            spark,
            [
                _row("3/10/2019 2:30:00 AM"),  # gap pickup
                _row("3/10/2019 1:30:00 AM", "3/10/2019 2:59:00 AM"),  # gap dropoff
                _row("3/10/2019 1:30:00 AM", "3/10/2019 3:30:00 AM"),  # valid
            ],
        )
    )
    errs = {r["line_number"]: r[ERROR_COL] for r in parsed.collect()}
    assert errs[1] == UTC_CONVERT_ERROR
    assert errs[2] == UTC_CONVERT_ERROR
    assert errs[3] is None


def test_dst_gap_not_flagged_when_conversion_disabled(spark):
    parsed = parse_trips(
        _raw(spark, [_row("3/10/2019 2:30:00 AM")]), convert_to_utc=False
    )
    assert parsed.collect()[0][ERROR_COL] is None


def test_ambiguous_time_resolves_to_standard_offset(spark):
    # 1:30 AM on 2019-11-03 occurs twice; .NET picks the STANDARD (EST,
    # UTC-5) reading → 06:30 UTC. java.time alone would give 05:30 UTC.
    parsed = parse_trips(
        _raw(
            spark,
            [
                _row("11/3/2019 1:30:00 AM", "11/3/2019 3:00:00 AM"),
                _row("11/3/2019 12:30:00 AM", "11/3/2019 1:30:00 AM"),
            ],
        ),
    )
    normed = normalize_trips(parsed.filter(F.col(ERROR_COL).isNull()))
    rows = {r["line_number"]: r for r in normed.collect()}
    assert str(rows[1][S.PICKUP]) == "2019-11-03 06:30:00"
    # unambiguous 3:00 AM EST = 08:00 UTC; travel = 1.5h
    assert str(rows[1][S.DROPOFF]) == "2019-11-03 08:00:00"
    assert rows[1]["TravelTimeSeconds"] == 90 * 60
    # ambiguous DROPOFF also standard: 0:30 EDT (04:30Z) → 06:30Z = 2h
    assert str(rows[2][S.DROPOFF]) == "2019-11-03 06:30:00"
    assert rows[2]["TravelTimeSeconds"] == 120 * 60


def test_parsed_rows_counts_normalize_failures(spark, tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text(
        CSV_HEADER + "\n"
        + ",".join(_row("1/1/2020 10:00:00 AM")) + "\n"          # valid
        + ",".join(_row("3/10/2019 2:30:00 AM")) + "\n"          # gap → normalize fail
        + ",".join(_row("1/1/2020 10:00:00 AM", flag="X")) + "\n"  # domain → normalize fail
        + ",".join(_row("not-a-date")) + "\n"                    # parse fail
    )
    stats = run(
        spark,
        EtlSettings(input_path=str(csv), duplicates_path=str(tmp_path / "d")),
    )
    assert stats["TotalRowsRead"] == 4
    assert stats["ParsedRows"] == 3   # valid + 2 normalize-stage failures
    assert stats["InvalidRows"] == 3  # 2 normalize-stage + 1 parse-stage
    assert stats["InsertedRows"] == 1
    assert stats["DuplicateRows"] == 0
