"""Normalization of valid parsed trips (SURVEY.md §2.3 T2–T4).

- T3 EST→UTC, matching .NET's ``TimeZoneInfo.ConvertTimeToUtc``
  (reference ``TripRowNormalizerService.cs:174-191``) on BOTH DST edges:
  gap (spring-forward) times never reach this stage — .NET throws and
  the reference routes the row to invalid, which parse_trips mirrors by
  tagging them ``UTC_CONVERT_ERROR`` — and ambiguous (fall-back) times
  resolve to the STANDARD offset (.NET's rule), where Spark's
  ``to_utc_timestamp`` alone would pick the daylight offset; detected
  via the +1h round trip (assumes the universal 1-hour DST shift; holds
  for every IANA zone with DST since 1945 except Lord Howe Island).
  Toggleable — when disabled the wall-clock value is stamped as-is
  (reference ``:176-182``).
- T2 flag recode N→No / Y→Yes (reference ``:138-167``; stored as string,
  ``TripConfiguration.cs:50-53``). Domain violations were already routed
  to the error column by parse_trips.
- T4 derived ``TravelTimeSeconds`` = seconds(dropoff − pickup). The
  reference computes this DB-side as a persisted computed column
  (``script.sql:44``); we materialize it at write time — same contract.
- Timestamps truncated to whole seconds to match the reference's
  DATETIME2(0) storage (``script.sql:34-35``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from etl_developstoday_test_spark import schemas as S


def _to_utc_standard(col: str, timezone: str):
    """Wall-clock → UTC resolving ambiguous fall-back times to the
    STANDARD offset, as .NET's ConvertTimeToUtc does. Spark/java.time
    pick the EARLIER (daylight) offset; a wall time is ambiguous exactly
    when the one-hour-later UTC instant maps back to the same wall time,
    in which case that later instant is the standard-offset reading."""
    early = F.to_utc_timestamp(F.col(col), timezone)
    later = early + F.expr("INTERVAL 1 HOUR")
    ambiguous = F.from_utc_timestamp(later, timezone) == F.col(col)
    return F.when(ambiguous, later).otherwise(early)


def normalized_key_columns(
    convert_to_utc: bool = True,
    timezone: str = "America/New_York",
) -> dict:
    """The normalize-stage expressions for the dedup key columns
    (pickup/dropoff UTC-truncated timestamps + passenger_count), as
    plain column expressions over the PARSE-stage frame. Lets callers
    compute dedup identity without materializing the normalize stage:
    ``pipeline.run_stats_only`` folds these into its single aggregate
    so the whole stats pass is one scan, no cache."""
    if convert_to_utc:
        pickup = _to_utc_standard("pickup_local", timezone)
        dropoff = _to_utc_standard("dropoff_local", timezone)
    else:
        pickup = F.col("pickup_local")
        dropoff = F.col("dropoff_local")
    return {
        S.PICKUP: F.date_trunc("second", pickup),
        S.DROPOFF: F.date_trunc("second", dropoff),
        S.PASSENGER_COUNT: F.col(S.PASSENGER_COUNT),
    }


def normalize_trips(
    valid: DataFrame,
    convert_to_utc: bool = True,
    timezone: str = "America/New_York",
) -> DataFrame:
    """valid parsed rows → clean-stage columns (+ line_number, raw_* kept
    through dedup so the duplicates side-output can emit raw strings)."""
    keys = normalized_key_columns(convert_to_utc, timezone)
    pickup = keys[S.PICKUP]
    dropoff = keys[S.DROPOFF]

    flag = F.when(F.col(S.STORE_AND_FWD_FLAG) == "N", "No").otherwise("Yes")
    travel = (F.unix_timestamp(dropoff) - F.unix_timestamp(pickup)).cast("int")

    return valid.select(
        pickup.alias(S.PICKUP),
        dropoff.alias(S.DROPOFF),
        F.col(S.PASSENGER_COUNT),
        F.col(S.TRIP_DISTANCE),
        flag.alias(S.STORE_AND_FWD_FLAG),
        F.col(S.PU_LOCATION_ID),
        F.col(S.DO_LOCATION_ID),
        F.col(S.FARE_AMOUNT),
        F.col(S.TIP_AMOUNT),
        travel.alias("TravelTimeSeconds"),
        F.col(S.LINE_NUMBER),
        *[F.col(f"raw_{c}") for c in S.REQUIRED_COLUMNS],
    )
