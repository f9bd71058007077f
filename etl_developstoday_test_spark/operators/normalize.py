"""Normalization of valid parsed trips (SURVEY.md §2.3 T2–T4).

- T3 EST→UTC: ``to_utc_timestamp(ts, "America/New_York")`` — identical
  semantics to .NET's ``TimeZoneInfo.ConvertTimeToUtc`` with the Windows
  id "Eastern Standard Time" including DST rules (reference
  ``TripRowNormalizerService.cs:174-191``): DST-gap times map forward,
  ambiguous fall-back times resolve to the standard (post-transition)
  offset. Toggleable — when disabled the wall-clock value is stamped
  as-is (reference ``:176-182``).
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


def normalize_trips(
    valid: DataFrame,
    convert_to_utc: bool = True,
    timezone: str = "America/New_York",
) -> DataFrame:
    """valid parsed rows → clean-stage columns (+ line_number, raw_* kept
    through dedup so the duplicates side-output can emit raw strings)."""
    if convert_to_utc:
        pickup = F.to_utc_timestamp("pickup_local", timezone)
        dropoff = F.to_utc_timestamp("dropoff_local", timezone)
    else:
        pickup = F.col("pickup_local")
        dropoff = F.col("dropoff_local")
    pickup = F.date_trunc("second", pickup)
    dropoff = F.date_trunc("second", dropoff)

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
