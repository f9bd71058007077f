"""Typed parse + validation of raw trip rows (SURVEY.md §2.2 P2–P9, T1).

All-columnar: every rule is a Spark built-in expression (``try_cast`` /
``try_to_timestamp`` null-routing), so the whole stage stays inside
WholeStageCodegen — no Python executes per row. A single ``error``
column reproduces the reference's first-failure-wins ordering (field
order at reference ``TripRowParserService.cs:34-139``):

    pickup ts → dropoff ts → passenger_count → trip_distance →
    flag non-empty → PULocationID → DOLocationID → fare → tip →
    UTC-convertible (no DST gap; normalizer ``TripRowNormalizerService
    .cs:84-97``) → flag ∈ {N,Y} (``:99-105``) →
    dropoff ≥ pickup (Trip ctor, ``Trip.cs:69-74``)

``error IS NULL`` ⇔ the row is valid. The pipeline never aborts on a bad
row (reference ``TripEtlPipelineService.cs:83-126``): invalid rows are
routed, counted, and skipped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from etl_developstoday_test_spark import schemas as S

ERROR_COL = "error"

# Normalize-stage error messages (reference runs these AFTER the parser
# has already counted the row as parsed — TripEtlPipelineService.cs:103
# increments parsedRows before Normalize() runs, so rows failing these
# checks count in BOTH ParsedRows and InvalidRows).
UTC_CONVERT_ERROR = "failed to convert timestamps to UTC"
FLAG_DOMAIN_ERROR = "invalid store_and_fwd_flag domain"
DROPOFF_BEFORE_PICKUP_ERROR = "dropoff before pickup"
NORMALIZE_STAGE_ERRORS = (
    UTC_CONVERT_ERROR,
    FLAG_DOMAIN_ERROR,
    DROPOFF_BEFORE_PICKUP_ERROR,
)

# Lenient fallback chain used when no input format is configured
# (reference falls back to a culture-invariant general parse,
# TripRowParserService.cs:160-213).
FALLBACK_TS_FORMATS = [
    "M/d/yyyy h:mm:ss a",
    "yyyy-MM-dd HH:mm:ss",
    "M/d/yyyy H:mm:ss",
    "M/d/yyyy H:mm",
]


def _parse_ts(col: Column, fmt: str | None) -> Column:
    if fmt:
        return F.try_to_timestamp(col, F.lit(fmt))
    out = F.try_to_timestamp(col)
    for f in FALLBACK_TS_FORMATS:
        out = F.coalesce(out, F.try_to_timestamp(col, F.lit(f)))
    return out


def _parse_decimal(col: Column, dtype) -> Column:
    """Invariant-culture decimal parse tolerating thousands separators
    (reference TripRowParserService.cs:291-327 allows ``1,234.5``).

    Direct try_cast first; if that nulls and the text contains commas,
    retry with separators stripped. (Unlike .NET we don't validate
    separator *placement* — misplaced separators like ``1,2,3`` parse
    here; documented divergence, no such values exist in real data.)
    """
    return F.coalesce(
        col.try_cast(dtype),
        F.regexp_replace(col, ",", "").try_cast(dtype),
    )


def parse_trips(
    raw: DataFrame,
    input_datetime_format: str | None = "M/d/yyyy h:mm:ss a",
    convert_to_utc: bool = True,
    timezone: str = "America/New_York",
) -> DataFrame:
    """raw (all-string) → typed columns + first-failure ``error`` column.

    Output columns: pickup_local, dropoff_local (naive wall-clock
    timestamps, pre-UTC-conversion), passenger_count (short),
    trip_distance decimal(9,3), flag (trimmed+uppercased, T1),
    PULocationID, DOLocationID ints, fare_amount/tip_amount
    decimal(10,2), line_number, error (null = valid) — plus the original
    raw string columns prefixed ``raw_`` (kept for the duplicates
    side-output, which must contain raw strings — SURVEY.md §7.3(7)).
    """
    trimmed = {c: F.trim(F.col(c)) for c in S.REQUIRED_COLUMNS}  # T1

    pickup = _parse_ts(trimmed[S.PICKUP], input_datetime_format)
    dropoff = _parse_ts(trimmed[S.DROPOFF], input_datetime_format)
    # byte-range semantics: must parse as integer AND fit 0–255, else the
    # row is invalid (not clamped) — reference TripRowParserService.cs:215-251
    pax_int = trimmed[S.PASSENGER_COUNT].try_cast("int")
    pax = F.when(pax_int.between(0, 255), pax_int.cast("smallint"))
    distance = _parse_decimal(trimmed[S.TRIP_DISTANCE], S.DECIMAL_DISTANCE)
    flag = F.upper(trimmed[S.STORE_AND_FWD_FLAG])
    pu = trimmed[S.PU_LOCATION_ID].try_cast("int")
    do = trimmed[S.DO_LOCATION_ID].try_cast("int")
    fare = _parse_decimal(trimmed[S.FARE_AMOUNT], S.DECIMAL_MONEY)
    tip = _parse_decimal(trimmed[S.TIP_AMOUNT], S.DECIMAL_MONEY)

    typed = raw.select(
        pickup.alias("pickup_local"),
        dropoff.alias("dropoff_local"),
        pax.alias(S.PASSENGER_COUNT),
        distance.alias(S.TRIP_DISTANCE),
        flag.alias(S.STORE_AND_FWD_FLAG),
        pu.alias(S.PU_LOCATION_ID),
        do.alias(S.DO_LOCATION_ID),
        fare.alias(S.FARE_AMOUNT),
        tip.alias(S.TIP_AMOUNT),
        F.col(S.LINE_NUMBER),
        *[F.col(c).alias(f"raw_{c}") for c in S.REQUIRED_COLUMNS],
    )

    c = F.col
    neg = lambda x: c(x) < F.lit(0).cast("decimal(1,0)")  # noqa: E731
    error = (
        # parse-stage failures, in reference field order
        F.when(c("pickup_local").isNull(), F.lit(f"invalid {S.PICKUP}"))
        .when(c("dropoff_local").isNull(), F.lit(f"invalid {S.DROPOFF}"))
        .when(c(S.PASSENGER_COUNT).isNull(), F.lit(f"invalid {S.PASSENGER_COUNT}"))
        .when(c(S.TRIP_DISTANCE).isNull() | neg(S.TRIP_DISTANCE), F.lit(f"invalid {S.TRIP_DISTANCE}"))
        .when(c(S.STORE_AND_FWD_FLAG) == "", F.lit(f"empty {S.STORE_AND_FWD_FLAG}"))
        .when(c(S.PU_LOCATION_ID).isNull() | (c(S.PU_LOCATION_ID) < 0), F.lit(f"invalid {S.PU_LOCATION_ID}"))
        .when(c(S.DO_LOCATION_ID).isNull() | (c(S.DO_LOCATION_ID) < 0), F.lit(f"invalid {S.DO_LOCATION_ID}"))
        .when(c(S.FARE_AMOUNT).isNull() | neg(S.FARE_AMOUNT), F.lit(f"invalid {S.FARE_AMOUNT}"))
        .when(c(S.TIP_AMOUNT).isNull() | neg(S.TIP_AMOUNT), F.lit(f"invalid {S.TIP_AMOUNT}"))
        # normalize-stage failures (reference runs these after parse, in
        # this order: UTC conversion → flag domain → Trip invariants;
        # TripRowNormalizerService.cs:78-126)
        .when(
            _is_dst_gap("pickup_local", convert_to_utc, timezone)
            | _is_dst_gap("dropoff_local", convert_to_utc, timezone),
            F.lit(UTC_CONVERT_ERROR),
        )
        .when(~c(S.STORE_AND_FWD_FLAG).isin("N", "Y"), F.lit(FLAG_DOMAIN_ERROR))
        .when(c("dropoff_local") < c("pickup_local"), F.lit(DROPOFF_BEFORE_PICKUP_ERROR))
    )
    return typed.withColumn(ERROR_COL, error)


def _is_dst_gap(col: str, convert_to_utc: bool, timezone: str) -> Column:
    """True for wall-clock times that do not exist in ``timezone``
    (spring-forward gap). .NET's ``ConvertTimeToUtc`` THROWS on these
    (reference routes the row to invalid, TripRowNormalizerService.cs:
    84-97); Spark's ``to_utc_timestamp`` would silently shift them
    forward, so the gap is detected by the round trip not restoring the
    original wall time."""
    if not convert_to_utc:
        return F.lit(False)
    return (
        F.from_utc_timestamp(F.to_utc_timestamp(F.col(col), timezone), timezone)
        != F.col(col)
    )


def parse_ok() -> Column:
    """True for rows that survived the PARSE stage (the reference's
    ParsedRows counter): no error, or a normalize-stage error."""
    return F.col(ERROR_COL).isNull() | F.col(ERROR_COL).isin(
        *NORMALIZE_STAGE_ERRORS
    )


def split_valid(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P9 error routing: (valid, invalid)."""
    return (
        parsed.filter(F.col(ERROR_COL).isNull()),
        parsed.filter(F.col(ERROR_COL).isNotNull()),
    )
