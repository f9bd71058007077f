"""Stage schemas for the trip pipeline.

The reference moves each record through four typed representations
(SURVEY.md §1.1): raw all-string → parsed/typed → domain (UTC) →
persisted. We model each as a StructType; the DataFrame *is* the stage.

Type-mapping notes (reference ``script.sql:31-47``,
``TripConfiguration.cs:16-97``):

- SQL ``TINYINT`` is unsigned 0–255; Spark's ByteType is signed
  (−128..127), so ``passenger_count`` is carried as ShortType with the
  0–255 domain enforced by validation (reference rejects out-of-range at
  parse time — ``TripRowParserService.cs:215-251`` — so any surviving
  value fits either way).
- Money/distance use DecimalType end-to-end for exact arithmetic parity
  with the reference's C# ``decimal`` and with SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Canonical required source columns, in the reference's parse order
# (reference: TripFieldNames.cs:9-18; order: TripRowParserService.cs:34-139).
PICKUP = "tpep_pickup_datetime"
DROPOFF = "tpep_dropoff_datetime"
PASSENGER_COUNT = "passenger_count"
TRIP_DISTANCE = "trip_distance"
STORE_AND_FWD_FLAG = "store_and_fwd_flag"
PU_LOCATION_ID = "PULocationID"
DO_LOCATION_ID = "DOLocationID"
FARE_AMOUNT = "fare_amount"
TIP_AMOUNT = "tip_amount"

REQUIRED_COLUMNS = [
    PICKUP,
    DROPOFF,
    PASSENGER_COUNT,
    TRIP_DISTANCE,
    STORE_AND_FWD_FLAG,
    PU_LOCATION_ID,
    DO_LOCATION_ID,
    FARE_AMOUNT,
    TIP_AMOUNT,
]

LINE_NUMBER = "line_number"

# Raw stage: everything is a nullable string + the 1-based data-row number
# (reference: CsvTripRawRowDto.cs:13-30).
RAW_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in REQUIRED_COLUMNS]
    + [T.StructField(LINE_NUMBER, T.LongType(), False)]
)

DECIMAL_DISTANCE = T.DecimalType(9, 3)
DECIMAL_MONEY = T.DecimalType(10, 2)

# Clean/persisted stage (reference: script.sql:31-47 minus the surrogate
# Id the reference's own README says analytics never use, README.md:72-74).
CLEAN_SCHEMA = T.StructType(
    [
        T.StructField(PICKUP, T.TimestampType(), False),
        T.StructField(DROPOFF, T.TimestampType(), False),
        T.StructField(PASSENGER_COUNT, T.ShortType(), False),
        T.StructField(TRIP_DISTANCE, DECIMAL_DISTANCE, False),
        T.StructField(STORE_AND_FWD_FLAG, T.StringType(), False),
        T.StructField(PU_LOCATION_ID, T.IntegerType(), False),
        T.StructField(DO_LOCATION_ID, T.IntegerType(), False),
        T.StructField(FARE_AMOUNT, DECIMAL_MONEY, False),
        T.StructField(TIP_AMOUNT, DECIMAL_MONEY, False),
        T.StructField("TravelTimeSeconds", T.IntegerType(), False),
    ]
)
