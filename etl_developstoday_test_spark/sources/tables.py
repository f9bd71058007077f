"""Loaders for the star-schema / documents / embeddings parquet tables.

These are generic parquet scans — Catalyst pushes filters and prunes
columns into the scan automatically, so callers should express their
query over the returned DataFrame rather than pre-filtering here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to plain ``TimestampType`` whatever
    the parquet physical type was:

    - TIMESTAMP(NANOS) read under ``nanosAsLong`` arrives as ``long``
      nanos — rebuild micros with exact integer division (nanos exceed
      2^53, so float math would corrupt them; truncation to micros
      matches what nanos-unaware readers such as DuckDB do).
    - TIMESTAMP(MICROS, isAdjustedToUTC=0) arrives as TIMESTAMP_NTZ —
      cast to ``timestamp``. The session timezone is pinned to UTC
      (session.py), so the wall-clock value maps to the same instant a
      naive reader (DuckDB) sees.
    - Already ``timestamp`` (isAdjustedToUTC=1) — leave untouched.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # The driver has shipped events.parquet with different physical
        # ts types across rounds (NANOS, then MICROS/NTZ); adapt to the
        # actual footer instead of assuming one. nanosAsLong only
        # affects NANOS columns, so it is safe to set unconditionally.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return _normalize_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-adaptive ``readStream`` over events.parquet.

    Structured Streaming needs an explicit schema; derive it from the
    batch read of the same file (footer truth) rather than hardcoding a
    physical type, then normalize ``ts`` to plain ``TimestampType`` via
    the same rules as ``load_table``. This keeps every downstream
    watermark/window/``unix_micros`` working regardless of which
    physical timestamp encoding the data was regenerated with.
    """
    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return _normalize_ts(stream)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
