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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read nanos as long and rebuild the timestamp
        # with exact integer division (nanos exceed 2^53 — float math
        # would corrupt them). Truncation to micros matches what
        # nanos-unaware readers (e.g. DuckDB) do.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
