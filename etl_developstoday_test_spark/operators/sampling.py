"""Deterministic hash-based sampling for training-data pipelines.

RNG-based sampling (``df.sample``) is partition-order dependent and
unrepeatable across engines or incremental re-ingests. These operators
assign every row a stable bucket from an md5 hash of its key, so the
sample is a pure function of the data: stable across runs, engines,
partitionings and re-ingests, and verifiable by any engine with md5
(which is how the DuckDB oracles check them exactly). Narrow maps —
zero shuffles until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from etl_developstoday_test_spark.functions import md5_long

N_BUCKETS = 100


def hash_bucket(key: Column, salt: str = "sample") -> Column:
    """Stable bucket in [0, 100) from an md5 of ``salt # key``."""
    return md5_long(F.concat(F.lit(f"{salt}#"), key.cast("string"))) % N_BUCKETS


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rate_pct: Column,
    salt: str = "strat",
) -> DataFrame:
    """Keep ``rate_pct``% of each stratum, chosen by key hash.

    ``rate_pct`` is a Column so rates can vary per stratum (undersample
    dominant classes, oversample rare ones — the usual class-balancing
    pass before training). Filter is a narrow map; at 100 TB this is
    scan-bound with zero shuffles.
    """
    return df.withColumn("_bucket", hash_bucket(F.col(key_col), salt)).filter(
        F.col("_bucket") < rate_pct
    ).drop("_bucket")
