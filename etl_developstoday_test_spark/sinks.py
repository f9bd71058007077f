"""Sinks: clean-trips parquet/JDBC, duplicates side-output CSV
(SURVEY.md §2.1 S5–S7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from etl_developstoday_test_spark import schemas as S

# duplicates.csv layout (reference CsvDuplicateTripWriter.cs:21-33):
# LineNumber first, then the 9 raw string fields in canonical order.
DUPLICATES_HEADER = ["LineNumber", *S.REQUIRED_COLUMNS]


def write_trips_parquet(clean: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Primary sink. The reference's query-acceleration indexes
    (script.sql:55-98) have no Spark analogue; the equivalent physical
    design is partitioning/clustering on the hot filter column — pass
    e.g. ``partition_by=["PULocationID"]`` so Q1/Q4-style predicates get
    partition pruning (SURVEY.md §4)."""
    cols = [f.name for f in S.CLEAN_SCHEMA.fields]
    writer = clean.select(*cols).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


# The 9 bulk-inserted columns, in the reference's exact mapping order
# (SqlBulkTripInserterService.cs BulkSchema.Columns:143-155). Id is the
# DB identity and TravelTimeSeconds a persisted computed column
# (script.sql:44) — neither is bulk-mapped, so the JDBC frame must NOT
# carry them.
JDBC_BULK_COLUMNS = [
    S.PICKUP,
    S.DROPOFF,
    S.PASSENGER_COUNT,
    S.TRIP_DISTANCE,
    S.STORE_AND_FWD_FLAG,
    S.PU_LOCATION_ID,
    S.DO_LOCATION_ID,
    S.FARE_AMOUNT,
    S.TIP_AMOUNT,
]


def jdbc_write_plan(
    clean: DataFrame, batch_size: int = 5000
) -> tuple[DataFrame, dict[str, str]]:
    """The exact (projected frame, writer options) handed to the JDBC
    writer — factored out so the column mapping and batchsize plumbing
    are assertable without a live database, matching the reference's own
    offline BuildDataTable tests (SqlBulkTripInserterServiceTests.cs:
    127-212)."""
    return clean.select(*JDBC_BULK_COLUMNS), {"batchsize": str(batch_size)}


def write_trips_jdbc(
    clean: DataFrame,
    url: str,
    table: str,
    properties: dict,
    batch_size: int = 5000,
) -> None:
    """JDBC parity sink (reference bulk-inserts via SqlBulkCopy with
    BatchSize=5000 — SqlBulkTripInserterService.cs:57-135). Spark's
    per-partition JDBC writer with ``batchsize`` is the same micro-batch
    contract; write parallelism = number of partitions."""
    projected, options = jdbc_write_plan(clean, batch_size)
    writer = projected.write.mode("append")
    for key, value in options.items():
        writer = writer.option(key, value)
    writer.jdbc(url, table, properties=properties)


def write_duplicates_csv(losers: DataFrame, path: str, coalesce: bool = True) -> None:
    """Duplicates side-output: raw (unparsed) strings, LineNumber first,
    file order, header once, RFC-4180 minimal quoting (reference
    CsvDuplicateTripWriter.cs:56-158 — quote iff the value contains the
    delimiter, a quote, CR or LF; Spark's csv writer does exactly this
    minimal quoting by default).

    ``coalesce=True`` yields a single part file sorted by LineNumber,
    matching the reference's single sequential file. At scale, pass
    False and let ``sortWithinPartitions`` keep per-file order instead.
    """
    out = losers.select(
        F.col(S.LINE_NUMBER).alias("LineNumber"),
        *[F.col(f"raw_{c}").alias(c) for c in S.REQUIRED_COLUMNS],
    )
    if coalesce:
        out = out.coalesce(1).sortWithinPartitions("LineNumber")
    else:
        out = out.sortWithinPartitions("LineNumber")
    out.write.mode("overwrite").option("header", True).csv(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Bucketed parquet table: pre-shuffles data into ``n_buckets`` hash
    buckets on ``bucket_col`` at WRITE time, so every later join or
    aggregation on that key reads co-located buckets and skips its
    shuffle entirely — the Spark analogue of the reference's clustered
    index design (script.sql:55-98), and the 100 TB answer to repeated
    fact⋈fact joins: pay the partitioning once, reuse it every query.

    Buckets are also sorted by the key, so joins degrade to a zipper
    merge per bucket (no hash table build).
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
