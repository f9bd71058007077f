"""Structured Streaming version of the trip ETL.

The reference is batch-only (its ``IAsyncEnumerable`` reader is async
pull over a static file, not event-time streaming — SURVEY.md §2.7),
but its pipeline shape (parse → validate → dedup → sink) is exactly a
streaming topology, so the engine offers it as a first-class mode:

- micro-batch file source over a landing directory (same parse/validate
  expression layer as batch — the operators are pure column expressions,
  so they are shared verbatim);
- first-wins dedup via ``dropDuplicatesWithinWatermark`` on the same
  key the batch engine uses: in a stream "first" means first *arrival*,
  which is the exact semantics of the reference's in-memory HashSet
  (``TripDuplicateDetectorService.cs:36-49``) generalized to unbounded
  input with bounded state;
- ``foreachBatch`` sink so each micro-batch can fan out to the clean
  table and the duplicates side-output atomically (the two-sink pattern
  Structured Streaming cannot express with a single writeStream);
- event-time windowed aggregations (tumbling + session) with watermarks
  for late data — the streaming twins of the batch operators in
  operators/events_etl.py.

State sizing at scale: dedup state is bounded by the watermark horizon
(keys expire after it), so memory = arrival rate x horizon, not corpus
size; the shuffle is hash-partitioned by dedup key exactly like the
batch window dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_developstoday_test_spark import schemas as S
from etl_developstoday_test_spark.config import EtlSettings
from etl_developstoday_test_spark.operators.normalize import normalize_trips
from etl_developstoday_test_spark.operators.parse import ERROR_COL, parse_trips
from etl_developstoday_test_spark.pipeline import DEDUP_KEYS

RAW_STRING_SCHEMA = ", ".join(f"`{c}` string" for c in S.REQUIRED_COLUMNS)


def read_trips_stream(
    spark: SparkSession, landing_dir: str, delimiter: str = ","
) -> DataFrame:
    """Micro-batch CSV stream over a landing directory. Line-number
    fidelity doesn't exist in a stream; arrival order takes its place
    (matching the reference's sequential-read semantics)."""
    return (
        spark.readStream.schema(RAW_STRING_SCHEMA)
        .option("header", True)
        .option("sep", delimiter)
        .csv(landing_dir)
        .withColumn(S.LINE_NUMBER, F.lit(None).cast("long"))
    )


def _transform(raw: DataFrame, settings: EtlSettings) -> DataFrame:
    parsed = parse_trips(raw, settings.input_datetime_format)
    valid = parsed.filter(F.col(ERROR_COL).isNull())
    return normalize_trips(valid, settings.convert_to_utc, settings.timezone)


def run_stream(
    spark: SparkSession,
    settings: EtlSettings,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Start the streaming ETL; returns the StreamingQuery.

    Clean rows land in ``settings.output_path`` (parquet, appended
    exactly-once per checkpoint); rows dropped as duplicates are counted
    per batch into ``<duplicates_path>/counts`` (a stream cannot
    replay the raw losers the way the batch side-output does — the batch
    pipeline remains the fidelity mode for that file).
    """
    normed = _transform(read_trips_stream(spark, settings.input_path, settings.delimiter), settings)
    deduped = normed.withWatermark(S.PICKUP, watermark).dropDuplicatesWithinWatermark(
        DEDUP_KEYS
    )

    clean_cols = [f.name for f in S.CLEAN_SCHEMA.fields]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select(*clean_cols).write.mode("append").parquet(settings.output_path)

    writer = deduped.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_tumbling_hourly(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of operators/events_etl.tumbling_hourly: 1h
    tumbling event-time windows with late-data tolerance = watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_sessionized(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of operators/events_etl.sessionize using the native
    session_window (state merges adjacent windows within the gap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (n_events, total_value) maintained across micro-batches.

    This is the escape hatch for stateful logic Spark's built-in
    streaming aggregates can't express (the built-ins cover this toy
    case; the point is the contract). State per key is O(1) — a count
    and an exact decimal total as a string — so state size grows with
    #users, not #events.

    Determinism: each value is quantized to DECIMAL(…,10) with
    round-half-up (the same conversion Spark's and DuckDB's
    double→DECIMAL(30,10) cast performs) and accumulated with exact
    decimal arithmetic, so the emitted total is independent of both
    partitioning and arrival order — which is what lets a plain SQL
    oracle verify a stateful Python operator bit-for-bit.
    """
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    quantum = Decimal("1e-10")

    def update(key, pdfs, state):
        if state.exists:
            n, total_str = state.get
            total = Decimal(total_str)
        else:
            n, total = 0, Decimal(0)
        for pdf in pdfs:
            n += len(pdf)
            for v in pdf["value"]:
                total += Decimal(float(v)).quantize(quantum, ROUND_HALF_UP)
        state.update((n, str(total)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [float(total)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total_str string",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
