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
    parsed = parse_trips(
        raw,
        settings.input_datetime_format,
        settings.convert_to_utc,
        settings.timezone,
    )
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

    Clean rows land in ``settings.output_path`` as parquet partitioned by
    ``_batch_id`` with dynamic partition overwrite — a replayed
    micro-batch overwrites its own partition instead of appending twice,
    which is what makes the foreachBatch sink idempotent (effective
    exactly-once per batch). Per-batch clean-row counts go to
    ``<duplicates_path>/counts`` the same way; duplicates dropped by the
    stateful dedup = source input rows − clean rows (the raw loser ROWS
    are not replayable from a stream — the batch pipeline remains the
    fidelity mode for the duplicates file).
    """
    normed = _transform(read_trips_stream(spark, settings.input_path, settings.delimiter), settings)
    deduped = normed.withWatermark(S.PICKUP, watermark).dropDuplicatesWithinWatermark(
        DEDUP_KEYS
    )

    clean_cols = [f.name for f in S.CLEAN_SCHEMA.fields]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df.select(*clean_cols).withColumn("_batch_id", F.lit(batch_id))
        out.persist()  # one computation feeds both the write and the count
        try:
            (
                out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(settings.output_path)
            )
            counts = batch_df.sparkSession.createDataFrame(
                [(out.count(), batch_id)], "n_clean long, _batch_id long"
            )
            (
                counts.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(f"{settings.duplicates_path}/counts")
            )
        finally:
            out.unpersist()

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

    Determinism: each value is quantized to an integer count of 1e-10
    quanta with round-half-up on the EXACT double value (the same
    conversion Spark's and DuckDB's double→DECIMAL(30,10) cast performs)
    and accumulated with exact integer arithmetic, so the emitted total
    is independent of both partitioning and arrival order — which is
    what lets a plain SQL oracle verify a stateful Python operator
    bit-for-bit. The quantization is numpy-vectorized: float rounding of
    ``v·1e10`` can only disagree with exact half-up rounding within
    ~1e-3 of a tie boundary, so only the (rare) near-tie elements take
    the exact per-element Decimal path.
    """
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    quantum = Decimal("1e-10")

    def quanta_sum(values: pd.Series) -> int:
        arr = np.asarray(values, dtype="float64")
        if arr.size == 0:
            return 0
        scaled = np.abs(arr) * 1e10
        # exact path for near-ties AND for |v| ≥ 1e3, where one ulp of
        # v·1e10 exceeds the tie-detection margin
        exact = (np.abs((scaled - np.floor(scaled)) - 0.5) < 1e-2) | (
            np.abs(arr) >= 1e3
        )
        q = (np.sign(arr) * np.floor(scaled + 0.5))[~exact].astype("int64")
        total = 0
        step = 1 << 16  # chunked so each int64 partial sum cannot overflow
        for i in range(0, q.size, step):
            total += int(q[i : i + step].sum())
        for v in arr[exact]:
            total += int(
                (Decimal(float(v)) * 10**10).to_integral_value(ROUND_HALF_UP)
            )
        return total

    def update(key, pdfs, state):
        if state.exists:
            n, total_q_str = state.get
            total_q = int(total_q_str)
        else:
            n, total_q = 0, 0
        for pdf in pdfs:
            n += len(pdf)
            total_q += quanta_sum(pdf["value"])
        state.update((n, str(total_q)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [float(Decimal(total_q) * quantum)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total_q string",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
