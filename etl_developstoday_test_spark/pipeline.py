"""End-to-end trip ETL orchestrator.

Declarative re-expression of the reference's per-row pull pipeline
(``TripEtlPipelineService.cs:58-194``; dataflow diagram in SURVEY.md
§3.2): scan → parse/validate → split → normalize → first-wins dedup →
duplicates side-output + clean sink → six-counter stats.

The observable contract is identical (same stats, same winners, same
duplicates file); the execution model is set-oriented so Catalyst/AQE
own partitioning, spilling, and parallelism — this is what removes the
reference's self-declared ~10 GB in-memory-dedup ceiling
(``README.md:76-93``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_developstoday_test_spark import schemas as S
from etl_developstoday_test_spark.config import EtlSettings
from etl_developstoday_test_spark.operators.dedup import first_wins_dedup
from etl_developstoday_test_spark.operators.normalize import normalize_trips
from etl_developstoday_test_spark.operators.parse import (
    ERROR_COL,
    parse_ok,
    parse_trips,
    split_valid,
)
from etl_developstoday_test_spark.sinks import (
    write_duplicates_csv,
    write_trips_jdbc,
    write_trips_parquet,
)
from etl_developstoday_test_spark.sources.csv_source import read_trips_csv

DEDUP_KEYS = [S.PICKUP, S.DROPOFF, S.PASSENGER_COUNT]


def build_stages(
    spark: SparkSession, settings: EtlSettings
) -> dict[str, DataFrame]:
    """Construct (lazily) every stage DataFrame; nothing executes yet."""
    raw = read_trips_csv(
        spark,
        settings.input_path,
        delimiter=settings.delimiter,
        line_numbers=settings.line_numbers,
    )
    parsed = parse_trips(
        raw,
        settings.input_datetime_format,
        settings.convert_to_utc,
        settings.timezone,
    )
    valid, invalid = split_valid(parsed)
    normed = normalize_trips(valid, settings.convert_to_utc, settings.timezone)
    unique, dups = first_wins_dedup(normed, DEDUP_KEYS, S.LINE_NUMBER)
    return {
        "raw": raw,
        "parsed": parsed,
        "valid": valid,
        "invalid": invalid,
        "normalized": normed,
        "unique": unique,
        "duplicates": dups,
    }


def run(spark: SparkSession, settings: EtlSettings) -> dict[str, int]:
    """Execute the pipeline; returns the reference's six counters
    (TripImportStatisticsDto.cs:10-46):
    TotalRowsRead / ParsedRows / InvalidRows / DuplicateRows /
    InsertedRows / DuplicatesFileRows.
    """
    stages = build_stages(spark, settings)

    # One cache point: the normalized stage feeds dedup twice (winners +
    # losers) and the stats; raw/parsed counts are derived in a single
    # aggregate over `parsed` rather than one job per counter.
    # ParsedRows counts rows that survive the PARSE stage only: the
    # reference increments parsedRows BEFORE normalization, so rows that
    # later fail normalize-stage checks count in both ParsedRows and
    # InvalidRows (TripEtlPipelineService.cs:103-126).
    parsed = stages["parsed"].persist()
    counters = parsed.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(parse_ok(), 1)).alias("parsed"),
        F.count(F.when(F.col(ERROR_COL).isNotNull(), 1)).alias("invalid"),
    ).collect()[0]

    if settings.quarantine_path:
        # durable error routing: raw strings + reason, replayable later
        (
            parsed.filter(F.col(ERROR_COL).isNotNull())
            .select(
                S.LINE_NUMBER,
                ERROR_COL,
                *[f"raw_{c}" for c in S.REQUIRED_COLUMNS],
            )
            .write.mode("overwrite")
            .parquet(settings.quarantine_path)
        )

    normed = normalize_trips(
        parsed.filter(F.col(ERROR_COL).isNull()),
        settings.convert_to_utc,
        settings.timezone,
    ).persist()
    unique, dups = first_wins_dedup(normed, DEDUP_KEYS, S.LINE_NUMBER)

    # Dedup counters ride the sink jobs via observe() (CollectMetrics):
    # the counts are accumulated WHILE the writes execute — the
    # distributed analogue of the reference's in-loop counters
    # (TripEtlPipelineService.cs:66-71) — instead of re-running the
    # dedup window once per counter.
    from pyspark.sql import Observation

    obs_dups = Observation("dup_stats")
    write_duplicates_csv(
        dups.observe(obs_dups, F.count(F.lit(1)).alias("n")),
        settings.duplicates_path,
        coalesce=settings.coalesce_duplicates_output,
    )
    n_dups = obs_dups.get["n"]

    if settings.output_path:
        obs_unique = Observation("unique_stats")
        write_trips_parquet(
            unique.observe(obs_unique, F.count(F.lit(1)).alias("n")),
            settings.output_path,
        )
        n_unique = obs_unique.get["n"]
    else:
        n_unique = unique.count()
    if settings.jdbc_url:
        write_trips_jdbc(
            unique,
            settings.jdbc_url,
            settings.jdbc_table,
            settings.jdbc_properties,
            settings.batch_size,
        )

    parsed.unpersist()
    normed.unpersist()

    return {
        "TotalRowsRead": counters["total"],
        "ParsedRows": counters["parsed"],
        "InvalidRows": counters["invalid"],
        "DuplicateRows": n_dups,
        "InsertedRows": n_unique,
        "DuplicatesFileRows": n_dups,
    }


def run_stats_only(spark: SparkSession, settings: EtlSettings) -> dict[str, int]:
    """The same six counters as ``run`` WITHOUT materializing any sink —
    ONE aggregation job over ONE scan, no cache.

    Value-identical to ``run`` by construction: first-wins dedup keeps
    exactly one winner per key, so InsertedRows = COUNT(DISTINCT keys)
    and DuplicateRows = valid − distinct, with no window — and because
    the normalize stage is pure column expressions
    (``normalized_key_columns``), the dedup identity is computable
    inline over the parse-stage frame, fusing what used to be two
    aggregation jobs over a cached parse into a single pass. The
    conditional ``count_distinct(CASE WHEN valid AND keys non-null THEN
    struct(keys) END)`` replicates COUNT(DISTINCT k1,k2,k3)-over-valid
    exactly (both skip NULL inputs). At 100 TB this is the only viable
    shape: caching the parse is off the table, and the single Expand-
    based aggregate reads the CSV once. Used by the benchmark
    (``SPARK_GRAFT_BENCH_LITE``) so the golden-certification row
    measures pipeline compute rather than sink I/O; correctness runs
    still execute the full ``run`` with real sinks.
    """
    from etl_developstoday_test_spark.operators.normalize import (
        normalized_key_columns,
    )

    stages = build_stages(spark, settings)
    parsed = stages["parsed"]
    keys = normalized_key_columns(settings.convert_to_utc, settings.timezone)
    valid = F.col(ERROR_COL).isNull()
    keys_nonnull = F.lit(True)
    for expr in keys.values():
        keys_nonnull = keys_nonnull & expr.isNotNull()
    key_struct = F.when(
        valid & keys_nonnull,
        F.struct(*[v.alias(k) for k, v in keys.items()]),
    )
    row = parsed.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(parse_ok(), 1)).alias("parsed"),
        F.count(F.when(F.col(ERROR_COL).isNotNull(), 1)).alias("invalid"),
        F.count(F.when(valid, 1)).alias("valid"),
        F.count_distinct(key_struct).alias("distinct"),
    ).collect()[0]
    n_dups = row["valid"] - row["distinct"]
    return {
        "TotalRowsRead": row["total"],
        "ParsedRows": row["parsed"],
        "InvalidRows": row["invalid"],
        "DuplicateRows": n_dups,
        "InsertedRows": row["distinct"],
        "DuplicatesFileRows": n_dups,
    }
