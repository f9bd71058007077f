"""CLI entry point — the Spark analogue of the reference's console host
(reference: ``TaxiEtl/TextEtl.Cli/Program.cs:9-55``: locate config,
bind settings, resolve the pipeline, run, log stats).

    python -m etl_developstoday_test_spark \
        --input trips.csv --duplicates out/dups --output out/trips

Prints the six-counter run statistics as one JSON line on stdout
(the reference only logs them — ``TripEtlPipelineService.cs:184-191``;
machine-readable output is strictly more useful).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="etl_developstoday_test_spark",
        description="PySpark trip ETL: parse, validate, normalize, "
        "dedup (first-wins), write clean parquet + duplicates CSV.",
    )
    p.add_argument("--input", required=True, help="CSV input path")
    p.add_argument("--duplicates", required=True, help="duplicates side-output dir")
    p.add_argument("--output", help="clean parquet output dir")
    p.add_argument("--delimiter", default=",")
    p.add_argument(
        "--datetime-format",
        default="M/d/yyyy h:mm:ss a",
        help="Spark datetime pattern of source timestamps",
    )
    p.add_argument(
        "--no-utc-conversion",
        action="store_true",
        help="stamp timestamps as-is instead of converting from --timezone",
    )
    p.add_argument("--timezone", default="America/New_York")
    p.add_argument("--master", default="local[*]")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from etl_developstoday_test_spark.config import EtlSettings
    from etl_developstoday_test_spark.pipeline import run
    from etl_developstoday_test_spark.session import get_spark

    spark = get_spark(
        app_name="trip-etl",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")
    settings = EtlSettings(
        input_path=args.input,
        duplicates_path=args.duplicates,
        output_path=args.output,
        delimiter=args.delimiter,
        input_datetime_format=args.datetime_format,
        convert_to_utc=not args.no_utc_conversion,
        timezone=args.timezone,
    )
    stats = run(spark, settings)
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
