"""Pipeline configuration.

Mirrors the reference's settings surface (reference:
``TaxiEtl/TaxiEtl.Application/DTO/EtlSettingsDto.cs:13-55`` and
``TaxiEtl/TextEtl.Cli/appsettings.json``) as a plain dataclass.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EtlSettings:
    """Settings for the trip ETL pipeline.

    Attributes
    ----------
    input_path:
        CSV input file (or glob / directory of CSVs).
    duplicates_path:
        Directory for the duplicates side-output CSV
        (reference: ``EtlSettingsDto.cs:24`` ``DuplicatesFilePath``).
    output_path:
        Parquet output location for the clean trips table (the reference
        writes to SQL Server ``dbo.Trips``; parquet is our primary sink,
        JDBC is optional — see ``sinks.write_trips_jdbc``).
    quarantine_path:
        Optional parquet sink for INVALID rows (raw strings + error
        reason + line_number). The reference only logs-and-drops bad
        rows (``TripEtlPipelineService.cs:83-126``); a durable
        quarantine makes the error routing auditable and replayable.
    delimiter:
        Single-character CSV delimiter (reference:
        ``EtlSettingsDto.cs:48``, default ``,``).
    input_datetime_format:
        Spark datetime pattern for the source timestamps. ``None`` falls
        back to a lenient chain of common formats (the reference falls
        back to a culture-invariant general parse,
        ``TripRowParserService.cs:160-213``). The bundled sample uses
        ``M/d/yyyy h:mm:ss a`` (e.g. ``01/01/2020 12:28:15 AM``).
    convert_to_utc:
        Toggle for local→UTC conversion (reference:
        ``EtlSettingsDto.cs:36`` ``ConvertTimesToUtc``). When False,
        timestamps are stamped as-is (treated as already-UTC).
    timezone:
        IANA zone the source wall-clock times are in. The reference
        default is the Windows id "Eastern Standard Time"
        (``appsettings.json:12``), i.e. ``America/New_York`` *with* DST.
    batch_size:
        Insert batch size (reference ``Etl.BatchSize`` = 5000,
        ``appsettings.json:10``). In Spark this only parameterizes the
        JDBC writer's ``batchsize``; partitions are the real batches.
    line_numbers:
        When True (default) the source assigns a deterministic, 1-based,
        file-order ``line_number`` to every data row (blank lines skipped
        and not counted — reference ``CsvTripReaderService.cs:97-103``).
        Required for first-wins dedup fidelity and the duplicates
        side-output. When False the scan is a plain (faster, fully
        splittable) csv read and dedup order falls back to an arbitrary
        deterministic tiebreak.
    coalesce_duplicates_output:
        Write duplicates.csv as a single file (reference writes one
        file). Disable for very large duplicate volumes.
    """

    input_path: str
    duplicates_path: str
    output_path: str | None = None
    quarantine_path: str | None = None
    delimiter: str = ","
    input_datetime_format: str | None = "M/d/yyyy h:mm:ss a"
    convert_to_utc: bool = True
    timezone: str = "America/New_York"
    batch_size: int = 5000
    line_numbers: bool = True
    coalesce_duplicates_output: bool = True
    # JDBC sink (optional parity with the reference's SqlBulkCopy target;
    # reference: DatabaseOptions.cs:20-33)
    jdbc_url: str | None = None
    jdbc_table: str = "dbo.Trips"
    jdbc_properties: dict = field(default_factory=dict)
