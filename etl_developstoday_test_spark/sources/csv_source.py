"""CSV trip source: header-name binding, projection, line numbers.

Reference semantics (SURVEY.md §2.1 S1–S4):

- header parsed into a case-insensitive name→index map, first duplicate
  header wins, names trimmed (reference ``CsvTripReaderService.cs:163-184``);
- fail fast if any of the 9 required columns is missing (``:210-221``);
- extra columns silently dropped — projection at the source (``:186-208``);
- blank lines skipped without being counted or numbered (``:97-101``);
- every surviving data row gets a 1-based ``line_number`` (``:103``);
- configurable single-char delimiter (``:153-161``).

Two scan modes:

- ``line_numbers=True`` (fidelity mode): read the file(s) as text in file
  order and assign indices with ``zipWithIndex``. ``zipWithIndex`` numbers
  rows by (partition index, position), and Hadoop text splits of a file
  enumerate in offset order, so the index *is* the file order. This is
  the only mode that reproduces the reference's duplicates side-output
  byte-for-byte; it costs one extra pass to size the partitions.
- ``line_numbers=False`` (throughput mode): plain ``spark.read.csv`` —
  fully splittable, zero extra passes, JVM-only. Row order is not
  defined, so first-wins dedup degrades to an arbitrary-but-deterministic
  winner (documented in operators/dedup.py). Use this when the input is
  already deduplicated or the winner identity doesn't matter.

At 100 TB you would not ingest CSV with global line numbers at all — the
scalable contract is "any total order works"; parquet/Delta inputs carry
their own ordering column. Fidelity mode exists to match the reference's
observable behavior exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_developstoday_test_spark.schemas import LINE_NUMBER, RAW_SCHEMA, REQUIRED_COLUMNS


class MissingRequiredColumns(ValueError):
    """Raised when the CSV header lacks required columns
    (reference: InvalidDataException, CsvTripReaderService.cs:210-221)."""


def _header_index_map(header_line: str, delimiter: str) -> dict[str, int]:
    """Case-insensitive trimmed header→index map; first duplicate wins
    (reference: CsvTripReaderService.cs:163-184)."""
    mapping: dict[str, int] = {}
    for idx, name in enumerate(header_line.split(delimiter)):
        key = name.strip().lower()
        if key and key not in mapping:
            mapping[key] = idx
    return mapping


def _resolve_required(mapping: dict[str, int]) -> dict[str, int]:
    missing = [c for c in REQUIRED_COLUMNS if c.lower() not in mapping]
    if missing:
        raise MissingRequiredColumns(
            f"CSV header is missing required column(s): {missing}"
        )
    return {c: mapping[c.lower()] for c in REQUIRED_COLUMNS}


def read_trips_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    line_numbers: bool = True,
) -> DataFrame:
    """Read a trips CSV into the raw stage: 9 string columns + line_number.

    Tokenization note: the reference splits naively on the delimiter with
    no quote handling on input (``CsvTripReaderService.cs:117-140``), and
    missing trailing fields become null. Fidelity mode reproduces exactly
    that (``F.split`` + ``F.get``); the sample data contains no quoted
    fields, so behavior is observably identical to a quote-aware reader
    on real inputs. SURVEY.md §7.3(6) documents this as a reference bug
    we deliberately do not extend to the throughput path.
    """
    if len(delimiter) != 1:
        raise ValueError("delimiter must be a single character")

    if not line_numbers:
        df = (
            spark.read.option("header", True)
            .option("sep", delimiter)
            .csv(path)
        )
        mapping = _header_index_map(delimiter.join(df.columns), delimiter)
        resolved = _resolve_required(mapping)
        cols = [
            F.col(df.columns[idx]).cast("string").alias(name)
            for name, idx in resolved.items()
        ]
        # No file-order guarantee in this mode; monotonically_increasing_id
        # is deterministic per plan but NOT file order — documented above.
        return df.select(*cols).withColumn(
            LINE_NUMBER, F.monotonically_increasing_id() + 1
        )

    sc = spark.sparkContext
    lines = sc.textFile(path)
    try:
        header = lines.first()
    except ValueError as exc:  # empty RDD
        raise ValueError(f"empty CSV input: {path}") from exc
    if not header.strip():
        raise ValueError(f"empty CSV header: {path}")

    resolved = _resolve_required(_header_index_map(header, delimiter))

    # Drop the header + blank lines first, then number what's left:
    # zipWithIndex on the filtered RDD yields contiguous 0-based indices in
    # file order with blanks never counted (reference :97-103 semantics).
    # Multi-file inputs (directory/glob): every file carries the same
    # header line — drop EVERY occurrence, not just index 0, or the
    # second file's header would be numbered as a data row. (Files must
    # share the same header; the column binding comes from the first.)
    data = (
        lines.zipWithIndex()
        .filter(
            lambda li: li[1] > 0 and li[0].strip() != "" and li[0] != header
        )
        .map(lambda li: li[0])
        .zipWithIndex()
        .map(lambda li: (li[0], li[1] + 1))
    )
    raw = spark.createDataFrame(data, schema="value string, line_number long")

    tokens = F.split(F.col("value"), "\\" + delimiter if delimiter in ".|\\^$*+?()[]{}" else delimiter)
    cols = [
        F.get(tokens, idx).alias(name)  # F.get → null when index out of range
        for name, idx in resolved.items()
    ]
    return raw.select(*cols, F.col(LINE_NUMBER)).select(
        *[F.col(f.name).cast(f.dataType) for f in RAW_SCHEMA.fields]
    )
