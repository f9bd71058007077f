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

- ``line_numbers=True`` (fidelity mode): JVM-only file-order numbering.
  ``spark.read.text`` rows are tagged with (file, block offset,
  monotonically_increasing_id); within a Hadoop text split rows enumerate
  in file order and splits enumerate by block offset, so
  ``row_number() OVER (PARTITION BY file, block ORDER BY mid)`` plus a
  per-block cumulative offset (computed from a tiny block-count
  aggregate, never from data rows) reconstructs the global 1-based line
  number with NO per-line Python and NO global sort. This reproduces the
  reference's duplicates side-output byte-for-byte; it costs one extra
  counting pass — the same price ``zipWithIndex`` paid, minus the
  Python round-trips.
- ``line_numbers=False`` (throughput mode): plain ``spark.read.csv`` —
  fully splittable, zero extra passes. Row order is not defined, so
  first-wins dedup degrades to an arbitrary-but-deterministic winner
  (documented in operators/dedup.py). Columns are bound by POSITION
  (first-duplicate-wins on repeated header names, same as fidelity mode).

At 100 TB you would not ingest CSV with global line numbers at all — the
scalable contract is "any total order works"; parquet/Delta inputs carry
their own ordering column. Fidelity mode exists to match the reference's
observable behavior exactly, and its per-block offset map is block
METADATA (≈ input bytes / 128 MB entries), which stays driver-sized even
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from etl_developstoday_test_spark.schemas import LINE_NUMBER, RAW_SCHEMA, REQUIRED_COLUMNS


class MissingRequiredColumns(ValueError):
    """Raised when the CSV header lacks required columns
    (reference: InvalidDataException, CsvTripReaderService.cs:210-221)."""


def _header_index_map(names: list[str]) -> dict[str, int]:
    """Case-insensitive trimmed header→index map; first duplicate wins
    (reference: CsvTripReaderService.cs:163-184)."""
    mapping: dict[str, int] = {}
    for idx, name in enumerate(names):
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


def _split_col(delimiter: str):
    esc = "\\" + delimiter if delimiter in ".|\\^$*+?()[]{}" else delimiter
    return F.split(F.col("value"), esc)


def _probe_header(spark: SparkSession, path: str) -> str:
    """First line of the (lexicographically first) input file, read via
    the Hadoop input format — one line, no Python lambda over data."""
    try:
        header = spark.sparkContext.textFile(path).first()
    except ValueError as exc:  # empty RDD
        raise ValueError(f"empty CSV input: {path}") from exc
    if not header.strip():
        raise ValueError(f"empty CSV header: {path}")
    return header


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
        # Bind from the RAW header line (one-line probe), by POSITION:
        # Spark's csv reader de-duplicates repeated header names by
        # renaming, so its df.columns can't express first-duplicate-wins
        # binding, and selecting by name is ambiguous anyway.
        header = _probe_header(spark, path)
        resolved = _resolve_required(_header_index_map(header.split(delimiter)))
        df = (
            spark.read.option("header", True)  # drops the per-file header row
            .option("sep", delimiter)
            .csv(path)
        )
        positional = df.toDF(*[f"_c{i}" for i in range(len(df.columns))])
        width = len(df.columns)
        cols = [
            (
                F.col(f"_c{idx}").cast("string") if idx < width
                else F.lit(None).cast("string")
            ).alias(name)
            for name, idx in resolved.items()
        ]
        # No file-order guarantee in this mode; monotonically_increasing_id
        # is deterministic per plan but NOT file order — documented above.
        return positional.select(*cols).withColumn(
            LINE_NUMBER, F.monotonically_increasing_id() + 1
        )

    # ---- fidelity mode: JVM-only file-order line numbers ----
    header = _probe_header(spark, path)
    resolved = _resolve_required(_header_index_map(header.split(delimiter)))

    base = spark.read.text(path).select(
        "value",
        F.input_file_name().alias("_file"),
        F.input_file_block_start().alias("_block"),
        F.monotonically_increasing_id().alias("_mid"),
    )
    # Drop header occurrences and blank lines BEFORE numbering: every
    # file of a multi-file input repeats the same header line, and
    # blanks are never counted or numbered (reference :97-103).
    data = base.filter((F.trim("value") != "") & (F.col("value") != header))

    # Within one (file, block) all rows live in one task and _mid is
    # assigned in read order, so this window never crosses executors'
    # row order; partitioning by block keeps the sort local and bounded.
    w = Window.partitionBy("_file", "_block").orderBy("_mid")
    numbered = data.withColumn("_rn", F.row_number().over(w))

    # Per-block row counts → cumulative start offsets. Block metadata
    # only: one row per ~128 MB split, safely driver-sized at any scale.
    counts = numbered.groupBy("_file", "_block").agg(
        F.count(F.lit(1)).alias("_n")
    ).collect()
    offsets, acc = [], 0
    for r in sorted(counts, key=lambda r: (r["_file"], r["_block"])):
        offsets.append((r["_file"], r["_block"], acc))
        acc += r["_n"]
    if offsets:
        off_df = spark.createDataFrame(
            offsets, "_file string, _block long, _offset long"
        )
        numbered = numbered.join(F.broadcast(off_df), ["_file", "_block"])
    else:
        numbered = numbered.withColumn("_offset", F.lit(0).cast("long"))

    tokens = _split_col(delimiter)
    cols = [
        F.get(tokens, idx).alias(name)  # F.get → null when index out of range
        for name, idx in resolved.items()
    ]
    raw = numbered.select(
        *cols, (F.col("_offset") + F.col("_rn")).cast("long").alias(LINE_NUMBER)
    )
    raw = raw.select(*[F.col(f.name).cast(f.dataType) for f in RAW_SCHEMA.fields])
    # The numbering window hash-partitions on (_file, _block): an input
    # with fewer blocks than cores lands all rows in that many shuffle
    # partitions, serializing the (expression-heavy) downstream parse.
    # Block count is already known driver-side — widen only then; a
    # at-scale input (blocks >= cores) keeps its natural layout with no
    # extra shuffle.
    width = spark.sparkContext.defaultParallelism
    if len(offsets) < width:
        raw = raw.repartition(width)
    return raw
