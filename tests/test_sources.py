"""CSV source tests mirroring the reference reader's test matrix
(SURVEY.md §5, CsvTripReaderServiceTests.cs): header binding in
arbitrary column order, missing-column fail-fast, empty file, custom
delimiter, blank-line skipping, naive tokenization null-padding."""

from __future__ import annotations

import pytest

from etl_developstoday_test_spark.schemas import REQUIRED_COLUMNS
from etl_developstoday_test_spark.sources.csv_source import (
    MissingRequiredColumns,
    read_trips_csv,
)

ROW9 = "2020-01-01,2020-01-02,1,1.5,N,10,20,9.5,1.0"


def _write(tmp_path, text, name="in.csv"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_header_binds_by_name_in_any_order(spark, tmp_path):
    # reference: CsvTripReaderServiceTests.cs:103-160
    cols = list(REQUIRED_COLUMNS)
    shuffled = [cols[-1], *cols[1:-1], cols[0]]  # swap first/last
    path = _write(
        tmp_path,
        ",".join(shuffled) + "\n" + "9.9," + ",".join(ROW9.split(",")[1:-1]) + ",2020-01-01\n",
    )
    df = read_trips_csv(spark, path)
    row = df.collect()[0]
    assert row[cols[0]] == "2020-01-01"  # bound by NAME, not position
    assert row[cols[-1]] == "9.9"


def test_extra_columns_dropped_and_case_insensitive(spark, tmp_path):
    header = "EXTRA," + ",".join(c.upper() for c in REQUIRED_COLUMNS) + ",Trailing"
    path = _write(tmp_path, header + "\nx," + ROW9 + ",y\n")
    df = read_trips_csv(spark, path)
    assert sorted(df.columns) == sorted([*REQUIRED_COLUMNS, "line_number"])
    assert df.collect()[0]["passenger_count"] == "1"


def test_missing_required_column_fails_fast(spark, tmp_path):
    # reference: InvalidDataException (CsvTripReaderService.cs:210-221)
    header = ",".join(REQUIRED_COLUMNS[1:])  # drop the first required col
    path = _write(tmp_path, header + "\n" + ROW9 + "\n")
    with pytest.raises(MissingRequiredColumns, match=REQUIRED_COLUMNS[0]):
        read_trips_csv(spark, path)


def test_empty_file_raises(spark, tmp_path):
    path = _write(tmp_path, "")
    with pytest.raises(ValueError, match="empty CSV"):
        read_trips_csv(spark, path)


def test_semicolon_delimiter(spark, tmp_path):
    # reference: CsvTripReaderServiceTests.cs:243-282
    path = _write(
        tmp_path,
        ";".join(REQUIRED_COLUMNS) + "\n" + ROW9.replace(",", ";") + "\n",
    )
    df = read_trips_csv(spark, path, delimiter=";")
    assert df.collect()[0]["trip_distance"] == "1.5"


def test_blank_lines_skipped_and_not_numbered(spark, tmp_path):
    # reference: CsvTripReaderServiceTests.cs:289-327
    path = _write(
        tmp_path,
        ",".join(REQUIRED_COLUMNS) + "\n" + ROW9 + "\n\n   \n" + ROW9 + "\n",
    )
    df = read_trips_csv(spark, path)
    assert [r["line_number"] for r in df.orderBy("line_number").collect()] == [1, 2]


def test_missing_trailing_fields_null_padded(spark, tmp_path):
    # naive tokenization: short rows null-pad (CsvTripReaderService.cs:121-124)
    path = _write(
        tmp_path, ",".join(REQUIRED_COLUMNS) + "\n2020-01-01,2020-01-02,1\n"
    )
    row = read_trips_csv(spark, path).collect()[0]
    assert row["passenger_count"] == "1"
    assert row["tip_amount"] is None


def test_directory_of_csvs_drops_repeated_headers(spark, tmp_path):
    """Multi-file input: each file's header must be dropped, and line
    numbers must stay contiguous over data rows only."""
    d = tmp_path / "multi"
    d.mkdir()
    header = ",".join(REQUIRED_COLUMNS) + "\n"
    (d / "a.csv").write_text(header + ROW9 + "\n")
    (d / "b.csv").write_text(header + ROW9.replace("1.5", "9.9") + "\n")
    df = read_trips_csv(spark, str(d))
    rows = df.orderBy("line_number").collect()
    assert [r["line_number"] for r in rows] == [1, 2]
    assert {r["trip_distance"] for r in rows} == {"1.5", "9.9"}


def test_multifile_line_numbers_are_global_file_order(spark, tmp_path):
    """Fidelity mode must number rows 1..N across a multi-file input in
    (file, offset) order with headers and blanks never counted."""
    header = ",".join(REQUIRED_COLUMNS)
    d = tmp_path / "many"
    d.mkdir()
    (d / "a.csv").write_text(header + "\n" + ROW9 + "\n\n" + ROW9 + "\n")
    (d / "b.csv").write_text(header + "\n" + ROW9 + "\n")
    (d / "c.csv").write_text(header + "\n" + ROW9 + "\n" + ROW9 + "\n")
    df = read_trips_csv(spark, str(d))
    nums = sorted(r["line_number"] for r in df.collect())
    assert nums == [1, 2, 3, 4, 5]


def test_fidelity_plan_has_no_python_rdd_on_data(spark, tmp_path):
    """The data branch of fidelity mode must be JVM-only: a text
    FileScan feeding the window, never a Python RDD pass over lines."""
    path = _write(tmp_path, ",".join(REQUIRED_COLUMNS) + "\n" + ROW9 + "\n")
    df = read_trips_csv(spark, path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PythonRDD" not in plan
    assert "FileScan text" in plan
    # the only ExistingRDD allowed is the tiny block-offset table on the
    # broadcast build side
    assert plan.count("ExistingRDD") <= 1


def test_throughput_mode_binds_duplicate_headers_by_position(spark, tmp_path):
    """First-duplicate-wins on repeated header names requires positional
    binding — selecting by name is ambiguous."""
    header = "tpep_pickup_datetime,tpep_pickup_datetime," + ",".join(
        c for c in REQUIRED_COLUMNS if c != "tpep_pickup_datetime"
    )
    rest = [v for c, v in zip(REQUIRED_COLUMNS, ROW9.split(",")) if c != "tpep_pickup_datetime"]
    path = _write(tmp_path, header + "\nFIRST,SECOND," + ",".join(rest) + "\n")
    df = read_trips_csv(spark, path, line_numbers=False)
    row = df.collect()[0]
    assert row["tpep_pickup_datetime"] == "FIRST"  # first duplicate wins
    assert row["trip_distance"] == "1.5"


# --- Python DataSource (chunktext): split-protocol boundary cases ----------


def _chunktext(spark, path, chunk_bytes):
    from etl_developstoday_test_spark.sources import python_datasource

    python_datasource.register(spark)
    return (
        spark.read.format("chunktext")
        .option("path", str(path))
        .option("chunk_bytes", chunk_bytes)
        .load()
    )


def _lines(spark, path, chunk_bytes):
    return sorted(
        r.line for r in _chunktext(spark, path, chunk_bytes).collect()
    )


def test_chunktext_exact_multiset_across_chunk_sizes(spark, tmp_path):
    """Every chunk size — including cuts landing mid-line, exactly on a
    newline, and larger than the file — reproduces exactly the file's
    lines: the Hadoop boundary protocol assigns each line to exactly
    one chunk."""
    p = tmp_path / "t.txt"
    body = "\n".join(f"row-{i:04d}-{'x' * (i % 17)}" for i in range(60))
    p.write_text(body + "\n")
    want = sorted(body.split("\n"))
    # 5/23 bytes cut mid-line (5 < every line length, so some chunks
    # hold no line start); 10 cuts exactly on newlines for the
    # fixed-width "row-NNNN-\n" rows; huge chunk = single split
    for cb in (5, 10, 23, 4096, 10**9):
        assert _lines(spark, p, cb) == want, f"chunk_bytes={cb}"


def test_chunktext_chunk_inside_one_long_line(spark, tmp_path):
    """A chunk whose whole byte range falls inside one long line yields
    nothing — the line belongs to the chunk containing its first byte."""
    p = tmp_path / "long.txt"
    p.write_text("short\n" + "y" * 10_000 + "\nend\n")
    df = _chunktext(spark, p, 100)
    rows = df.collect()
    assert sorted(r.line for r in rows) == sorted(["short", "y" * 10_000, "end"])
    # the long line is produced by exactly one chunk
    assert sum(1 for r in rows if r.line.startswith("y")) == 1


def test_chunktext_no_trailing_newline_and_empty_file(spark, tmp_path):
    p = tmp_path / "nonl.txt"
    p.write_text("a\nb\nc-no-newline")
    assert _lines(spark, p, 4) == ["a", "b", "c-no-newline"]
    e = tmp_path / "empty.txt"
    e.write_text("")
    assert _chunktext(spark, e, 16).count() == 0


def test_chunktext_directory_of_files(spark, tmp_path):
    d = tmp_path / "dir"
    d.mkdir()
    (d / "a.txt").write_text("a1\na2\n")
    (d / "b.txt").write_text("b1\n")
    assert _lines(spark, d, 4) == ["a1", "a2", "b1"]


def test_chunktext_partition_planning_is_metadata_only(spark, tmp_path):
    """partitions() must derive chunk count from os.stat arithmetic:
    ceil(size / chunk_bytes), one InputPartition per range."""
    from etl_developstoday_test_spark.sources.python_datasource import (
        ChunkedTextReader,
    )

    p = tmp_path / "t.txt"
    p.write_text("z" * 1000)
    parts = ChunkedTextReader(
        {"path": str(p), "chunk_bytes": "300"}
    ).partitions()
    assert len(parts) == 4  # ceil(1000/300)
    assert [(q.start, q.end) for q in parts] == [
        (0, 300), (300, 600), (600, 900), (900, 1000)
    ]
