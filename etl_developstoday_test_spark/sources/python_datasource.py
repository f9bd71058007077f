"""Custom batch source via the Python DataSource API (Spark 4,
``pyspark.sql.datasource``) — the extension surface for systems Spark
ships no connector for (internal feed formats, bespoke stores, REST
exports). The reference's engine reads its CSV through its own file
reader (`CsvTripReaderService.cs:52-140`); this module demonstrates how
such a custom reader plugs into Spark as a first-class ``format(...)``
while keeping the read PARALLEL.

``ChunkedTextDataSource`` ("chunktext") yields raw text lines with
split provenance:

    chunk_id bigint, line_in_chunk bigint, line string

Scale design — the Hadoop LineRecordReader split protocol:

- ``partitions()`` touches METADATA only (``os.stat`` per file): each
  file is cut into ``chunk_bytes`` byte ranges, one ``InputPartition``
  per range, so planning cost is O(#files) on the driver no matter how
  large the data is.
- ``read(partition)`` seeks to the range start and applies the
  boundary rule every splittable text reader uses: a chunk that does
  not start at byte 0 SKIPS the (partial) line in progress — its owner
  is the previous chunk — and every chunk reads PAST its end to finish
  the last line it started. Each byte belongs to exactly one line and
  each line to exactly one chunk, so the union over chunks is exactly
  the file, with no coordination between tasks.
- Rows stream out of a buffered binary reader (no whole-file or
  whole-chunk materialization); Spark moves them to the JVM in Arrow
  batches.

Global line NUMBERS are deliberately not produced here: they need the
line count of every preceding chunk, which is a (tiny) aggregation —
exactly how ``csv_source.read_trips_csv`` assigns them from per-block
counts. The source stays single-pass; numbering composes on top.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

DEFAULT_CHUNK_BYTES = 128 * 1024 * 1024


class _ByteRange(InputPartition):
    def __init__(self, chunk_id: int, path: str, start: int, end: int):
        self.chunk_id = chunk_id
        self.path = path
        self.start = start
        self.end = end


class ChunkedTextReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("chunktext: 'path' option is required")
        self.chunk_bytes = int(options.get("chunk_bytes", DEFAULT_CHUNK_BYTES))
        if self.chunk_bytes <= 0:
            raise ValueError("chunktext: chunk_bytes must be positive")

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if os.path.isfile(os.path.join(self.path, f))
            )
        return [self.path]

    def partitions(self) -> Sequence[InputPartition]:
        parts: list[_ByteRange] = []
        for f in self._files():
            size = os.stat(f).st_size  # metadata only — no data read
            start = 0
            while start < size or (size == 0 and start == 0):
                end = min(start + self.chunk_bytes, size)
                parts.append(_ByteRange(len(parts), f, start, end))
                if end >= size:
                    break
                start = end
        return parts

    def lines(self, partition: _ByteRange) -> Iterator[tuple]:
        """(chunk_id, line_in_chunk, line) tuples for one byte range —
        the split protocol itself, kept tuple-level so tests can drive
        it directly."""
        p = partition
        with open(p.path, "rb") as fh:
            fh.seek(p.start)
            # Boundary rule: a mid-file chunk starts inside some line;
            # that line belongs to the previous chunk — skip to the
            # first newline. (A chunk boundary exactly ON a newline
            # still skips the empty remainder correctly because the
            # previous chunk read through that newline.)
            if p.start > 0:
                fh.readline()
            n = 0
            # A line belongs to the chunk whose [start, end] range
            # contains its first byte (end-inclusive: the next chunk
            # unconditionally skips its first line, so a line starting
            # exactly on the boundary is read here and skipped there).
            # readline() naturally runs past p.end to finish the last
            # line this chunk started; EOF yields b"".
            while fh.tell() <= p.end:
                raw = fh.readline()
                if not raw:
                    break
                n += 1
                yield (p.chunk_id, n, raw.rstrip(b"\n").decode("utf-8"))

    BATCH_ROWS = 4096

    def read(self, partition: _ByteRange):
        """Yield Arrow RecordBatches of up to BATCH_ROWS lines: one
        columnar hop to the JVM instead of per-row tuple pickling —
        measurably cheaper on wide chunks, identical rows."""
        import pyarrow as pa

        ids: list[int] = []
        nums: list[int] = []
        texts: list[str] = []

        def flush():
            return pa.RecordBatch.from_pydict(
                {"chunk_id": ids, "line_in_chunk": nums, "line": texts}
            )

        for cid, n, line in self.lines(partition):
            ids.append(cid)
            nums.append(n)
            texts.append(line)
            if len(ids) >= self.BATCH_ROWS:
                yield flush()
                ids, nums, texts = [], [], []
        if ids:
            yield flush()


class ChunkedTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "chunktext"

    def schema(self) -> str:
        return "chunk_id bigint, line_in_chunk bigint, line string"

    def reader(self, schema) -> ChunkedTextReader:
        return ChunkedTextReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the chunktext format on a session."""
    spark.dataSource.register(ChunkedTextDataSource)
