"""Custom Python data source (PySpark 4 DataSource V2 Python API): a
partitioned, executor-side reader of the reference citycover.csv grammar.

The package's other dim loaders parse on the driver and broadcast
(reference_data.py) — right for a 1,116-row dim.  This source demonstrates
the SCALE shape for the same grammar: `spark.read.format("citycover")`
plans N byte-range InputPartitions over the file, and each executor task
parses only its slice and explodes the cover/overlay token lists (skipping
the literal NULL token, citycover.csv:325) — the pattern a multi-GB
line-oriented dim/fact file needs (no driver-side parse, no single-task
scan).  Contract: simple CSV, records never contain embedded newlines
(true for the reference grammar).

Partitioning convention (the standard splittable-text rule): a task skips
the partial record at its range start (unless it starts at the data start)
and finishes the record that BEGINS before its range end — every line is
parsed exactly once across tasks.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .reference_data import REF_DIR

DEFAULT_PATH = os.path.join(REF_DIR, "data", "citycover.csv")


class _ByteRange(InputPartition):
    def __init__(self, start: int, end: int, data_start: int):
        self.start = start
        self.end = end
        self.data_start = data_start


class CityCoverReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path", DEFAULT_PATH)
        self.n_parts = int(options.get("numPartitions", "4"))

    def partitions(self):
        size = os.path.getsize(self.path)
        with open(self.path, "rb") as f:
            header = f.readline()
        data_start = len(header)
        n = max(1, self.n_parts)
        span = max(1, (size - data_start + n - 1) // n)
        return [_ByteRange(data_start + i * span,
                           min(data_start + (i + 1) * span, size), data_start)
                for i in range(n)
                if data_start + i * span < size]

    def read(self, part: _ByteRange):
        import csv
        import io

        with open(self.path, "rb") as f:
            f.seek(part.start)
            if part.start > part.data_start:
                f.readline()  # skip the record begun in the previous range
            while f.tell() <= part.end:
                line = f.readline()
                if not line:
                    break
                if not line.strip():  # blank/trailing newline: no CSV record
                    continue
                row = next(csv.reader(io.StringIO(line.decode("utf-8"))))
                # columns: isolabel_ext,status,base_intlevel,cover,overlay,...
                if len(row) < 5:
                    raise ValueError(
                        f"citycover row with {len(row)} < 5 fields in "
                        f"{self.path} near byte {part.start}: {row!r}")
                iso = row[0]
                for kind, col in (("cover", 3), ("overlay", 4)):
                    for code in (row[col] or "").split():
                        if code == "NULL":  # literal token, citycover.csv:325
                            continue
                        yield (iso, kind, code)


class CityCoverDataSource(DataSource):
    """spark.read.format("citycover") — register with
    ``spark.dataSource.register(CityCoverDataSource)`` (idempotent)."""

    @classmethod
    def name(cls) -> str:
        return "citycover"

    def schema(self) -> str:
        return "isolabel_ext string, kind string, code string"

    def reader(self, schema):
        return CityCoverReader(self.options)
