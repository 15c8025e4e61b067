"""PySpark 4 Python DataSource: ``spark.read.format("stmt_text")``.

The statement pipeline needs (path, text) rows; Spark's built-in
``text`` source splits on newlines and ``binaryFile`` hands back raw
bytes. This custom DataSource reads each file WHOLE as utf-8 —
one partition per file, so a directory of thousands of statements
decodes in parallel across executors — and feeds
``sources/statement.parse_msi`` / ``parse_charges`` directly.

This is the SURVEY §4.3 "optional Python DataSource" made real (the
API shipped in Spark 4): the same skeleton carries the PDF/workbook
readers when their decode libraries are present — override
``partitions`` to list files driver-side and ``read`` to decode one
file per task.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class StatementTextReader(DataSourceReader):
    def __init__(self, options: dict):
        self.glob_pattern = options.get("path")
        if not self.glob_pattern:
            raise ValueError("stmt_text requires a path")
        if os.path.isdir(self.glob_pattern):
            self.glob_pattern = os.path.join(self.glob_pattern, "*")

    def partitions(self):  # one file = one task
        paths = sorted(glob.glob(self.glob_pattern))
        return [_FilePartition(p) for p in paths]

    def read(self, partition: _FilePartition | None) -> Iterator[tuple]:
        if partition is None:
            # empty glob: Spark's planner substitutes one None
            # partition when partitions() == [] — yield 0 rows
            return
        with open(partition.path, encoding="utf-8", errors="replace") as f:
            yield (partition.path, f.read())


class StatementTextDataSource(DataSource):
    """Whole-file utf-8 text source (path, text)."""

    @classmethod
    def name(cls) -> str:
        return "stmt_text"

    def schema(self) -> str:
        return "path string, text string"

    def reader(self, schema: StructType) -> StatementTextReader:
        return StatementTextReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(StatementTextDataSource)
