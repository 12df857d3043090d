"""Custom Python DataSource (Spark 4 DataSource API): the reference's
rows-edge (Google-Sheets-style ``{"values": [[...], ...]}`` payloads,
/root/reference/src/gsheets_handler.py:81-171) as a first-class
``spark.read.format("fbs_rows")`` / ``df.write.format("fbs_rows")``.

Why a DataSource and not a helper function: the reader plans real
partitions (executors parse slices of the payload in parallel — the
scan scales with cores, unlike a driver-side ``createDataFrame``), and
the writer follows the task-commit protocol (tasks emit row batches as
commit messages; the driver uploads once in ``commit()`` — exactly the
shape a real Sheets/API sink needs for all-or-nothing semantics).

Payload contract (mirrors the Sheets values API):
    {"values": [[header...], [row...], ...]}
First row = header; data rows are all-string, ragged rows padded with
nulls (utils_.py:18-29 semantics). Types are imposed downstream by the
schema registry, as everywhere in this engine.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StringType, StructField, StructType


class _RowsPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RowsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.path = options["path"]
        self.num_partitions = int(options.get("numpartitions", "4"))

    def partitions(self):
        payload = json.load(open(self.path))
        n = len(payload.get("values", [])) - 1  # minus header
        n = max(n, 0)
        per = max(1, -(-n // self.num_partitions))
        return [
            _RowsPartition(i, min(i + per, n)) for i in range(0, n, per)
        ] or [_RowsPartition(0, 0)]

    def read(self, partition: _RowsPartition):
        # executor-side: parse only this partition's slice
        payload = json.load(open(self.path))
        values = payload.get("values", [])
        width = len(self.schema_.fields)
        for row in values[1 + partition.start : 1 + partition.end]:
            padded = [
                None if v == "" else str(v) for v in row[:width]
            ] + [None] * (width - len(row))
            yield tuple(padded)


class _RowsCommit(WriterCommitMessage):
    def __init__(self, rows: list):
        self.rows = rows


class RowsWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.path = options["path"]

    def write(self, iterator):
        # task-side: serialize this partition's rows into the commit
        # message (the driver-bound edge is the COMMIT, not the tasks)
        return _RowsCommit([list(r) for r in iterator])

    def commit(self, messages):
        header = [f.name for f in self.schema_.fields]
        rows: list = []
        for m in messages:
            rows.extend(m.rows)
        with open(self.path, "w") as f:
            json.dump({"values": [header] + rows}, f)

    def abort(self, messages):  # pragma: no cover
        pass


class RowsDataSource(DataSource):
    """format name: ``fbs_rows``."""

    @classmethod
    def name(cls) -> str:
        return "fbs_rows"

    def schema(self):
        payload = json.load(open(self.options["path"]))
        header = payload["values"][0] if payload.get("values") else []
        return StructType([StructField(str(h), StringType()) for h in header])

    def reader(self, schema: StructType) -> RowsReader:
        return RowsReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> RowsWriter:
        return RowsWriter(schema, self.options)


def register(spark) -> None:
    """Register the format with a session: ``register(spark)`` then
    ``spark.read.format('fbs_rows').option('path', p).load()``."""
    spark.dataSource.register(RowsDataSource)
