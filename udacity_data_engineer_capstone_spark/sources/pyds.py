"""Custom Spark DataSource (Python Data Source API, Spark 4) for SAS
``proc format`` label files.

Where :mod:`.sas_labels` parses a block on the driver and lifts it with
``createDataFrame`` (right for one small dim), this source plugs the same
parser into Spark's scan machinery: ``spark.read.format("sas_labels")``
returns a DataFrame whose partitions are the file's label blocks, parsed
*in the executors*. Planning reads only block names (metadata); payload
parsing is distributed — the shape that scales to a directory of
dictionary files or any bespoke text format Spark has no built-in reader
for. This is the extension point a user reaches when the reference's
ad-hoc driver-side parsing (``/root/reference/etl.py:20-38``) meets a
file too large or too numerous to parse on one machine.
"""

from __future__ import annotations

import re

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from udacity_data_engineer_capstone_spark.sources.sas_labels import (
    parse_label_block,
)

LABELS_DS_SCHEMA = "fmt string, code string, value string"


class _BlockPartition(InputPartition):
    def __init__(self, fmt: str):
        self.fmt = fmt


class _LabelsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self):
        # planning: only block *names* are read driver-side
        with open(self.path, encoding="utf-8", errors="replace") as fh:
            text = fh.read()
        return [_BlockPartition(f) for f in re.findall(r"value\s+(\w+)", text)]

    def read(self, partition: _BlockPartition):
        # executor-side: parse one block
        with open(self.path, encoding="utf-8", errors="replace") as fh:
            text = fh.read()
        for code, value in parse_label_block(text, partition.fmt):
            yield (partition.fmt, code, value)


class SasLabelsDataSource(DataSource):
    """``spark.read.format("sas_labels").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "sas_labels"

    def schema(self) -> str:
        return LABELS_DS_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _LabelsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom format."""
    spark.dataSource.register(SasLabelsDataSource)
