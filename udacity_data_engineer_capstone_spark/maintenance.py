"""Distributed table-maintenance jobs (the production analog of the
test-env layout shim in ``catalog._normalized_path``).

``compact_parquet`` is the OPTIMIZE / rewriteDataFiles execution half:
given a parquet table whose physical layout is wrong for scan
parallelism (small files from streaming ingest, or giant
single-row-group files from a bad writer), rewrite it so every file
lands near a target size. The rewrite is a plain
``read → repartition(n) → write`` — fully distributed, no driver data
movement; only the file LISTING (metadata, one row per file) touches
the driver, exactly like every table-maintenance service.

Sizing rule: ``n_out = clamp(ceil(total_bytes / target_bytes), 1,
...)`` with total_bytes from the FileSystem listing — so output files
land on the target regardless of input file count (a million 100 KB
files and ten 10 GB files both converge to the same layout).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CompactionStats:
    n_input_files: int
    input_bytes: int
    n_output_files: int
    target_bytes: int


def _list_data_files(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_files, total_bytes) via the Hadoop FileSystem API — works on
    local paths here and on HDFS/S3A unchanged; hidden/_metadata files
    excluded like Spark's own scan listing."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n = total = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n += 1
        total += f.getLen()
    return n, total


def plan_output_files(input_bytes: int, target_bytes: int) -> int:
    """ceil(bytes / target), floored at 1 — the bin count the rewrite
    repartitions to. Pure so the rule is unit-testable."""
    return max(1, math.ceil(input_bytes / max(1, target_bytes)))


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 << 20,
) -> CompactionStats:
    """Rewrite parquet table ``src`` into ``dst`` with ~``target_bytes``
    files.

    Distributed end to end: executors read the old layout (however
    degenerate — row-group granularity bounds tasks, but the rewrite is
    one pass and afterwards every scan is parallel), round-robin
    repartition to the planned file count, and write one file per
    partition. ``parquet.block.size`` is capped at the target so even a
    single oversized output file still carries multiple row groups
    (scan parallelism within a file is row-group-bounded)."""
    n_in, in_bytes = _list_data_files(spark, src)
    n_out = plan_output_files(in_bytes, target_bytes)
    df = spark.read.parquet(src)
    (
        df.repartition(n_out)
        .write.mode("overwrite")
        # row groups no larger than ~1/4 target: a file then holds >=4
        # independently-decodable groups even when size estimation
        # drifts (compression ratios differ pre/post rewrite)
        .option("parquet.block.size", max(1 << 20, target_bytes // 4))
        .parquet(dst)
    )
    n_written, _ = _list_data_files(spark, dst)
    return CompactionStats(
        n_input_files=n_in,
        input_bytes=in_bytes,
        n_output_files=n_written,
        target_bytes=target_bytes,
    )


def layout_is_sane(
    path: str, min_rows: int = 50_000, min_row_groups: int = 16
) -> bool:
    """True when a parquet file's layout already feeds a multi-core
    scan: small enough not to matter, or enough row groups to split.
    Mirrors the bypass condition in ``catalog._normalized_path`` so the
    shim and the production job agree on 'sane'."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(path)
    return (
        meta.metadata.num_rows < min_rows
        or meta.num_row_groups >= min_row_groups
    )
