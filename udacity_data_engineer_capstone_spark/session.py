"""SparkSession factory tuned for this engine.

The reference creates a bare session with Hive support
(``/root/reference/etl.py:226-228``) and leaves every performance knob at
its default. Here we turn on the settings a large cluster run depends on:
AQE (runtime re-planning, skew-join splitting, partition coalescing),
Arrow for any pandas exchange, and a shuffle-partition count sized for the
local harness (on a real cluster this is overridden by
``spark.sql.adaptive.coalescePartitions`` anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "udacity_data_engineer_capstone_spark") -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism so the bench driver
    controls core count.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
    )
    # Parity with the reference's enableHiveSupport() (etl.py:228),
    # opt-in: this engine uses temp views and needs no metastore, but a
    # deployment with an existing Hive catalog can turn it on without
    # code changes (SPARK_GRAFT_HIVE=1 → derby/remote metastore per
    # spark-defaults). Off by default so tests never create a
    # metastore_db directory.
    if os.environ.get("SPARK_GRAFT_HIVE"):
        builder = builder.enableHiveSupport()
    return configure(builder).getOrCreate()


def configure(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Apply engine configs to any builder (used when the driver owns the
    session)."""
    return (
        builder
        # AQE: runtime partition coalescing, skew-join splitting, and
        # broadcast-join demotion/promotion from observed sizes. At 100 TB
        # this is what keeps a bad static shuffle-partition guess survivable.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Sized for local[32] at sf<=0.1; AQE coalesces below this, and a
        # real cluster submit would raise it (rule of thumb: ~2-3x cores,
        # partitions of 64-256 MB post-shuffle).
        .config("spark.sql.shuffle.partitions", "32")
        # Scan-split sizing: the default 4 MB open-cost floor collapses
        # multi-MB inputs into a handful of splits, serializing the scan
        # stage on a 32-core host. 128 KB keeps split count ≈ input/cores
        # for small inputs while maxPartitionBytes (128 MB default) still
        # governs real cluster-scale files.
        .config("spark.sql.files.openCostInBytes", str(128 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics vs the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
