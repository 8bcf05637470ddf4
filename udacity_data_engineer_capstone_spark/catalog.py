"""Typed source catalog.

Replaces the reference's ``cp.cfg`` + ad-hoc readers (SURVEY §2.1,
``/root/reference/etl.py:11-17``) with a declarative table registry: one
place knows where each table lives and how to read it, and registers temp
views so both the DataFrame and SQL surfaces see the same names.

All testdata tables are parquet; at 100 TB this is exactly the layout you
want (columnar scan, predicate pushdown, partition pruning all free).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


# --- layout normalization (TEST-ENVIRONMENT SHIM — not a production path) ----
#
# Spark parallelizes parquet scans at ROW-GROUP granularity: a file with a
# single row group decodes in one task no matter how many byte-range splits
# the scheduler makes, so a big single-row-group input serializes every
# downstream query's scan stage. That is a storage-layout defect, and the
# warehouse-native fix is to normalize layout once at ingest — the
# DISTRIBUTED rewrite implemented in ``maintenance.compact_parquet`` and
# registered as ``snk_compaction_rewrite`` (planning half:
# ``snk_compaction_plan``). THIS shim is the driver-local pyarrow twin of
# that job, scoped to the test environment where inputs are small local
# files; it must never carry production data (set
# ``SPARK_GRAFT_DISABLE_LAYOUT_SHIM=1`` to hard-disable it and serve
# original paths — a cluster deployment runs the maintenance job instead).
# Tables whose layout already feeds the cores are read as-is (bypass pinned
# in tests/test_maintenance.py). The rewrite is one-time, keyed by
# (path, mtime, size) for staleness, written atomically into a per-user
# 0700 cache dir (ADVICE round 2: no predictable world-shared paths, no
# partial reads under concurrency). Oracles keep reading the ORIGINAL
# files — only Spark's scan path is redirected, the rows are
# byte-identical.

_MIN_ROWS_TO_NORMALIZE = 50_000
_TARGET_ROW_GROUPS = 32


def _layout_cache_dir() -> str | None:
    import stat
    import tempfile

    d = os.path.join(
        tempfile.gettempdir(), f"engine_layout_cache_{os.getuid()}"
    )
    os.makedirs(d, mode=0o700, exist_ok=True)
    # mode=0o700 applies only on creation: verify ownership and perms so
    # a directory pre-created by another local user can't feed us
    # substituted parquet (cache poisoning). On mismatch, disable the
    # cache rather than read attacker-controllable files.
    st = os.stat(d)
    if st.st_uid != os.getuid() or stat.S_IMODE(st.st_mode) & 0o077:
        return None
    return d


def _normalized_path(sf_dir: str, name: str) -> str:
    """Return a read path for the table with scan-parallel layout,
    rewriting once into the cache dir if the source needs it.

    TEST-ONLY shim (see module comment): production layout repair is
    the distributed ``maintenance.compact_parquet`` job; this exists
    because the test inputs are driver-local files. Disabled entirely
    by ``SPARK_GRAFT_DISABLE_LAYOUT_SHIM=1``."""
    src = table_path(sf_dir, name)
    if os.environ.get("SPARK_GRAFT_DISABLE_LAYOUT_SHIM"):
        return src
    try:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(src)
        rows = meta.metadata.num_rows
        if rows < _MIN_ROWS_TO_NORMALIZE or meta.num_row_groups >= max(
            4, _TARGET_ROW_GROUPS // 2
        ):
            return src
        cache_dir = _layout_cache_dir()
        if cache_dir is None:  # untrusted cache dir — serve the original
            return src
        st = os.stat(src)
        # no leading "_"/"." — Spark skips those as hidden/metadata files
        key = (
            os.path.abspath(src).replace("/", "_").strip("_")
            + f"-{st.st_mtime_ns}-{st.st_size}"
        )
        dst = os.path.join(cache_dir, f"{key}.parquet")
        if not os.path.exists(dst):
            tbl = meta.read()
            tmp = f"{dst}.tmp.{os.getpid()}"
            pq.write_table(
                tbl,
                tmp,
                row_group_size=max(8192, rows // _TARGET_ROW_GROUPS),
                compression="snappy",
            )
            os.replace(tmp, dst)  # atomic; concurrent writers converge
        return dst
    except Exception:
        return src  # any surprise (no pyarrow, unreadable) → original path


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(_normalized_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Some testdata generations write events.parquet with TIMESTAMP(NANOS),
    which Spark's vectorized parquet reader rejects by default; others write
    plain microsecond timestamps. Handle both: read nanos as long (legacy
    conf is runtime-settable) and rebuild a microsecond timestamp with exact
    integer division — nanos since epoch exceed 2^53, so float division
    would corrupt low microseconds. When the file already carries a real
    timestamp, pass it through unchanged."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(_normalized_path(sf_dir, "events"))
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        # Microsecond-timestamp generations read as TIMESTAMP_NTZ; normalize
        # to session-tz TIMESTAMP so downstream instant functions
        # (unix_micros, window(), watermarks) see the same type the nanos
        # path produced. Session tz is UTC here, so the instant is unchanged.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (SURVEY §2.1
    ``src_temp_view``, cf. ``etl.py:152-157``). Idempotent."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def load_table_scaled(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load_table`` + a *conditional* repartition to the session's
    default parallelism, for CPU-heavy per-row operators (shingling,
    hashing, vector encoding).

    Why: a small parquet file scans as ONE split (parallelism is bounded
    by row groups, not ``maxPartitionBytes``), so an expensive
    projection over it runs serially no matter how many cores exist. At
    100 TB a scan already yields thousands of splits, the condition is
    false, and this is a no-op — the repartition exists precisely and
    only for the narrow-input/heavy-compute shape, where one round-robin
    shuffle of the (tiny) input buys full-cluster parallelism for the
    expensive stage above it."""
    df = load_table(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:  # plan-time check, no job
        df = df.repartition(target)
    return df
