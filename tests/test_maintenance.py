"""Distributed compaction job + layout-shim scoping (VERDICT r5 #2).

Proves three things:

1. ``maintenance.compact_parquet`` is a real distributed rewrite: a
   deliberately degenerate layout (one giant single-row-group file)
   comes out as ~target-sized multi-file parquet with identical rows;
2. the test-env pyarrow shim (``catalog._normalized_path``) is
   BYPASSED whenever layout is already sane — including for the
   compaction job's own output — and can be hard-disabled by env;
3. the sizing rule is exact (unit level).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark import catalog
from udacity_data_engineer_capstone_spark.maintenance import (
    compact_parquet,
    layout_is_sane,
    plan_output_files,
)


def test_plan_output_files_rule():
    assert plan_output_files(0, 1 << 20) == 1
    assert plan_output_files(1, 1 << 20) == 1
    assert plan_output_files((1 << 20) + 1, 1 << 20) == 2
    assert plan_output_files(100 << 20, 1 << 20) == 100


@pytest.fixture(scope="module")
def degenerate_table(spark, tmp_path_factory):
    """~4 MB single-file, single-row-group parquet — the layout that
    serializes a Spark scan (the round-3 testdata defect)."""
    d = str(tmp_path_factory.mktemp("degenerate"))
    path = os.path.join(d, "t.parquet")
    df = spark.range(200_000).select(
        F.col("id"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("s"),
    )
    pdf = df.toPandas()
    import pyarrow as pa

    pq.write_table(
        pa.Table.from_pandas(pdf), path, row_group_size=1_000_000
    )
    meta = pq.ParquetFile(path)
    assert meta.num_row_groups == 1  # genuinely degenerate
    return d, path, pdf


def test_compact_parquet_rewrites_distributed(spark, degenerate_table, tmp_path):
    d, path, pdf = degenerate_table
    dst = str(tmp_path / "compacted")
    target = 256 * 1024
    stats = compact_parquet(spark, d, dst, target_bytes=target)
    assert stats.n_input_files == 1
    assert stats.n_output_files == plan_output_files(stats.input_bytes, target)
    assert stats.n_output_files > 1  # the rewrite actually split
    # lossless: identical multiset of rows
    back = spark.read.parquet(dst)
    assert back.count() == len(pdf)
    assert (
        back.agg(F.sum("id")).collect()[0][0]
        == pdf["id"].sum()
    )
    # every output file is itself scan-parallel-friendly: near target
    # size (round-robin ⇒ uniform) — none more than 2x target
    sizes = [
        os.path.getsize(os.path.join(dst, f))
        for f in os.listdir(dst)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    assert sizes and max(sizes) <= 2 * target


def test_shim_bypassed_when_layout_sane(spark, degenerate_table, tmp_path):
    d, path, pdf = degenerate_table
    # (a) compacted output: many small files — per-file row counts are
    # tiny, so the shim's normalize condition is false for each
    dst = str(tmp_path / "compacted2")
    compact_parquet(spark, d, dst, target_bytes=256 * 1024)
    for f in os.listdir(dst):
        if f.endswith(".parquet") and not f.startswith(("_", ".")):
            assert layout_is_sane(os.path.join(dst, f))
    # (b) the catalog shim returns the ORIGINAL path for sane layouts:
    # sf0.001 tables are all under the row threshold
    src = catalog.table_path("/root/testdata/sf0.001", "orders")
    assert catalog._normalized_path("/root/testdata/sf0.001", "orders") == src


def test_shim_env_kill_switch(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_DISABLE_LAYOUT_SHIM", "1")
    # even a table that WOULD normalize is served from its original path
    for name in ("lineitem", "events"):
        src = catalog.table_path("/root/testdata/sf0.1", name)
        assert catalog._normalized_path("/root/testdata/sf0.1", name) == src


def test_oracle_slice_green_with_shim_disabled(spark, monkeypatch):
    """Correctness must not depend on the test-env layout shim: with
    SPARK_GRAFT_DISABLE_LAYOUT_SHIM=1 (original file paths served
    unconditionally) a cross-family slice still passes the full oracle
    gate. Pairs with test_cluster_profile.py: together they show the
    engine is correct under both re-sized sessions and raw layouts."""
    import udacity_data_engineer_capstone_spark as engine
    from tests.oracle import compare

    engine.load_all()
    monkeypatch.setenv("SPARK_GRAFT_DISABLE_LAYOUT_SHIM", "1")
    for name in (
        "agg_groupby_sum",
        "join_left_5way",
        "dedup_minhash_lsh",
        "evt_window_session",
        "tpch_q1_pricing_summary",
    ):
        compare(spark, name, "/root/testdata/sf0.001")
