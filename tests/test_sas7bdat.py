"""SAS7BDAT writer/reader: the binary layout is validated by round-trip
through pandas' *independent* SAS parser (a separate public
implementation of the format), then through the engine's Spark-facing
reader. A writer bug in any header field, subheader offset, or page
layout makes pandas' reader throw or mis-read — so these tests pin the
format, not just self-consistency."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from udacity_data_engineer_capstone_spark.sources.sas7bdat import (
    read_sas7bdat,
    write_sas7bdat,
)

COLS = [
    ("k", "num", 8),
    ("price", "num", 8),
    ("status", "str", 3),
]


def _rows(n: int):
    st = ["OK", "ERR", "NEW"]
    return [(float(i), i + 0.25, st[i % 3]) for i in range(1, n + 1)]


def test_pandas_parses_written_file_single_page(tmp_path):
    path = str(tmp_path / "small.sas7bdat")
    write_sas7bdat(path, COLS, _rows(10), dataset_name="SMALL")
    df = pd.read_sas(path, format="sas7bdat", encoding="utf-8")
    assert list(df.columns) == ["k", "price", "status"]
    assert df.shape == (10, 3)
    assert df["k"].tolist() == [float(i) for i in range(1, 11)]
    assert df["status"].tolist() == [["OK", "ERR", "NEW"][i % 3] for i in range(1, 11)]


def test_pandas_parses_written_file_multi_page(tmp_path):
    path = str(tmp_path / "big.sas7bdat")
    n = 3000  # row_length 19 → hundreds of rows per 4 KiB page → many pages
    write_sas7bdat(path, COLS, _rows(n), dataset_name="BIG")
    df = pd.read_sas(path, format="sas7bdat", encoding="utf-8")
    assert df.shape == (n, 3)
    # page boundaries must not tear rows: spot-check whole columns
    assert df["k"].tolist() == [float(i) for i in range(1, n + 1)]
    assert (df["price"] == [i + 0.25 for i in range(1, n + 1)]).all()


def test_pandas_chunked_read_agrees(tmp_path):
    path = str(tmp_path / "chunked.sas7bdat")
    write_sas7bdat(path, COLS, _rows(777), dataset_name="CHUNK")
    with pd.read_sas(path, format="sas7bdat", chunksize=100, encoding="utf-8") as rdr:
        total = sum(len(c) for c in rdr)
    assert total == 777


def test_spark_reader_roundtrip(spark, tmp_path):
    path = str(tmp_path / "spark.sas7bdat")
    write_sas7bdat(path, COLS, _rows(500), dataset_name="SPARK")
    df = read_sas7bdat(spark, path)
    assert df.count() == 500
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert got == {"k": "double", "price": "double", "status": "string"}
    from pyspark.sql import functions as F

    agg = df.agg(
        F.sum("k").alias("sk"), F.countDistinct("status").alias("ns")
    ).collect()[0]
    assert agg.sk == sum(range(1, 501)) and agg.ns == 3


def test_spark_reader_stage_is_cached(spark, tmp_path):
    path = str(tmp_path / "cached.sas7bdat")
    write_sas7bdat(path, COLS, _rows(50), dataset_name="CACHED")
    read_sas7bdat(spark, path)
    import glob
    import tempfile

    stage_root = os.path.join(
        tempfile.gettempdir(), f"engine_sas7bdat_{os.getuid()}"
    )
    before = set(glob.glob(os.path.join(stage_root, "*cached*")))
    assert before  # staged once
    read_sas7bdat(spark, path)
    assert set(glob.glob(os.path.join(stage_root, "*cached*"))) == before


def test_writer_rejects_nothing_but_reader_strips_padding(tmp_path):
    # SAS fixed-width semantics: trailing spaces are padding, stripped on
    # read; over-width strings truncate at the declared byte width.
    path = str(tmp_path / "pad.sas7bdat")
    write_sas7bdat(
        path,
        [("s", "str", 4)],
        [("ab",), ("abcdEF",), ("",)],
    )
    df = pd.read_sas(path, format="sas7bdat", encoding="utf-8")
    vals = df["s"].tolist()
    assert vals[0] == "ab" and vals[1] == "abcd"
    # all-space/empty strings surface as missing (NaN) — SAS semantics
    assert pd.isna(vals[2])
