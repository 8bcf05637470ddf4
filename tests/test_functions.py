"""Unit tests for engine function modules (dates, cleaning, quality,
sas_labels parser)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.functions.cleaning import (
    normalize_junk_labels,
    split_city_state,
)
from udacity_data_engineer_capstone_spark.functions.dates import (
    sas_day_to_iso_string,
)
from udacity_data_engineer_capstone_spark.functions.quality import (
    DataQualityError,
    dq_count,
    dq_nonempty,
)
from udacity_data_engineer_capstone_spark.sources.sas_labels import (
    parse_label_block,
    render_label_block,
)


def test_sas_date_quirk(spark):
    df = spark.createDataFrame(
        [(1, 20574.0), (2, 0.0), (3, None), (4, 1.0)], "id int, d double"
    )
    rows = {
        r.id: r.iso
        for r in df.select("id", sas_day_to_iso_string(F.col("d")).alias("iso")).collect()
    }
    assert rows[1] == "2016-04-30"
    assert rows[2] is None  # day 0 → NULL (reference bug-compat, etl.py:140)
    assert rows[3] is None
    assert rows[4] == "1960-01-02"


def test_sas_date_no_bug_compat(spark):
    df = spark.createDataFrame([(0.0,)], "d double")
    row = df.select(
        sas_day_to_iso_string(F.col("d"), bug_compat=False).alias("iso")
    ).collect()[0]
    assert row.iso == "1960-01-01"


def test_junk_label_normalization(spark):
    df = spark.createDataFrame(
        [
            ("No Country Code (583)",),
            ("INVALID: STATELESS",),
            ("Collapsed (whatever)",),
            ("ALBANIA",),
        ],
        "name string",
    )
    vals = [
        r.out for r in df.select(normalize_junk_labels(F.col("name")).alias("out")).collect()
    ]
    assert vals == ["NA", "NA", "NA", "ALBANIA"]


def test_split_city_state(spark):
    df = spark.createDataFrame(
        [("ATLANTA, GA",), ("WASHINGTON DC, DC ",), ("No PORT Code (99)",)],
        "label string",
    )
    city, state = split_city_state(F.col("label"))
    rows = df.select(city.alias("c"), state.alias("s")).collect()
    assert (rows[0].c, rows[0].s) == ("ATLANTA", "GA")
    assert (rows[1].c, rows[1].s) == ("WASHINGTON DC", "DC")
    assert rows[2].c == "No PORT Code (99)"
    assert rows[2].s is None  # comma-less label → NULL state


def test_label_parser_roundtrip():
    pairs = [("1", "Air"), ("99", "All Other Codes"), ("X", "A, B")]
    text = "junk\n" + render_label_block("fmt_x", pairs) + "more = junk ;\n"
    assert parse_label_block(text, "fmt_x") == pairs


def test_label_parser_no_semicolon_swallows_comments():
    # A block with no ';' of its own runs to the next ';' (reference
    # semantics, etl.py:25-26) — non-assignment lines are dropped.
    text = "value visafmt\n 1 = Business\n 2 = Pleasure\nsome comment\nrun ;"
    assert parse_label_block(text, "visafmt") == [("1", "Business"), ("2", "Pleasure")]


def test_label_parser_missing_label():
    assert parse_label_block("nothing here ;", "nope") == []


def test_dq_raises(spark):
    empty = spark.createDataFrame([], "a int")
    with pytest.raises(DataQualityError):
        dq_nonempty(empty, "empty_table")
    with pytest.raises(DataQualityError):
        dq_count(empty, "empty_table")
    ok = spark.createDataFrame([(1,)], "a int")
    dq_nonempty(ok, "ok")
    assert dq_count(ok, "ok") == 1
