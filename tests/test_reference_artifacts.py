"""Fidelity loop against the REAL reference data artifacts.

The engine's SAS-label parser and demographics CSV schema are otherwise
exercised only on fixture-shaped synthetic inputs; these tests feed the
actual files shipped with the reference
(``/root/reference/I94_SAS_Labels_Descriptions.SAS``,
``/root/reference/us-cities-demographics.csv``) through the same code
paths and assert the externally-known shapes — closing the gap between
"fixture-shaped parses" and "the actual artifact parses".

Known shapes (cited from the reference tree):
- dictionary cardinalities: countries 289
  (``I94_SAS_Labels_Descriptions.SAS:9-298``), ports 660 (``:302-963``),
  modes 4 (``:972-976``), states 55 (``:981-1036``), visas 3
  (``:1046-1050``);
- demographics: 2,891 data rows (2,892 file lines incl. header,
  ``readme.md`` data dictionary), 12-column ``;``-separated schema
  (``etl.py:87-100``).

Skipped gracefully when the reference tree is not mounted (the suite
must stay runnable from a bare checkout).
"""

from __future__ import annotations

import os

import pytest

from udacity_data_engineer_capstone_spark.pipelines.i94 import (
    DEMOGRAPHICS_SCHEMA,
    load_demographics,
    load_dimensions,
)

_REF = "/root/reference"
_SAS = os.path.join(_REF, "I94_SAS_Labels_Descriptions.SAS")
_CSV = os.path.join(_REF, "us-cities-demographics.csv")

needs_reference = pytest.mark.skipif(
    not os.path.exists(_SAS), reason="reference tree not mounted"
)


@needs_reference
def test_real_sas_labels_dictionary_cardinalities(spark):
    dims = load_dimensions(spark, _SAS)
    assert {k: v.count() for k, v in dims.items()} == {
        "countries": 289,
        "ports": 660,
        "modes": 4,
        "states": 55,
        "visas": 3,
    }
    # spot-check decoded values survive quote/whitespace stripping: every
    # code is non-empty and no value retains surrounding quotes
    for df in dims.values():
        rows = df.collect()
        assert all(r.code and not r.code.startswith(("'", '"')) for r in rows)
        assert all(r.value is not None and not r.value.startswith(("'", '"')) for r in rows)
    # the modes block is small enough to pin exactly (public I94 format)
    assert dict(dims["modes"].collect()) == {
        "1": "Air",
        "2": "Sea",
        "3": "Land",
        "9": "Not reported",
    }


@needs_reference
def test_real_demographics_csv_parses_with_reference_schema(spark):
    df = load_demographics(spark, _CSV)
    assert df.schema == DEMOGRAPHICS_SCHEMA
    assert len(df.columns) == 12
    assert df.count() == 2891
    # structural integrity under the explicit schema: the typed key
    # columns parse as non-null everywhere (a delimiter/typing mismatch
    # would null them out in PERMISSIVE mode)
    from pyspark.sql import functions as F

    nulls = df.agg(
        F.sum(F.col("city").isNull().cast("int")).alias("city"),
        F.sum(F.col("state_code").isNull().cast("int")).alias("state_code"),
        F.sum(F.col("total_population").isNull().cast("int")).alias("pop"),
        F.sum(F.col("count").isNull().cast("int")).alias("count"),
    ).collect()[0]
    assert tuple(nulls) == (0, 0, 0, 0)
    # 49 distinct state codes appear in the file (fewer than the 55
    # dictionary entries — territories without city rows)
    assert df.select("state_code").distinct().count() == 49
