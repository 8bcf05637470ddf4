"""End-to-end tests for the reference-shaped i94 pipeline (SURVEY §7 M2)."""

from __future__ import annotations

import os

import pytest

from udacity_data_engineer_capstone_spark.functions.quality import DataQualityError
from udacity_data_engineer_capstone_spark.pipelines import i94
from udacity_data_engineer_capstone_spark.sources import i94_fixtures


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("i94"))
    p = i94_fixtures.generate(base)
    paths = i94.I94Paths(
        labels=p["labels"],
        demographics=p["demographics"],
        immigration=p["immigration"],
        output=p["output"],
    )
    tables = i94.run(spark, paths, write=True)
    return paths, tables


def test_fact_filters_unknown_codes(pipeline_out):
    _, tables = pipeline_out
    fact = tables["immigrations"]
    n = fact.count()
    # ~2% junk port/country codes, '99'/'XX' states, NULL modes → dropped
    assert 0 < n < 5000
    states = {r.state_code for r in fact.select("state_code").distinct().collect()}
    assert "99" not in states and "XX" not in states
    assert set(fact.columns) == set(i94.FACT_COLUMNS)


def test_fact_date_semantics(pipeline_out):
    _, tables = pipeline_out
    fact = tables["immigrations"]
    schema = dict(fact.dtypes)
    assert schema["arrival_date"] == "string"  # ISO string, like the UDF's output
    assert schema["departure_date"] == "double"  # raw SAS day-count, never decoded
    dates = [r.arrival_date for r in fact.select("arrival_date").collect()]
    decoded = [d for d in dates if d is not None]
    assert decoded and all(d.startswith("2016-") for d in decoded)
    assert any(d is None for d in dates)  # day-0 / NULL arrdate rows survive joins


def test_country_junk_normalized(pipeline_out):
    _, tables = pipeline_out
    vals = [r.value for r in tables["country"].collect()]
    assert "NA" in vals
    assert not any(
        v.startswith(("No Country", "INVALID", "Collapsed")) for v in vals
    )


def test_port_split(pipeline_out):
    _, tables = pipeline_out
    ports = {r.code: r for r in tables["port"].collect()}
    assert ports["P00"].city == "SPRINGFIELD"
    assert ports["P00"].state_code == "AA"  # trailing blanks trimmed
    assert ports["X00"].state_code is None  # comma-less label


def test_port_demographics_types_and_values(pipeline_out):
    paths, tables = pipeline_out
    pd_dim = tables["port_demographics"]
    schema = dict(pd_dim.dtypes)
    # implicit-cast signature (SURVEY §2.6): string SUM → double, int SUM → long
    assert schema["total_male_population"] == "double"
    assert schema["total_population"] == "bigint"
    assert schema["port_code"] == "string"
    assert pd_dim.count() > 0

    # independent recomputation via pandas over the generator's CSV
    import pandas as pd

    raw = pd.read_csv(paths.demographics, sep=";")
    raw = raw[raw.state_code.notna()]
    row = pd_dim.orderBy("port_code").first()
    grp = raw[
        (raw.city.str.lower() == row.city.lower()) & (raw.state_code == row.state_code)
    ]
    assert float(grp.male_population.astype(float).sum()) == row.total_male_population
    assert int(grp.total_population.sum()) == row.total_population


def test_partitioned_layout(pipeline_out):
    paths, _ = pipeline_out
    fact_dir = f"{paths.output}/immigrations"
    years = [d for d in os.listdir(fact_dir) if d.startswith("year=")]
    assert years, f"no year partitions in {os.listdir(fact_dir)}"
    months = os.listdir(os.path.join(fact_dir, years[0]))
    assert any(m.startswith("month=") for m in months)
    pd_dir = f"{paths.output}/port_demographics"
    assert any(d.startswith("state_code=") for d in os.listdir(pd_dir))
    for dim in ("mode", "visa_type", "state", "country", "port"):
        assert os.path.isdir(f"{paths.output}/{dim}")


def test_visa_block_without_semicolon(pipeline_out):
    _, tables = pipeline_out
    visas = {r.code: r.value for r in tables["visa_type"].collect()}
    # the comment line inside the block must have been dropped
    assert visas == {"1": "Business", "2": "Pleasure", "3": "Student"}


def test_dq_raises_on_empty_input(spark, tmp_path):
    base = str(tmp_path)
    p = i94_fixtures.generate(base)
    # truncate the fact input to zero rows, preserving column types
    import pyarrow.parquet as pq

    t = pq.read_table(p["immigration"])
    pq.write_table(t.slice(0, 0), p["immigration"])
    paths = i94.I94Paths(
        labels=p["labels"],
        demographics=p["demographics"],
        immigration=p["immigration"],
        output=p["output"],
    )
    with pytest.raises(DataQualityError):
        i94.run(spark, paths, write=False)


def test_cli_entry_runs_full_etl_from_ini_config(spark, tmp_path):
    """CLI parity with `python etl.py` (readme.md:83): an INI config in
    the reference's cp.cfg shape drives load→clean→build→DQ→write via
    i94.main(); the partitioned star schema is re-read and
    row-counted. The module is also invocable as `python -m ...` (the
    __main__ hook is exercised subprocess-side via --help so the test
    doesn't boot a second JVM)."""
    import subprocess
    import sys

    base = str(tmp_path)
    p = i94_fixtures.generate(base)
    cfg_path = os.path.join(base, "cp.cfg")
    with open(cfg_path, "w") as fh:
        fh.write(
            "[PATHS]\n"
            f"SAS_LABELS_DESCRIPTION_FILE_PATH={p['labels']}\n"
            f"IMMIGRATION_DATA_PATH={p['immigration']}\n"
            f"DEMOGRAPHIC_DATA_PATH={p['demographics']}\n"
            f"OUTPUT_PATH={p['output']}/\n"
        )
    assert i94.main([cfg_path]) == 0

    out = p["output"]
    fact = spark.read.parquet(f"{out}/immigrations")
    assert 0 < fact.count() < 5000
    # partitioned layout: partition columns come back from directories
    assert {"year", "month", "state_code"} <= set(fact.columns)
    demo = spark.read.parquet(f"{out}/port_demographics")
    assert demo.count() > 0 and "state_code" in demo.columns
    for name in ("mode", "visa_type", "state", "country", "port"):
        assert spark.read.parquet(f"{out}/{name}").count() > 0

    # missing config fails loudly, like a misconfigured reference run
    with pytest.raises(FileNotFoundError):
        i94.main([os.path.join(base, "nope.cfg")])

    # the python -m surface exists and parses args
    r = subprocess.run(
        [sys.executable, "-m",
         "udacity_data_engineer_capstone_spark.pipelines.i94", "--help"],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0 and "cp.cfg" in r.stdout
