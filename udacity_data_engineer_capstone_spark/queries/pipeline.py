"""Driver-visible entries for the full i94 pipeline (rows-only checks).

The pipeline consumes reference-shaped fixture inputs, not the TPC-H
testdata, so no DuckDB oracle is possible over the pre-registered views —
the driver records rows-only checks. Fixture generation is seeded, so row
counts are stable across runs.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from udacity_data_engineer_capstone_spark.pipelines import i94
from udacity_data_engineer_capstone_spark.registry import query
from udacity_data_engineer_capstone_spark.sources import i94_fixtures


def _run_pipeline(spark: SparkSession) -> dict[str, DataFrame]:
    base = tempfile.mkdtemp(prefix="engine_i94_")
    p = i94_fixtures.generate(base)
    paths = i94.I94Paths(
        labels=p["labels"],
        demographics=p["demographics"],
        immigration=p["immigration"],
        output=p["output"],
    )
    return i94.run(spark, paths, write=False)


@query("pipe_i94_fact", tags=("pipeline",))
def pipe_i94_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference dataflow (etl.py:224-266) → immigrations fact."""
    return _run_pipeline(spark)["immigrations"]


@query("pipe_i94_port_demographics", tags=("pipeline",))
def pipe_i94_port_demographics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference dataflow → port_demographics dim."""
    return _run_pipeline(spark)["port_demographics"]
