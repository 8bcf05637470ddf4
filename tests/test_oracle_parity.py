"""Run every registered query against its DuckDB oracle (driver-gate replica).

Parametrized over the registry, so each new operator gets parity coverage
for free the moment it registers an oracle.
"""

from __future__ import annotations

import pytest

import udacity_data_engineer_capstone_spark as engine
from tests.oracle import compare

engine.load_all()

ORACLED = [name for name, spec in engine.QUERIES.items() if spec.oracle]
NO_ORACLE = [name for name, spec in engine.QUERIES.items() if not spec.oracle]


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, name):
    compare(spark, name, sf_dir)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(spark, sf_dir, name):
    df = engine.QUERIES[name].fn(spark, sf_dir)
    assert df.count() >= 0
