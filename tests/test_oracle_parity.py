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
    from tests.oracle import assert_no_decimal

    df = engine.QUERIES[name].fn(spark, sf_dir)
    assert_no_decimal(name, df)
    assert df.count() >= 0


# EVERY oracled query also runs at sf0.01 — the driver's gate scale:
# ties, empty samples, sketch edge cases, and decimal/int type drift
# only appear with more rows, and the driver rotates its sample, so any
# query may be the next one checked.
MED_SCALE = ORACLED


@pytest.mark.parametrize("name", MED_SCALE)
def test_query_matches_oracle_med(spark, name):
    from tests.conftest import SF_DIR_MED

    compare(spark, name, SF_DIR_MED)
