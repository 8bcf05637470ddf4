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


# Scale-sensitive queries also run at sf0.01 (the driver's gate scale):
# ties, empty samples, and sketch edge cases only appear with more rows.
MED_SCALE = [
    n
    for n in ORACLED
    if n.startswith(("dedup_", "sim_", "text_", "evt_", "curate_"))
    or n in ("udaf_grouped_zscore", "agg_groupby_sum", "agg_summary_stats")
]


@pytest.mark.parametrize("name", MED_SCALE)
def test_query_matches_oracle_med(spark, name):
    from tests.conftest import SF_DIR_MED

    compare(spark, name, SF_DIR_MED)
