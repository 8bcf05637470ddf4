from __future__ import annotations

import pytest

from udacity_data_engineer_capstone_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("engine-tests")
    spark.sparkContext.setLogLevel("WARN")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
