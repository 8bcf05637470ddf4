"""Driver contract for the spark-graft builder (PySpark target).

Thin projection of :mod:`udacity_data_engineer_capstone_spark.registry`:
every implemented operator from SURVEY.md §2 (plus the LLM-data-pipeline
extensions) registers a (PySpark fn, DuckDB oracle SQL) pair there; this
module just exposes the dicts in the shape the driver expects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import udacity_data_engineer_capstone_spark as engine

engine.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from udacity_data_engineer_capstone_spark.queries.flagship import (
        flagship_regional_revenue,
    )

    return flagship_regional_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return engine.get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops → rows-only check)."""
    return engine.get_oracles()
