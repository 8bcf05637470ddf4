"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs a registered query's PySpark implementation and its DuckDB oracle SQL
over the same parquet tables, then compares row count, column names, and
order-insensitive values (exact for non-floats, relative tolerance for
floats — Spark and DuckDB sum doubles in different orders).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from udacity_data_engineer_capstone_spark.catalog import TABLES, table_path
from udacity_data_engineer_capstone_spark.registry import QUERIES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


def _values_match(a, b, rel_tol=1e-6) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=rel_tol, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_match(x, y) for x, y in zip(a, b))
    return a == b


def compare(spark, name: str, sf_dir: str) -> None:
    """Assert the Spark query and its oracle agree at ``sf_dir``."""
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [
        tuple(_canon(row[c]) for c in spark_cols) for row in sdf.collect()
    ]

    assert spec.oracle is not None, f"{name} has no oracle"
    con = duckdb_con(sf_dir)
    res = con.execute(spec.oracle)
    duck_cols_raw = [d[0] for d in res.description]
    order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
    duck_cols = [duck_cols_raw[i] for i in order]
    duck_rows = [tuple(_canon(r[i]) for i in order) for r in res.fetchall()]

    assert spark_cols == duck_cols, (
        f"{name}: column mismatch spark={spark_cols} duckdb={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count mismatch spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )

    spark_rows.sort(key=_sort_key)
    duck_rows.sort(key=_sort_key)
    bad = [
        (i, s, d)
        for i, (s, d) in enumerate(zip(spark_rows, duck_rows))
        if not _values_match(s, d)
    ]
    assert not bad, f"{name}: {len(bad)} mismatched rows; first 3: {bad[:3]}"
