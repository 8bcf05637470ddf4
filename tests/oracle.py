"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs a registered query's PySpark implementation and its DuckDB oracle SQL
over the same parquet tables, then compares row count, column names,
**column result types** (strict: Spark's ``simpleString`` must equal the
canonicalized DuckDB result type — no HUGEINT, no decimal-precision drift,
no int-width drift), and order-insensitive values compared **exactly**
(no float tolerance, no Decimal→float collapse).

The driver's value hash is type-sensitive (round-2 evidence: identical
values at DECIMAL(33,4) vs DECIMAL(38,4), INT vs BIGINT rank, BIGINT vs
HUGEINT sum all hash-mismatched), so this gate is deliberately at least
as strict as the driver.
"""

from __future__ import annotations

import math
import re
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


# --- type canonicalization -------------------------------------------------

_DUCK_RENAMES = {
    "varchar": "string",
    "blob": "binary",
    "integer": "int",
    # Spark TIMESTAMP is session-tz (LTZ); DuckDB naive TIMESTAMP carries the
    # same wall-clock values — driver evidence (join_asof_event green) says
    # these hash equal.
    "timestamp with time zone": "timestamp",
}


def canon_duck_type(t: str) -> str:
    """DuckDB type string -> Spark ``simpleString`` style."""
    s = str(t).strip().lower()
    # nested lists: DOUBLE[] -> array<double> (recursion handles nesting)
    if s.endswith("[]"):
        return f"array<{canon_duck_type(s[:-2])}>"
    m = re.fullmatch(r"map\((.+),\s*(.+)\)", s)
    if m:
        return f"map<{canon_duck_type(m.group(1))},{canon_duck_type(m.group(2))}>"
    m = re.fullmatch(r"struct\((.+)\)", s)
    if m:
        # keep struct opaque-but-canonical: lowercase, collapse spaces
        return "struct<" + re.sub(r"\s+", " ", m.group(1)) + ">"
    if s in _DUCK_RENAMES:
        return _DUCK_RENAMES[s]
    return s  # bigint, int, double, float, decimal(p,s), date, timestamp,
    #           boolean, hugeint (never matches a Spark type — intended)


def canon_spark_type(t) -> str:
    s = t.simpleString()
    # Spark TIMESTAMP_NTZ and DuckDB naive TIMESTAMP are both Arrow
    # timestamp[us] (no tz) — identical; LTZ passed the driver too
    # (join_asof_event r1+r2), so all timestamp flavors canonicalize.
    return "timestamp" if s == "timestamp_ntz" else s


# --- value canonicalization (type-preserving) ------------------------------


def _canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return v  # exact; scale parity is enforced by the type check
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
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _sort_key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def assert_no_decimal(name: str, sdf) -> None:
    """Engine-wide invariant (COVERAGE.md; r2/r3 driver hash-fails):
    NO registered query may emit a DECIMAL anywhere in its result
    schema — including nested inside arrays/maps/structs. DECIMAL
    precision drift (33,4 vs 38,4; HUGEINT promotion) is the one class
    the driver's type-sensitive value hash punished; exact results ride
    in BIGINT cents/micros lanes instead."""
    bad = [
        f.name
        for f in sdf.schema.fields
        if "decimal" in f.dataType.simpleString().lower()
    ]
    assert not bad, (
        f"{name}: DECIMAL in result schema (driver-hash-unstable) "
        f"columns={bad}"
    )


def compare(spark, name: str, sf_dir: str) -> None:
    """Assert the Spark query and its oracle agree at ``sf_dir`` —
    column names, result types, row count, and exact values."""
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    assert_no_decimal(name, sdf)
    fields = {f.name: canon_spark_type(f.dataType) for f in sdf.schema.fields}
    spark_cols = sorted(sdf.columns)
    spark_types = [fields[c] for c in spark_cols]
    spark_rows = [
        tuple(_canon(row[c]) for c in spark_cols) for row in sdf.collect()
    ]

    assert spec.oracle is not None, f"{name} has no oracle"
    con = duckdb_con(sf_dir)
    rel = con.sql(spec.oracle_text())
    duck_cols_raw = list(rel.columns)
    duck_types_raw = [canon_duck_type(t) for t in rel.types]
    order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
    duck_cols = [duck_cols_raw[i] for i in order]
    duck_types = [duck_types_raw[i] for i in order]
    duck_rows = [tuple(_canon(r[i]) for i in order) for r in rel.fetchall()]

    assert spark_cols == duck_cols, (
        f"{name}: column mismatch spark={spark_cols} duckdb={duck_cols}"
    )
    type_diffs = [
        (c, st, dt)
        for c, st, dt in zip(spark_cols, spark_types, duck_types)
        if st != dt
    ]
    assert not type_diffs, (
        f"{name}: result-TYPE mismatch (driver hash would fail) "
        f"[(col, spark, duckdb)]: {type_diffs}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count mismatch spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )

    spark_rows.sort(key=_sort_key)
    duck_rows.sort(key=_sort_key)
    bad = [
        (i, s, d)
        for i, (s, d) in enumerate(zip(spark_rows, duck_rows))
        if s != d
    ]
    assert not bad, f"{name}: {len(bad)} mismatched rows; first 3: {bad[:3]}"
