"""Property tests for the aggregate-hash canonicalization
(tests/oracle._cell_exprs): the cross-engine rendering must be
bit-identical for ARBITRARY values of every supported cell type, not
just the hand-picked fixtures in test_agghash_oracle.py. Hypothesis
drives batches of random values through BOTH engines' cell
expressions and compares the rendered strings.

Batched deliberately: one Spark job per hypothesis example would take
minutes, so each property folds ~200 drawn values into a single
createDataFrame + one DuckDB VALUES query.
"""

from __future__ import annotations

from datetime import date, datetime, timezone

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

import udacity_data_engineer_capstone_spark as engine

engine.load_all()

from tests.oracle import _cell_exprs  # noqa: E402

# |x|*10^4 + 0.5 must stay inside int64 for the scaled-integer lane —
# the documented loud-abort boundary; stay a decade under it here
_DBL = st.floats(
    min_value=-9e13,
    max_value=9e13,
    allow_nan=False,
    allow_infinity=False,
)


def _spark_render(spark, values, sql_type, canon):
    cell = _cell_exprs("v", canon, "spark", 4)
    sdf = spark.createDataFrame([(v,) for v in values], f"v {sql_type}")
    return [r[0] for r in sdf.selectExpr(f"{cell} AS c").collect()]


def _duck_literal(v, duck_type):
    """One VALUES cell. Doubles go through a STRING cast: DuckDB parses
    a bare fractional literal as DECIMAL first (e.g. 1801439850948.6562
    → DECIMAL(17,4) → double, two roundings, bits ...4a7f) which lands
    1 ulp off the correctly-rounded string parse Python/Spark use
    (...4a80) — the r11 red parity test was exactly this ingestion
    artifact, not a rendering bug. CAST('<repr>' AS DOUBLE) is
    correctly rounded in both engines and matches the real gate, where
    both engines read identical parquet bits."""
    if isinstance(v, float):
        return f"(CAST('{v!r}' AS {duck_type}))"
    return f"(CAST({v!r} AS {duck_type}))"


def _duck_render(values, duck_type, canon):
    cell = _cell_exprs("v", canon, "duck", 4)
    con = duckdb.connect()
    rows = ", ".join(_duck_literal(v, duck_type) for v in values)
    return [
        r[0]
        for r in con.sql(
            f"SELECT {cell} AS c FROM (VALUES {rows}) t(v)"
        ).fetchall()
    ]


@settings(max_examples=3, deadline=None)
@given(st.lists(_DBL, min_size=1, max_size=200))
def test_double_rendering_parity(spark, vals):
    got_s = _spark_render(spark, vals, "double", "double")
    got_d = _duck_render(vals, "DOUBLE", "double")
    bad = [
        (v, a, b) for v, a, b in zip(vals, got_s, got_d) if a != b
    ]
    assert not bad, bad[:5]


def test_double_rendering_parity_r11_counterexample(spark):
    """Regression pin for the r11 hypothesis counterexample: the value
    whose x·10⁴ product sits past 2⁵³. With bit-identical ingestion
    (string parse both sides) the scaled-integer render must agree —
    the r11 divergence (…564 vs …560) was DuckDB's DECIMAL-literal
    ingestion skewing the input by 1 ulp, not the rendering."""
    vals = [1801439850948.6562, -1801439850948.6562, 9.007199254740992e11]
    assert _spark_render(spark, vals, "double", "double") == _duck_render(
        vals, "DOUBLE", "double"
    )


def test_boolean_rendering_null_preserving(spark):
    """NULL boolean must render as the chr(1) null marker in BOTH
    engines, distinct from false's '0' (ADVICE r11: a blanket ELSE '0'
    made NULL-vs-false hash-invisible)."""
    import duckdb as _d

    cell_s = _cell_exprs("v", "boolean", "spark", 4)
    cell_d = _cell_exprs("v", "boolean", "duck", 4)
    sdf = spark.createDataFrame([(True,), (False,), (None,)], "v boolean")
    got_s = [r[0] for r in sdf.selectExpr(f"{cell_s} AS c").collect()]
    con = _d.connect()
    got_d = [
        r[0]
        for r in con.sql(
            f"SELECT {cell_d} AS c FROM (VALUES (TRUE), (FALSE),"
            " (CAST(NULL AS BOOLEAN))) t(v)"
        ).fetchall()
    ]
    assert got_s == got_d == ["1", "0", chr(1)]


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=1,
        max_size=200,
    )
)
def test_bigint_rendering_parity(spark, vals):
    got_s = _spark_render(spark, vals, "long", "bigint")
    got_d = _duck_render(vals, "BIGINT", "bigint")
    assert got_s == got_d


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.dates(min_value=date(1, 1, 1), max_value=date(9999, 12, 31)),
        min_size=1,
        max_size=200,
    )
)
def test_date_rendering_parity(spark, vals):
    got_s = _spark_render(spark, vals, "date", "date")
    got_d = _duck_render([v.isoformat() for v in vals], "DATE", "date")
    assert got_s == got_d


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=datetime(1902, 1, 1),
            max_value=datetime(2200, 1, 1),
        ),
        min_size=1,
        max_size=200,
    )
)
def test_timestamp_rendering_parity(spark, vals):
    """Session TZ is UTC, so Spark LTZ micros == DuckDB naive micros."""
    got_s = _spark_render(
        spark,
        [v.replace(tzinfo=timezone.utc) for v in vals],
        "timestamp",
        "timestamp",
    )
    got_d = _duck_render(
        [v.isoformat(sep=" ") for v in vals], "TIMESTAMP", "timestamp"
    )
    assert got_s == got_d
