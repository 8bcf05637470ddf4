"""Round-10 overflow audit: the widened integer lanes at adversarial
magnitudes PAST the old int64 cliffs.

The gate-scale oracle replays prove the widenings are value-neutral
where int64 sufficed; these tests prove the other half — that the
wide lanes are CORRECT (engine == oracle == independent Python-int
ground truth) on data where the old lanes arithmetically could not
have survived (Spark 4 ANSI aborts / DuckDB raises). Each fixture is
built so at least one pre-fix product or sum exceeds 2^63-1.

Found by the round-10 sf10/third-decade oracle replays:
stat_gini and stat_spearman aborted at sf10; stat_ols_multiple and
ts_bollinger_bands died one decade higher by bound-check.
"""

from __future__ import annotations

import math

import duckdb

from udacity_data_engineer_capstone_spark.registry import QUERIES

I64_MAX = (1 << 63) - 1


def _run_pair(spark, name: str, sf_dir: str, duck_sql: str, tables: dict):
    """Run the registered Spark query at sf_dir and the same shared SQL
    in DuckDB over the same parquet; return (spark_rows, duck_rows)
    sorted order-free with floats canonicalized exactly (no tolerance)."""
    sdf = QUERIES[name].fn(spark, sf_dir)
    scols = sdf.columns
    srows = sorted(
        tuple(r[c] for c in scols) for r in sdf.collect()
    )
    con = duckdb.connect()
    for t, path in tables.items():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}/*.parquet')"
        )
    cur = con.execute(duck_sql)
    dcols = [d[0] for d in cur.description]
    order = [dcols.index(c) for c in scols]
    drows = sorted(tuple(row[i] for i in order) for row in cur.fetchall())
    return srows, drows


def test_gini_past_int64_cliff(spark, tmp_path):
    """10k orders at 1e13 cents each: Σ rank·cents ≈ 5e20 ≫ 2^63 — the
    pre-fix lane could not represent this. Engine, oracle, and exact
    Python-int ground truth must all agree bit-for-bit."""
    n = 10_000
    price = 1.0e11  # -> 1e13 cents per order
    rows = [(i, "F", price + i) for i in range(1, n + 1)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    out = tmp_path / "orders.parquet"
    df.coalesce(1).write.parquet(str(out))

    # exact ground truth with arbitrary-precision ints, mirroring the
    # engine's single cast-to-double boundary
    cents = sorted(
        (int(math.floor(r[2] * 100 + 0.5)), r[0]) for r in rows
    )
    sx = sum(c for c, _ in cents)
    six = sum(i * c for i, (c, _) in enumerate(cents, start=1))
    assert six > I64_MAX  # the fixture really crosses the old cliff
    expected = float(2 * six - (n + 1) * sx) / (float(n) * float(sx))

    from udacity_data_engineer_capstone_spark.queries.stats import _gini_sql

    srows, drows = _run_pair(
        spark, "stat_gini", str(tmp_path), _gini_sql("HUGEINT"),
        {"orders": str(out)},
    )
    assert srows == drows
    assert len(srows) == 1 and srows[0][0] == "F" and srows[0][1] == n
    assert srows[0][2] == expected


def test_spearman_past_int64_cliff(spark, tmp_path):
    """3.2M lineitem rows in one flag: Σ rank² ≈ n³/3 ≈ 1.2e19 > 2^63.
    Perfectly monotone pairs ⇒ spearman_ppm must be exactly 1_000_000,
    and engine == oracle."""
    n = 3_200_000
    df = (
        spark.range(1, n + 1)
        .selectExpr(
            "'A' AS l_returnflag",
            "CAST(id AS DOUBLE) AS l_quantity",
            "CAST(id * 2 AS DOUBLE) AS l_extendedprice",
        )
    )
    out = tmp_path / "lineitem.parquet"
    df.write.parquet(str(out))
    assert n * n * (n + 1) // 3 > I64_MAX  # old Σr² lane dies here

    from udacity_data_engineer_capstone_spark.queries.stats import (
        _spearman_sql,
    )

    srows, drows = _run_pair(
        spark, "stat_spearman", str(tmp_path), _spearman_sql("HUGEINT"),
        {"lineitem": str(out)},
    )
    assert srows == drows
    assert srows == [("A", n, 1_000_000)]


def test_ols_multiple_past_int64_cliff(spark, tmp_path):
    """Hourly revenue sums of ~2e12 cents: a single y² ≈ 4e24 ≫ 2^63,
    so the pre-fix syy lane dies on the FIRST row. Engine == oracle."""
    rows = []
    for h in range(48):  # two days of hours, 4 events each
        for k in range(4):
            rows.append(
                (h * 4 + k, f"2024-01-{1 + h // 24:02d} {h % 24:02d}:15:00",
                 "view", 5.0e9 + h)  # -> ~5e11 cents per event
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value",
        "CAST(1 AS BIGINT) AS user_id",
    )
    out = tmp_path / "events.parquet"
    df.coalesce(1).write.parquet(str(out))
    y_cents = 4 * int(5.0e9 * 100)
    assert y_cents * y_cents > I64_MAX

    from udacity_data_engineer_capstone_spark.queries.stats import _ols2_sql

    srows, drows = _run_pair(
        spark, "stat_ols_multiple", str(tmp_path), _ols2_sql("HUGEINT"),
        {"events": str(out)},
    )
    assert srows == drows
    assert srows[0][0] == 48  # n_hours


def test_bollinger_past_int64_cliff(spark, tmp_path):
    """Hourly sums ~1e12 cents: cents² ≈ 1e24 ≫ 2^63 per window row —
    the pre-fix Q lane dies immediately. Engine == oracle, and the
    all-flat series must flag no breakouts."""
    rows = []
    for h in range(30):
        rows.append((h, f"2024-01-01 {h % 24:02d}:30:00" if h < 24
                     else f"2024-01-02 {h - 24:02d}:30:00",
                     "click", 1.0e10))  # -> 1e12 cents per hour-bucket
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value",
        "CAST(1 AS BIGINT) AS user_id",
    )
    out = tmp_path / "events.parquet"
    df.coalesce(1).write.parquet(str(out))
    cents = int(1.0e10 * 100)
    assert cents * cents > I64_MAX

    from udacity_data_engineer_capstone_spark.operators.timeseries import (
        _BOLLINGER_TEMPLATE,
    )

    srows, drows = _run_pair(
        spark, "ts_bollinger_bands", str(tmp_path),
        _BOLLINGER_TEMPLATE.format(EPOCH="EPOCH(ts)"),
        {"events": str(out)},
    )
    assert srows == drows
    assert len(srows) == 30
    assert all(r[-1] is False and r[-2] is False for r in srows)
