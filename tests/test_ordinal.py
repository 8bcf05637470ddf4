"""Unit tests for the two-phase exact global ordinal helpers
(operators/ordinal.py) against Spark's own single-partition windows on
deterministic data — ranks, cumulative sum/max, lag, and ntile must be
IDENTICAL (the whole point: same values, different plan shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from udacity_data_engineer_capstone_spark.operators.ordinal import (
    composite_bucket_key,
    global_cum,
    global_lag,
    global_row_number,
    ntile_from_rank,
)
from udacity_data_engineer_capstone_spark.plans.audit import (
    unbounded_global_windows,
)


def _mixed(spark, n=997):
    """Deterministic frame with heavy ties (score = id % 13) and a
    unique tiebreak — the worst case for bucket balance."""
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 13).cast("long").alias("score"),
        ((F.col("id") * 2654435761) % 1000003).cast("long").alias("hashed"),
    )


def test_global_row_number_matches_window(spark):
    df = _mixed(spark)
    got, n = global_row_number(
        df,
        [F.col("score").desc(), F.col("id")],
        composite_bucket_key(-F.col("score"), F.col("id")),
        out="rk",
    )
    assert n == 997
    want = df.withColumn(
        "rk",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("id")))
        .cast("long"),
    )
    assert sorted(map(tuple, got.select("id", "rk").collect())) == sorted(
        map(tuple, want.select("id", "rk").collect())
    )


def test_global_row_number_near_unique_key(spark):
    df = _mixed(spark)
    got, _ = global_row_number(
        df, [F.col("hashed"), F.col("id")], F.col("hashed"), out="rk"
    )
    want = df.withColumn(
        "rk",
        F.row_number().over(Window.orderBy("hashed", "id")).cast("long"),
    )
    assert sorted(map(tuple, got.select("id", "rk").collect())) == sorted(
        map(tuple, want.select("id", "rk").collect())
    )


def test_global_row_number_no_single_partition_window(spark):
    df = _mixed(spark)
    got, _ = global_row_number(
        df, [F.col("hashed"), F.col("id")], F.col("hashed"), out="rk"
    )
    assert unbounded_global_windows(got) == []
    # the within-bucket window must still be there, partitioned
    plan = got._jdf.queryExecution().sparkPlan().toString()
    assert "Window" in plan


def test_global_row_number_empty(spark):
    df = _mixed(spark).where(F.lit(False))
    got, n = global_row_number(df, [F.col("id")], F.col("id"), out="rk")
    assert n == 0 and got.count() == 0


@pytest.mark.parametrize("inclusive", [True, False])
def test_global_cumsum_matches_window(spark, inclusive):
    # unique order key (distinct-value frame shape)
    df = spark.range(500).select(
        (F.col("id") * 3 + 7).alias("v"),
        ((F.col("id") * 37) % 101 + 1).cast("long").alias("c"),
    )
    got = global_cum(
        df,
        [F.col("v")],
        F.col("v"),
        F.col("c"),
        inclusive=inclusive,
        out="cs",
    )
    end = 0 if inclusive else -1
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, end)
    want = df.withColumn("cs", F.sum("c").over(w).cast("long"))
    assert sorted(map(tuple, got.select("v", "cs").collect())) == sorted(
        map(tuple, want.select("v", "cs").collect())
    )


@pytest.mark.parametrize("inclusive", [True, False])
def test_global_cummax_matches_window(spark, inclusive):
    df = spark.range(500).select(
        (F.col("id") * 3 + 7).alias("v"),
        ((F.col("id") * 57) % 301).cast("long").alias("c"),
    )
    got = global_cum(
        df,
        [F.col("v")],
        F.col("v"),
        F.col("c"),
        agg="max",
        inclusive=inclusive,
        out="cm",
    )
    end = 0 if inclusive else -1
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, end)
    want = df.withColumn("cm", F.max("c").over(w).cast("long"))
    assert sorted(
        map(tuple, got.select("v", "cm").collect())
    ) == sorted(map(tuple, want.select("v", "cm").collect()))


def test_global_lag_matches_window(spark):
    # sparse key sequence with gaps
    df = spark.range(400).select(
        (F.col("id") * 7 % 2999).cast("long").alias("k")
    ).distinct()
    got = global_lag(df, F.col("k"), F.col("k"), out="pk")
    want = df.withColumn(
        "pk", F.lag("k").over(Window.orderBy("k")).cast("long")
    )
    assert sorted(
        map(tuple, got.select("k", "pk").collect()), key=str
    ) == sorted(map(tuple, want.select("k", "pk").collect()), key=str)


@pytest.mark.parametrize("n,k", [(40, 4), (43, 4), (7, 10), (100, 10), (9, 4)])
def test_ntile_from_rank_matches_ntile(spark, n, k):
    df = spark.range(n).select(F.col("id"))
    ranked, total = global_row_number(
        df, [F.col("id")], F.col("id"), out="rk", checkpoint=False
    )
    assert total == n
    got = ranked.select("id", ntile_from_rank(F.col("rk"), n, k).alias("t"))
    want = df.select(
        "id", F.ntile(k).over(Window.orderBy("id")).alias("t")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_detector_flags_trap_and_passes_topk(spark):
    trap = spark.range(100).withColumn(
        "rk", F.row_number().over(Window.orderBy("id"))
    )
    assert unbounded_global_windows(trap)
    topk = trap.filter(F.col("rk") <= 5)
    assert unbounded_global_windows(topk) == []
    partitioned = spark.range(100).withColumn(
        "rk", F.row_number().over(Window.partitionBy(F.col("id") % 7).orderBy("id"))
    )
    assert unbounded_global_windows(partitioned) == []


def test_global_row_numbers_multi_matches_windows(spark):
    from udacity_data_engineer_capstone_spark.operators.ordinal import (
        global_row_numbers,
    )

    df = _mixed(spark)
    got, n = global_row_numbers(
        df,
        [
            (
                [F.col("score").desc(), F.col("id")],
                composite_bucket_key(-F.col("score"), F.col("id")),
                "rk_a",
            ),
            (
                [F.col("hashed"), F.col("id")],
                composite_bucket_key(F.col("hashed"), F.col("id")),
                "rk_b",
            ),
            ([F.col("id")], F.col("id"), "rk_c"),
        ],
    )
    assert n == 997
    want = df.select(
        "id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("id")))
        .cast("long")
        .alias("rk_a"),
        F.row_number()
        .over(Window.orderBy("hashed", "id"))
        .cast("long")
        .alias("rk_b"),
        F.row_number().over(Window.orderBy("id")).cast("long").alias("rk_c"),
    )
    cols = ["id", "rk_a", "rk_b", "rk_c"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )
    assert unbounded_global_windows(got) == []
