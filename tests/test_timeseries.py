"""Semantic invariants for the time-series operators (parity with the
DuckDB oracle is covered by test_oracle_parity; these pin the semantics
the oracle can't express as a hash: ordering invariants and bounds)."""

from __future__ import annotations

from pyspark.sql import functions as F

import udacity_data_engineer_capstone_spark as engine

engine.load_all()


def test_ohlc_bounds(spark, sf_dir):
    df = engine.QUERIES["ts_resample_ohlc"].fn(spark, sf_dir)
    bad = df.where(
        (F.col("low") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("open") > F.col("high"))
        | (F.col("close") < F.col("low"))
        | (F.col("close") > F.col("high"))
        | (F.col("n_events") < 1)
    ).count()
    assert bad == 0


def test_ewma_bounded_by_window_extremes(spark, sf_dir):
    # ewma is a sub-convex combination (weights sum to 255/256) of the
    # last 8 cents values zero-padded, so 0 <= ewma <= max(cents) when
    # values are non-negative; just pin the global bound.
    df = engine.QUERIES["ts_ewma"].fn(spark, sf_dir)
    row = df.agg(
        F.min("ewma").alias("lo"),
        F.max("ewma").alias("hi"),
        F.max("cents").alias("cmax"),
        F.min("cents").alias("cmin"),
    ).collect()[0]
    assert row.cmin >= 0, "testdata assumption: non-negative values"
    assert row.lo >= 0
    assert row.hi <= row.cmax


def test_interarrival_gaps_positive_and_counts(spark, sf_dir):
    ev = engine.QUERIES["ts_interarrival"].fn(spark, sf_dir)
    bad = ev.where(
        (F.col("min_gap_us") < 0)
        | (F.col("max_gap_us") < F.col("min_gap_us"))
        | (F.col("median_gap_us") < F.col("min_gap_us"))
        | (F.col("median_gap_us") > F.col("max_gap_us"))
    ).count()
    assert bad == 0
    # sum of per-user gap counts == total events - number of users seen
    from udacity_data_engineer_capstone_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    total_gaps = ev.agg(F.sum("n_gaps")).collect()[0][0]
    assert total_gaps == n_events - n_users
