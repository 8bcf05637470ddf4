"""Structured Streaming tests: stream-vs-batch equivalence and the
custom stateful operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table
from udacity_data_engineer_capstone_spark.operators.events import (
    evt_window_tumbling,
)
from udacity_data_engineer_capstone_spark.streaming.events import (
    run_to_memory,
    running_user_totals,
    stage_events_dir,
    stream_events,
    tumbling_counts,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_matches_batch_tumbling(spark, sf_dir):
    src = stage_events_dir(spark, sf_dir)
    streamed = run_to_memory(
        tumbling_counts(stream_events(spark, src)), output_mode="complete"
    )
    batch = evt_window_tumbling(spark, sf_dir)
    cols = ["window_start", "event_type", "n_events"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_running_user_totals_stateful(spark, sf_dir):
    src = stage_events_dir(spark, sf_dir)
    out = run_to_memory(
        running_user_totals(stream_events(spark, src)), output_mode="update"
    )
    # update-mode memory sink may contain several snapshots per user (one
    # per microbatch); the max per user is the final running total
    finals = {
        r.user_id: r.n_events
        for r in out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    }
    truth = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert finals == truth
