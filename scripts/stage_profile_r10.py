"""Round-10 directive 7: per-stage wall breakdown of the two non-graph
headliner leaders, ``pipe_event_360`` (2.27 s in BENCH_r09) and
``stream_session_timeout_state`` (4.46 s).

pipe_event_360 decomposes along its own structure: the sessionization
aggregate, the funnel chain, the joined base, the boundary-only ntile
machinery (histogram + grouping-sets counts + cut-bucket job, all run
eagerly inside global_rank_segments_multi), and the final output pass.
Stages overlap (each later stage re-runs the earlier plan unless
checkpointed), so the numbers are cumulative evidence of where wall
time lives, not disjoint partitions.

stream_session_timeout_state decomposes along the streaming lifecycle:
staging the source dir, micro-batch execution (from the query's own
progress metrics: addBatch/getBatch/walCommit/stateManagement), and
teardown; plus state-store rows from stateOperators.

Usage: python scripts/stage_profile_r10.py [SF_DIR]
Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import udacity_data_engineer_capstone_spark as engine


def profile_event_360(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from udacity_data_engineer_capstone_spark.catalog import register_views
    from udacity_data_engineer_capstone_spark.operators.ordinal import (
        global_rank_segments_multi,
        ntile_cuts,
    )
    from udacity_data_engineer_capstone_spark.queries.pipeline import _E360_SQL

    register_views(spark, sf_dir, ("events",))
    prefix = _E360_SQL.replace("epoch_us(ts)", "unix_micros(ts)").split(
        "scored AS"
    )[0]
    out = {}

    t0 = time.time()
    spark.sql(
        prefix + "x AS (SELECT 1) SELECT COUNT(*) AS n FROM sess"
    ).collect()
    out["sessionization_agg"] = round(time.time() - t0, 3)

    t0 = time.time()
    spark.sql(
        prefix + "x AS (SELECT 1) SELECT COUNT(*) AS n FROM converted"
    ).collect()
    out["funnel_chain"] = round(time.time() - t0, 3)

    base_sql = prefix + (
        """base AS (
  SELECT s.user_id, s.n_sessions, s.n_events, s.monetary_cents, s.last_us,
         (c.user_id IS NOT NULL) AS converted
  FROM sess s LEFT JOIN converted c ON c.user_id = s.user_id
)
SELECT * FROM base"""
    )
    t0 = time.time()
    base = spark.sql(base_sql)
    base.count()
    out["joined_base"] = round(time.time() - t0, 3)

    cuts4 = lambda n: ntile_cuts(n, 4)  # noqa: E731
    t0 = time.time()
    m, _n = global_rank_segments_multi(
        base,
        [
            (F.col("last_us"), F.col("user_id"), False, cuts4, "__r"),
            (F.col("n_events"), F.col("user_id"), False, cuts4, "__f"),
            (F.col("monetary_cents"), F.col("user_id"), False, cuts4, "__m"),
        ],
    )
    out["ntile_boundary_machinery"] = round(time.time() - t0, 3)

    t0 = time.time()
    m.select(
        "user_id",
        ((F.col("__r") + 1) * 100 + (F.col("__f") + 1) * 10 + F.col("__m") + 1)
        .cast("int")
        .alias("rfm_code"),
    ).count()
    out["output_pass"] = round(time.time() - t0, 3)

    t0 = time.time()
    engine.QUERIES["pipe_event_360"].fn(spark, sf_dir).count()
    out["end_to_end"] = round(time.time() - t0, 3)
    return out


def profile_session_timeout(spark, sf_dir: str) -> dict:
    from udacity_data_engineer_capstone_spark.streaming.events import (
        sessionize_with_timeout,
        stage_events_dir,
        stream_events,
    )

    out = {}
    t0 = time.time()
    src = stage_events_dir(spark, sf_dir)
    out["stage_source_dir"] = round(time.time() - t0, 3)

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    name = f"prof_{uuid.uuid4().hex[:12]}"
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        t0 = time.time()
        stream = sessionize_with_timeout(stream_events(spark, src))
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        out["stream_drain_total"] = round(time.time() - t0, 3)
        batches = []
        for p in q.recentProgress:
            d = p["durationMs"]
            so = (p.get("stateOperators") or [{}])[0]
            batches.append(
                {
                    "rows": p.get("numInputRows"),
                    "addBatch_ms": d.get("addBatch"),
                    "getBatch_ms": d.get("getBatch"),
                    "latestOffset_ms": d.get("latestOffset"),
                    "walCommit_ms": d.get("walCommit"),
                    "commitOffsets_ms": d.get("commitOffsets"),
                    "queryPlanning_ms": d.get("queryPlanning"),
                    "state_rows": so.get("numRowsTotal"),
                    "state_updated": so.get("numRowsUpdated"),
                    "state_removed": so.get("numRowsRemoved"),
                }
            )
        out["batches"] = batches
        t0 = time.time()
        spark.table(name).count()
        out["sink_read"] = round(time.time() - t0, 3)
    finally:
        try:
            if q.isActive:
                q.stop()
        except Exception:
            pass
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    t0 = time.time()
    engine.QUERIES["stream_session_timeout_state"].fn(spark, sf_dir).count()
    out["end_to_end"] = round(time.time() - t0, 3)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    engine.load_all()
    from pyspark.sql import SparkSession

    from udacity_data_engineer_capstone_spark.session import configure

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = configure(
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stage-profile-r10")
        .config("spark.ui.showConsoleProgress", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JIT, codegen, Python worker pools
    engine.QUERIES["pipe_event_360"].fn(spark, "/root/testdata/sf0.01").count()
    engine.QUERIES["stream_session_timeout_state"].fn(
        spark, "/root/testdata/sf0.01"
    ).count()

    print(
        json.dumps(
            {"query": "pipe_event_360", "sf": sf_dir,
             "stages": profile_event_360(spark, sf_dir)}
        ),
        flush=True,
    )
    print(
        json.dumps(
            {"query": "stream_session_timeout_state", "sf": sf_dir,
             "stages": profile_session_timeout(spark, sf_dir)}
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
