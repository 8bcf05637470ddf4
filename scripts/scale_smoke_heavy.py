"""Heavy-family scale smoke (VERDICT r5 directive #3): the most
expensive bench families — iterative graph, stateful streaming drains,
the exact kNN join, and the six-stage pretraining-mix pipeline — at
sf0.1 vs the 10x-replicated sf1, with per-query ratios.

These are exactly the queries the r5 sf1 table did NOT cover; any op
>3x wall at 10x rows gets a named cause in SCALE.md.

Usage: python scripts/scale_smoke_heavy.py [SF1_DIR]
Prints one JSON line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import udacity_data_engineer_capstone_spark as engine

HEAVY = [
    # iterative graph family (shared cached adjacency)
    "graph_pagerank",
    "graph_hits",
    "graph_bfs_multisource",
    "graph_label_propagation",
    "graph_triangle_count",
    "graph_kcore",
    # approx early-exit twins (r6): the production escape hatch at 10x
    "graph_pagerank_approx",
    "graph_lpa_approx",
    # stateful streaming drains (applyInPandasWithState harness)
    "stream_ewma_state",
    "stream_session_timeout_state",
    # exact kNN block nested-loop + rerank
    "sim_knn_join",
    # six-stage curation pipeline
    "pipe_pretrain_mix",
    # r6 skew scenario at 10x (hot key grows 10x too)
    "skew_zipf_salted",
    "skew_zipf_aqe",
]


def run_at(spark, sf_dir: str) -> dict[str, float]:
    times = {}
    for name in HEAVY:
        t0 = time.time()
        n = engine.QUERIES[name].fn(spark, sf_dir).count()
        times[name] = round(time.time() - t0, 2)
        print(f"  {name}: {times[name]} s ({n} rows)", flush=True)
    return times


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/engine_scale/sf1"
    engine.load_all()
    from pyspark.sql import SparkSession

    from udacity_data_engineer_capstone_spark.session import configure

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = configure(
        SparkSession.builder.master(f"local[{cpus}]").appName("scale-smoke-heavy")
        # local[32] runs all executor threads in the driver JVM: the 1g
        # default heap OOMs the sf1 graph family (same sizing as bench.py)
        .config("spark.driver.memory", "16g")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # warmup (JVM/codegen) on the small SF so sf0.1 isn't penalized
    for name in HEAVY:
        engine.QUERIES[name].fn(spark, "/root/testdata/sf0.01").count()
    print("sf0.1:", flush=True)
    t01 = run_at(spark, "/root/testdata/sf0.1")
    print("sf1:", flush=True)
    t1 = run_at(spark, sf1)
    ratios = {k: round(t1[k] / max(t01[k], 0.01), 1) for k in t01}
    out = {
        "sf0.1_total": round(sum(t01.values()), 2),
        "sf1_total": round(sum(t1.values()), 2),
        "total_ratio": round(sum(t1.values()) / max(sum(t01.values()), 0.01), 2),
        "sf0.1": t01,
        "sf1": t1,
        "ratio": ratios,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
