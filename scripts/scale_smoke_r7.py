"""Round-7 scale smoke (VERDICT r6 directive #8): the remaining
expensive bench queries never measured at sf1 — multimodal pHash dedup,
star-contraction connected components, grid DBSCAN, RRF fusion, and the
RAG serving chain — at sf0.1 vs the 10x-replicated sf1, with per-query
ratios. Any op >3x wall at 10x rows gets a named cause in SCALE.md.

Also re-times the reworked graph_lpa_approx (multilevel
coarsen-solve-project) against exact graph_label_propagation at both
scales, the VERDICT r6 directive #4 "Done" evidence.

Usage: python scripts/scale_smoke_r7.py [SF1_DIR]
Prints one JSON line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import udacity_data_engineer_capstone_spark as engine

QUERIES = [
    "mm_phash_dedup",
    "dedup_cluster_cc_star",
    "spatial_dbscan_grid",
    "text_rrf_fusion",
    "pipe_rag_serving",
    # directive #4 evidence pair: exact first (pays the shared adjacency
    # build), then both twice — the recorded number is the warm second
    # run, matching how bench.py medians see them
    "graph_label_propagation",
    "graph_lpa_approx",
]

WARM_TWICE = {"graph_label_propagation", "graph_lpa_approx"}


def run_at(spark, sf_dir: str) -> dict[str, float]:
    times = {}
    for name in QUERIES:
        runs = 2 if name in WARM_TWICE else 1
        for _ in range(runs):
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
        SparkSession.builder.master(f"local[{cpus}]").appName("scale-smoke-r7")
        .config("spark.driver.memory", "16g")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for name in QUERIES:
        engine.QUERIES[name].fn(spark, "/root/testdata/sf0.01").count()
    print("sf0.1:", flush=True)
    t01 = run_at(spark, "/root/testdata/sf0.1")
    print("sf1:", flush=True)
    t1 = run_at(spark, sf1)
    ratios = {k: round(t1[k] / max(t01[k], 0.01), 1) for k in t01}
    print(
        json.dumps(
            {"metric": "scale_smoke_r7", "sf0.1": t01, "sf1": t1, "ratios": ratios}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
