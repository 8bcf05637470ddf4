"""Round-7 wave-3 scale smoke: sf1 rows for the queries added since the
last smoke (the two Data Source API write-path queries, the r6/r7 ops
that never got a row, and this wave's grid kNN + pointer-doubling SCC).

Usage: python scripts/scale_smoke_r7b.py [SF1_DIR]
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
    "spatial_knn_join",
    "graph_scc_functional",
    "dedup_repeated_spans",
    "curate_epoch_schedule",
    "sim_hybrid_retrieval",
    "evt_watermark_choice",
    "text_boilerplate_ngrams",
    "snk_python_datasource",
    "stream_python_sink",
]


def run_at(spark, sf_dir: str) -> dict[str, float]:
    times = {}
    for name in QUERIES:
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
        SparkSession.builder.master(f"local[{cpus}]").appName("scale-smoke-r7b")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
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
            {"metric": "scale_smoke_r7b", "sf0.1": t01, "sf1": t1,
             "ratios": ratios}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
