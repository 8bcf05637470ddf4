"""Round-8 scale smoke: sf1 rows for (a) `text_ndcg_eval` — the r7
straggler that shipped in the snapshot commit with no SCALE row
(VERDICT r7 directive #3) — and (b) every query whose plan changed in
the round-8 global-ordinal retrofit, so the two-phase rank/cum/lag
machinery has measured 10x behavior, not just small-SF parity.

Usage: python scripts/scale_smoke_r8.py [SF1_DIR]
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
    "text_ndcg_eval",
    # ordinal retrofits (round 8)
    "curate_dsir",
    "curate_ccnet_buckets",
    "pipe_pretrain_mix",
    "agg_decile_lift",
    "evt_conversion_latency",
    "evt_rfm_segmentation",
    "pipe_event_360",
    "stat_mann_whitney",
    "stat_wilcoxon_signed_rank",
    "stat_ks_test",
    "stat_join_skew_diag",
    "curate_padding_waste",
    "agg_skyline_pareto",
    "agg_percentile_threshold_bands",
    "act_sequence_gaps",
    "snk_compaction_plan",
    "agg_theta_sketch_setops",
    "text_rrf_fusion",
    "curate_shuffle_epoch",
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
        SparkSession.builder.master(f"local[{cpus}]").appName("scale-smoke-r8")
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
            {"metric": "scale_smoke_r8", "sf0.1": t01, "sf1": t1,
             "ratios": ratios}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
