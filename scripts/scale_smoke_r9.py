"""Round-9 scale smoke: sf1 rows for every query whose PLAN changed
this round, so each change has measured 10x behavior beside its
small-SF parity:

- the boundary-only rank-segment retrofits (pipe_pretrain_mix,
  pipe_event_360, curate_ccnet_buckets) — same values as the full
  ordinal rank, strictly fewer jobs;
- agg_theta_sketch_setops — exact twins from one pass over the
  checkpointed key frame + theta-cut samples (the r8 smoke's 3.0x row);
- dedup_bloom_incremental — the executed m >= 16n sizing rule (the
  width itself only changes when SPARK_GRAFT_CORPUS_DOCS declares a
  bigger corpus; this row tracks the default-width wall);
- snk_parquet_global_sorted — derived file count;
- the ordinal-precondition helpers' extra histogram agg columns ride
  along on stat_ks_test / act_sequence_gaps / curate_dsir as
  representatives of the global_cum / global_lag / global_row_number
  call sites.

Usage: python scripts/scale_smoke_r9.py [SF1_DIR]
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
    # boundary-only rank segments (round 9)
    "pipe_pretrain_mix",
    "pipe_event_360",
    "curate_ccnet_buckets",
    # theta exact-twin + sample-cut rewrite
    "agg_theta_sketch_setops",
    # executed Bloom sizing rule (default width at this corpus)
    "dedup_bloom_incremental",
    # derived sorted-layout file count
    "snk_parquet_global_sorted",
    # ordinal precondition enforcement riders (one per helper)
    "stat_ks_test",
    "act_sequence_gaps",
    "curate_dsir",
    # new operator this round
    "curate_moore_lewis",
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
        SparkSession.builder.master(f"local[{cpus}]").appName("scale-smoke-r9")
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
            {"metric": "scale_smoke_r9", "sf0.1": t01, "sf1": t1,
             "ratios": ratios}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
