"""Scale smoke (VERDICT r4 #7): run the 10 round-1 headliners plus the
MinHash-LSH dedup path at sf0.1 and at the 10x-replicated sf1
(scripts/scale_up_testdata.py), print per-query wall times and the
sf1/sf0.1 ratio. Expectation: ~linear (ratio ~10) for scan/join/agg
shapes; bucketed dedup stays subquadratic by construction.

Usage: python scripts/scale_smoke.py [SF1_DIR]
Prints one JSON line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import udacity_data_engineer_capstone_spark as engine
from udacity_data_engineer_capstone_spark.session import get_spark

R1_HEADLINERS = [
    "flagship_regional_revenue",
    "join_left_5way",
    "agg_groupby_sum",
    "udf_sas_date",
    "evt_window_sliding",
    "evt_window_session",
    "dedup_exact",
    "dedup_minhash_lsh",  # the MinHash-LSH dedup path, explicitly
    "sim_topk_bruteforce",
    "text_quality",
]


def run_at(spark, sf_dir: str) -> dict[str, float]:
    times = {}
    for name in R1_HEADLINERS:
        t0 = time.time()
        n = engine.QUERIES[name].fn(spark, sf_dir).count()
        times[name] = round(time.time() - t0, 2)
        print(f"  {name}: {times[name]} s ({n} rows)", flush=True)
    return times


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/engine_scale/sf1"
    engine.load_all()
    spark = get_spark("scale-smoke")
    # warmup (JVM/codegen) on the small SF so sf0.1 isn't penalized
    for name in R1_HEADLINERS:
        engine.QUERIES[name].fn(spark, "/root/testdata/sf0.01").count()
    print("sf0.1:", flush=True)
    t01 = run_at(spark, "/root/testdata/sf0.1")
    print("sf1:", flush=True)
    t1 = run_at(spark, sf1)
    ratios = {k: round(t1[k] / max(t01[k], 0.01), 1) for k in t01}
    out = {
        "sf0.1_total": round(sum(t01.values()), 2),
        "sf1_total": round(sum(t1.values()), 2),
        "ratio_total": round(sum(t1.values()) / sum(t01.values()), 2),
        "sf0.1": t01,
        "sf1": t1,
        "ratio": ratios,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
