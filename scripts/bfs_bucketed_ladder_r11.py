"""Round-11 directive 2: measure the src-bucketed BFS layout.

SCALE.md's round-10 correction: graph_bfs_multisource's per-round
edge⋈frontier join scans the whole (unbucketed) adjacency, so cached
traversal grew ~5.3× across sf10→sf100 even though reach is frozen at
15,999 nodes. graph_bfs_multisource_bucketed writes the adjacency once
as a src-range-bucketed sorted parquet layout and prunes every round's
scan with the frontier's bucket list + src range.

Protocol per (rung, variant): shot 1 pays the one-time build
(session-cached adjacency / layout write), shots 2-3 isolate
traversal; the medians of shots 2-3 give the traversal ratio. Results
are asserted IDENTICAL between variants (same rows) at each rung
before any timing is reported.

Usage: python scripts/bfs_bucketed_ladder_r11.py [sf10_dir sf100_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNGS = [
    ("sf10", "/tmp/engine_scale/sf10"),
    ("sf100", "/tmp/engine_scale/sf100"),
]
VARIANTS = ["graph_bfs_multisource", "graph_bfs_multisource_bucketed"]
SHOTS = 3


def main() -> int:
    if len(sys.argv) == 3:
        RUNGS[0] = ("sf10", sys.argv[1])
        RUNGS[1] = ("sf100", sys.argv[2])

    import udacity_data_engineer_capstone_spark as engine

    engine.load_all()
    from pyspark.sql import SparkSession

    from udacity_data_engineer_capstone_spark.session import configure

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = configure(
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bfs-bucketed-ladder-r11")
        .config("spark.driver.memory", "64g")
        .config("spark.ui.showConsoleProgress", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "bfs_bucketed_ladder_r11", "shots": SHOTS}
    for rung, sf_dir in RUNGS:
        rung_res: dict = {}
        baseline_rows = None
        for variant in VARIANTS:
            fn = engine.QUERIES[variant].fn
            shots = []
            for _ in range(SHOTS):
                t0 = time.time()
                rows = sorted(
                    tuple(r) for r in fn(spark, sf_dir).collect()
                )
                shots.append(round(time.time() - t0, 2))
            if baseline_rows is None:
                baseline_rows = rows
            else:
                assert rows == baseline_rows, (
                    f"{rung}: {variant} rows differ from baseline variant"
                )
            rung_res[variant] = {
                "shots": shots,
                "build_shot": shots[0],
                "traversal_median": round(
                    statistics.median(shots[1:]), 2
                ),
                "n_rows": len(rows),
            }
            print(f"[{rung}] {variant}: {shots}", file=sys.stderr, flush=True)
        out[rung] = rung_res
    for variant in VARIANTS:
        t10 = out["sf10"][variant]["traversal_median"]
        t100 = out["sf100"][variant]["traversal_median"]
        out.setdefault("traversal_ratio_sf10_to_sf100", {})[variant] = (
            round(t100 / t10, 2) if t10 else None
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
