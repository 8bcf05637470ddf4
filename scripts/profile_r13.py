"""Round-12 optimization profiler (guide §1: measure first).

For each named query: warm at sf0.001, then time N runs at the target
SF with BOTH the bench's action (count / collect parity with bench.py)
and the noop sink (guide §1.4 — computes every column, no driver
transfer), and write `.explain("formatted")` to plans/r13/<q>_<tag>.txt.

Usage:
  python scripts/profile_r13.py <tag> <query> [query ...]
  SPARK_GRAFT_PROFILE_SF_DIR=/root/testdata/sf0.1  (default)
  SPARK_GRAFT_PROFILE_RUNS=3                        (default)

Prints one line per query:
  <query>  count med=..s [..]  noop med=..s [..]  plan=plans/r13/...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_PROFILE_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))
    # ADVICE r12: the warmup fixture path is env-configurable like the
    # target SF dir (hosts without /root/testdata get a clear knob)
    warm_dir = os.environ.get(
        "SPARK_GRAFT_PROFILE_WARM_DIR", "/root/testdata/sf0.001"
    )

    import udacity_data_engineer_capstone_spark as engine
    from udacity_data_engineer_capstone_spark.session import configure
    from pyspark.sql import SparkSession

    engine.load_all()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # same session shape as bench.py (incl. the 16g driver heap local[32]
    # needs for the wider headline set)
    spark = configure(
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-r13")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    fns = engine.get_queries()

    plans_dir = os.path.join(REPO, "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        fn = fns[name].fn if hasattr(fns[name], "fn") else fns[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, warm_dir).count()

        counts: list[float] = []
        noops: list[float] = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name}:count:{r}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.count()
            counts.append(time.perf_counter() - t0)
        if os.environ.get("SPARK_GRAFT_PROFILE_NOOP", "1") != "0":
            for r in range(runs):
                spark.sparkContext.setJobDescription(f"{name}:noop:{r}")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                noops.append(time.perf_counter() - t0)
        else:
            noops = [float("nan")]
        spark.sparkContext.setJobDescription(None)

        plan_path = os.path.join(plans_dir, f"{name}_{tag}.txt")
        with open(plan_path, "w", encoding="utf-8") as fh:
            fh.write(fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ))
        print(
            f"{name:36s} count med={statistics.median(counts):7.3f} "
            f"{[round(t, 3) for t in counts]}  "
            f"noop med={statistics.median(noops):7.3f} "
            f"{[round(t, 3) for t in noops]}  plan={os.path.relpath(plan_path, REPO)}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
