"""VERDICT r12 item 5: settle the pagerank-family "regression".

The driver's r12 pair read graph_pagerank 4.69 -> 5.99 s and
graph_label_propagation 3.52 -> 3.99 s on UNTOUCHED kernels. This runs
the bench-control methodology on one box: N fresh-JVM alternations per
side, strictly alternating HEAD / the r11 snapshot tree (bdd3ed1), same
warmup + 3 interleaved sf0.1 rounds per measurement, medians of
medians. Writes one JSON line; commit the verdict to OPTIMIZATION_r13.

Usage: python scripts/ab_pagerank_r13.py <r11_worktree_path> [alts]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = ["graph_pagerank", "graph_label_propagation",
           "graph_pagerank_personalized"]


def _script(tree: str, sf_dir: str, cpus: str) -> str:
    return textwrap.dedent(
        f"""
        import json, statistics, sys, time
        sys.path.insert(0, {tree!r})
        import udacity_data_engineer_capstone_spark as engine
        engine.load_all()
        from pyspark.sql import SparkSession
        from udacity_data_engineer_capstone_spark.session import configure
        spark = configure(
            SparkSession.builder.master("local[{cpus}]")
            .appName("ab-pagerank")
            .config("spark.driver.memory", "16g")
            .config("spark.driver.extraJavaOptions", "-Xlog:disable")
            .config("spark.ui.showConsoleProgress", "false")
        ).getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        fns = engine.get_queries()
        names = {QUERIES!r}
        for n in names:
            fns[n](spark, "/root/testdata/sf0.001").count()
        samples = {{n: [] for n in names}}
        for r in range(3):
            for n in names:
                t0 = time.perf_counter()
                fns[n](spark, {sf_dir!r}).count()
                samples[n].append(time.perf_counter() - t0)
        print(json.dumps({{n: round(statistics.median(t), 3)
                           for n, t in samples.items()}}))
        """
    )


def main() -> int:
    r11_tree = sys.argv[1]
    alts = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs: dict[str, list[dict]] = {"head": [], "r11": []}
    for i in range(alts):
        for side, tree in (("head", REPO), ("r11", r11_tree)):
            proc = subprocess.run(
                [sys.executable, "-c", _script(tree, sf_dir, cpus)],
                capture_output=True, text=True, timeout=1800, cwd=tree,
            )
            if proc.returncode != 0:
                print(f"{side}[{i}] failed: {proc.stderr[-300:]}",
                      file=sys.stderr)
                continue
            m = json.loads(proc.stdout.strip().splitlines()[-1])
            runs[side].append(m)
            print(f"{side}[{i}]: {m}", file=sys.stderr)
    out: dict = {"alternations": alts, "queries": {}}
    for q in QUERIES:
        per = {
            side: round(statistics.median([r[q] for r in rs]), 3)
            for side, rs in runs.items() if rs
        }
        per["samples"] = {s: [r[q] for r in rs] for s, rs in runs.items()}
        if "head" in per and "r11" in per and per["r11"]:
            per["head_over_r11"] = round(per["head"] / per["r11"], 4)
        out["queries"][q] = per
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
