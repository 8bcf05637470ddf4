"""VERDICT r12 item 9: per-round parallel-efficiency artifact.

At sf0.1 every headliner is scheduling/barrier-bound, so 8 cores beat
32 on most queries and the headline bench cannot see a change that
destroys PARALLELISM (an accidental coalesce(1) would read fine or
better). This probes the slowest headliners at two core counts in
fresh JVMs (warmup at sf0.001, 3 interleaved sf0.1 rounds, medians)
and records the c8/c32 ratio per query as a committed artifact
(SCALING_r<N>.json) so the ratio is tracked round over round.

Usage: python scripts/scaling_probe_r13.py [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "graph_bfs_multisource_bucketed",
    "graph_pagerank_personalized",
    "pipe_pretrain_mix",
    "graph_pagerank",
    "stream_cdc_apply",
    "graph_bfs_multisource",
    "graph_label_propagation",
    "stream_cdc_apply_native",
    "dedup_cluster_cc_star",
    "stream_session_timeout_state",
]


def _script(cpus: str, sf_dir: str) -> str:
    return textwrap.dedent(
        f"""
        import json, statistics, sys, time
        sys.path.insert(0, {REPO!r})
        import udacity_data_engineer_capstone_spark as engine
        engine.load_all()
        from pyspark.sql import SparkSession
        from udacity_data_engineer_capstone_spark.session import configure
        import os
        os.environ["SPARK_GRAFT_CPUS"] = {cpus!r}
        spark = configure(
            SparkSession.builder.master("local[{cpus}]")
            .appName("scaling-probe")
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
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "SCALING_r13.json"
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sides: dict[str, dict] = {}
    for cpus in ("32", "8"):
        proc = subprocess.run(
            [sys.executable, "-c", _script(cpus, sf_dir)],
            capture_output=True, text=True, timeout=2400, cwd=REPO,
        )
        if proc.returncode != 0:
            print(f"c{cpus} failed: {proc.stderr[-400:]}", file=sys.stderr)
            return 1
        sides[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
        print(f"c{cpus}: {sides[cpus]}", file=sys.stderr)
    per = {
        q: {
            "c32_sec": sides["32"][q],
            "c8_sec": sides["8"][q],
            "c8_over_c32": round(sides["8"][q] / sides["32"][q], 3)
            if sides["32"][q] else None,
        }
        for q in QUERIES
    }
    out = {
        "sf_dir": sf_dir,
        "queries": per,
        "total_c32": round(sum(sides["32"].values()), 3),
        "total_c8": round(sum(sides["8"].values()), 3),
        "note": (
            "sf0.1 inputs are <=11 MB, so sub-1 ratios mean the query is"
            " barrier/latency-bound (expected here); a ratio that JUMPS"
            " round-over-round flags a parallelism-destroying change"
        ),
    }
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({q: v["c8_over_c32"] for q, v in per.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
