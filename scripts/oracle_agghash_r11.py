"""Round-11 directive 1: value-check the full-output families ABOVE
gate scale with the aggregate-hash oracle.

Round 10's sf10/sf100 oracle replays had to DROP win_running_frame,
ts_rolling_median, and join_salted_skew: their outputs are full tables
(10M+ rows at sf10) and the row-materializing compare OOMs the replay
process (~108 GB RSS observed). tests/oracle.compare_agghash closes
that class: each engine folds its whole result to (count, two 60-bit
md5-chunk sums) internally and only scalars cross process boundaries —
Spark distributed, DuckDB out-of-core.

Usage:
    python scripts/oracle_agghash_r11.py [sf_dir] [query ...]
    (defaults: /tmp/engine_scale/sf10 and the three OOM-class queries)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "win_running_frame",  # full-table running-frame window (60M rows @ sf10)
    "ts_rolling_median",  # bucketed rolling median (full bucket table)
    "join_salted_skew",   # full joined fact table (60M rows @ sf10)
]

# Round-11 directive 6: widen the sf100 value slice to >=20 queries —
# one aggregate-shaped representative per family from the 38-family
# sf1->sf10 sweep (scripts/scale_sweep_broad_r10.py), on top of the 8
# already hash-exact at sf100 (SCALE.md) and the 3 OOM-class queries
# above. Wide outputs ride the aggregate hash; small outputs that lack
# a portable canonical cell type fall back to the row-materializing
# gate (safe at their bounded sizes).
SF100_WAVE = [
    "flagship_regional_revenue",  # star join family
    "join_semi_anti",             # semi/anti join family
    "join_asof_event",            # as-of family over 1B events
    "agg_approx_distinct",        # sketch family (HLL)
    "agg_theta_sketch_setops",    # sketch set-ops family
    "dedup_simhash",              # near-dup banding family
    # dedup_ngram_jaccard was tried here and DROPPED for sf100: its
    # DuckDB oracle's inverted-index self-join over 5M docs ballooned
    # past this box's RAM+disk (118 GB RSS observed) — an oracle-engine
    # limit, not an engine limit; the dedup family stays represented at
    # sf100 by dedup_exact and dedup_simhash (both hash-exact)
    "text_langid",                # text-analysis family
    "text_zipf_ranks",            # corpus-statistics family
    "curate_moore_lewis",         # curation family
    # embedding-iterative family: emb_pca_power_iteration (Gram-based
    # oracle, 64x64 sums). emb_kmeans_lloyd was tried at sf100 and hit
    # an oracle-engine disk limit: DuckDB's unrolled Lloyd CTEs
    # materialize q CROSS JOIN c (40M rows of 64-dim lists) per round
    # and ENOSPC'd the spill dir — loud, engine-side-only; the kmeans
    # query stays gate-proven and ladder-timed.
    "emb_pca_power_iteration",
    "sim_topk_bruteforce",        # similarity family
    "evt_window_session",         # event-windows family
    "stat_benjamini_hochberg",    # multiple-testing stats family
    "act_referential_integrity",  # warehouse-audit family
]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/tmp/engine_scale/sf10"
    names = args[1:] or DEFAULT_QUERIES
    if names == ["SF100_WAVE"]:
        names = SF100_WAVE

    import udacity_data_engineer_capstone_spark as engine

    engine.load_all()
    from pyspark.sql import SparkSession

    from udacity_data_engineer_capstone_spark.session import configure
    from tests.oracle import compare, compare_agghash

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = configure(
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("oracle-agghash-r11")
        .config("spark.driver.memory", mem)
        # JDK unified logging (GCLocker retry warnings) writes to stdout
        # and corrupts the single JSON result line
        .config("spark.driver.extraJavaOptions", "-Xlog:disable")
        .config("spark.ui.showConsoleProgress", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for name in names:
        t0 = time.time()
        try:
            try:
                r = compare_agghash(spark, name, sf_dir)
                results[name] = {
                    "ok": True,
                    "mode": "agghash",
                    "rows": r["rows"],
                    "h1": str(r["h1"]),
                    "h2": str(r["h2"]),
                    "sec": round(time.time() - t0, 1),
                }
            except AssertionError as e:
                if "no portable canonical form" not in str(e):
                    raise
                # array/struct outputs: the row-materializing gate,
                # safe at these queries' bounded output sizes
                compare(spark, name, sf_dir)
                results[name] = {
                    "ok": True,
                    "mode": "rows",
                    "sec": round(time.time() - t0, 1),
                }
        except Exception as e:  # noqa: BLE001 — report, don't mask siblings
            results[name] = {
                "ok": False,
                "err": str(e)[:400],
                "sec": round(time.time() - t0, 1),
            }
        state = "OK " if results[name]["ok"] else "ERR"
        print(
            f"[{state}] {name} {results[name].get('rows', '-')} rows "
            f"{results[name]['sec']}s",
            file=sys.stderr,
            flush=True,
        )

    print(
        json.dumps(
            {"metric": "oracle_agghash_r11", "sf_dir": sf_dir, "results": results}
        )
    )
    return 0 if all(v["ok"] for v in results.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
