"""Round-12 directive 5: widen the sf100 value slice 25 → ≥60 via the
(fixed) aggregate-hash gate — ONE PASS over every oracled query whose
result types are agghash-renderable, skipping only the documented
DuckDB-oracle-limit queries.

Differences from scripts/oracle_agghash_r11.py (kept for provenance):

- **Broad, not curated**: enumerates the full oracled registry,
  determines agghash-renderability from the result schema (portable
  canonical cell types only — arrays/maps/structs/decimal are excluded
  up front instead of falling back to the row-materializing gate,
  which is exactly the OOM class this gate exists to avoid at sf100).
- **Resumable**: results append to a JSONL sidecar as they land; a
  rerun skips names already recorded, so a JVM death mid-sweep costs
  one query, not the sweep.
- **Cheap-first ordering + wall budget**: queries are grouped by their
  dominant input table (documents/embeddings ≈ 5M rows at sf100,
  lineitem 600M, events 1B) and run cheap-first; when the
  SPARK_GRAFT_AGGHASH_BUDGET_SEC budget (default: unlimited) runs out
  the remaining names are LISTED in the summary — dropped coverage is
  loud, never silent.
- Re-replays the 25 r11-proven queries too: the round-12 boolean lane
  fix (tests/oracle.py — NULL-preserving CASE) changes canonical
  strings for boolean-carrying results, so prior stamps are
  re-derived rather than assumed.

Usage:
    python scripts/oracle_agghash_r12.py [sf_dir] [out_jsonl]
    (defaults: /tmp/engine_scale/sf100, /tmp/agghash_r12_sf100.jsonl)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Documented oracle-ENGINE limits at sf100 (SCALE.md round-11): the
# DuckDB side cannot replay these two at sf100 (inverted-index
# self-join RSS blowup; unrolled-Lloyd cross-join ENOSPC). Their
# families are represented by hash-exact siblings.
DUCKDB_LIMIT_SKIPS = {
    "dedup_ngram_jaccard",
    "emb_kmeans_lloyd",
}

# cheap-first table cost classes (dominant input at sf100)
_COST_CLASS = [
    ("docs", ("text_", "dedup_", "curate_", "pipe_corpus", "udtf_")),
    ("emb", ("sim_", "emb_", "mm_")),
    ("dims", ("src_", "fn_", "prj_", "flt_", "snk_", "sql_", "act_", "ref_")),
    ("orders", ("join_", "agg_", "win_", "ord_", "set_", "cdc_", "tpch_",
                 "flagship", "skew_", "spatial_", "rec_", "graph_", "pipe_",
                 "warehouse_", "maint_", "stat_ols", "sample_")),
    ("events", ("evt_", "ts_", "stat_", "stream_", "sess_")),
]


def _cost_rank(name: str) -> int:
    for i, (_cls, prefixes) in enumerate(_COST_CLASS):
        if any(name.startswith(p) for p in prefixes):
            return i
    return len(_COST_CLASS) - 1  # unknown → assume expensive


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/tmp/engine_scale/sf100"
    out_path = args[1] if len(args) > 1 else "/tmp/agghash_r12_sf100.jsonl"
    budget = float(os.environ.get("SPARK_GRAFT_AGGHASH_BUDGET_SEC", "0")) or None

    import udacity_data_engineer_capstone_spark as engine

    engine.load_all()
    from pyspark.sql import SparkSession

    from udacity_data_engineer_capstone_spark.session import configure
    from tests.oracle import canon_duck_type, compare_agghash, duckdb_con

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = configure(
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("oracle-agghash-r12")
        .config("spark.driver.memory", mem)
        .config("spark.driver.extraJavaOptions", "-Xlog:disable")
        .config("spark.ui.showConsoleProgress", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    done: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            for line in fh:
                try:
                    r = json.loads(line)
                    done[r["name"]] = r
                except (ValueError, KeyError):
                    pass

    # renderability screen via the DUCKDB oracle's lazily-bound result
    # types (no execution on either engine — the Spark side of many
    # queries runs eager probe collects during fn(), so screening
    # through Spark schemas would itself take an hour)
    _PORTABLE = {
        "string", "bigint", "int", "smallint", "tinyint",
        "boolean", "date", "timestamp", "double", "float",
    }
    screen_con = duckdb_con("/root/testdata/sf0.001")
    candidates: list[str] = []
    excluded: dict[str, str] = {}
    for name in sorted(engine.QUERIES):
        spec = engine.QUERIES[name]
        if spec.oracle is None:
            excluded[name] = "rows-only (no oracle)"
            continue
        if name in DUCKDB_LIMIT_SKIPS:
            excluded[name] = "documented DuckDB oracle limit at sf100"
            continue
        try:
            rel = screen_con.sql(spec.oracle_text())
            bad = [
                t
                for t in (canon_duck_type(x) for x in rel.types)
                if t not in _PORTABLE
            ]
            if bad:
                excluded[name] = f"not agghash-renderable: {bad[:3]}"
                continue
        except Exception as e:  # noqa: BLE001 — screen must not die
            excluded[name] = f"oracle bind error: {str(e)[:120]}"
            continue
        candidates.append(name)
    candidates.sort(key=lambda n: (_cost_rank(n), n))

    print(
        f"[plan] {len(candidates)} renderable candidates,"
        f" {len(excluded)} excluded, {len(done)} already recorded",
        file=sys.stderr,
        flush=True,
    )

    t_start = time.time()
    skipped_budget: list[str] = []
    for name in candidates:
        if name in done:
            continue
        if budget and (time.time() - t_start) > budget:
            skipped_budget.append(name)
            continue
        t0 = time.time()
        try:
            r = compare_agghash(spark, name, sf_dir)
            rec = {
                "name": name,
                "ok": True,
                "rows": r["rows"],
                "h1": str(r["h1"]),
                "h2": str(r["h2"]),
                "sec": round(time.time() - t0, 1),
            }
        except Exception as e:  # noqa: BLE001 — report, don't mask siblings
            rec = {
                "name": name,
                "ok": False,
                "err": str(e)[:400],
                "sec": round(time.time() - t0, 1),
            }
        with open(out_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        done[name] = rec
        state = "OK " if rec["ok"] else "ERR"
        print(
            f"[{state}] {name} {rec.get('rows', '-')} rows {rec['sec']}s"
            f" (elapsed {round(time.time() - t_start)}s)",
            file=sys.stderr,
            flush=True,
        )

    n_ok = sum(1 for r in done.values() if r.get("ok"))
    summary = {
        "metric": "oracle_agghash_r12",
        "sf_dir": sf_dir,
        "n_candidates": len(candidates),
        "n_ok": n_ok,
        "n_err": sum(1 for r in done.values() if not r.get("ok")),
        "skipped_budget": skipped_budget,  # loud: coverage not attempted
        "excluded": excluded,
        "out": out_path,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
