"""Round-12 directive 5, watchdog form: the broad sf100 agghash sweep
(`oracle_agghash_r12.py`) has no per-query wall cap, and its first run
spent 40+ minutes inside ONE DuckDB oracle (in-process, D-state
spilling) — a single pathological oracle can eat the whole budget.

This variant adds exactly three things; plan, gate, and record format
are unchanged:

- **Sentinel-before-attempt**: before running a query it appends an
  ``{"ok": false, "err": "in-flight (sentinel)"}`` record; on
  completion it appends the real record (last line per name wins when
  resuming). A watchdog kill therefore leaves a LOUD timeout record
  and the rerun skips the query instead of re-grinding it.
- **Per-query wall cap** (SPARK_GRAFT_AGGHASH_QUERY_CAP_SEC, default
  1200 s — above every legitimate r11 sf100 single-query time except
  the two already-stamped >800 s outliers, which keep their r11
  stamps): a monitor thread ``os._exit(86)``s the process when the
  in-flight query exceeds the cap, because neither a grinding DuckDB
  C++ call nor a blocked py4j collect is reliably interruptible
  in-thread.
- **Exit-code contract** for an outer rerun loop: 86 = watchdog fired
  (rerun to resume), 0 = sweep drained or budget reached (summary
  printed).

Skipped-by-cap queries are exactly the JSONL's ``ok: false`` sentinel
records — dropped coverage stays loud, never silent.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_agghash_r12 import (  # noqa: E402 — same plan/screen/skips
    DUCKDB_LIMIT_SKIPS,
    _cost_rank,
)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/tmp/engine_scale/sf100"
    out_path = args[1] if len(args) > 1 else "/tmp/agghash_r12_sf100.jsonl"
    budget = float(os.environ.get("SPARK_GRAFT_AGGHASH_BUDGET_SEC", "0")) or None
    deadline = float(os.environ.get("SPARK_GRAFT_AGGHASH_DEADLINE", "0")) or None
    cap = float(os.environ.get("SPARK_GRAFT_AGGHASH_QUERY_CAP_SEC", "1200"))

    import udacity_data_engineer_capstone_spark as engine

    engine.load_all()
    from pyspark.sql import SparkSession

    from udacity_data_engineer_capstone_spark.session import configure
    from tests.oracle import canon_duck_type, compare_agghash, duckdb_con

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = configure(
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("oracle-agghash-r12b")
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
                    done[r["name"]] = r  # last line per name wins
                except (ValueError, KeyError):
                    pass

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
    # Cheapest-first, using MEASURED priors where they exist: a query's
    # sf0.1 bench median (BENCH_DETAIL.json samples) orders far better
    # than the table-class alphabet — the alphabet put the iterative
    # dedup_* heavies (cluster CC fixpoints, rolling-hash chunking)
    # ahead of hundreds of sub-second scans, so cap-kills starved the
    # cheap majority of the deadline. Unknown names fall back to their
    # class rank at a neutral mid prior.
    priors: dict[str, float] = {}
    try:
        import statistics

        with open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_DETAIL.json")
        ) as fh:
            bd = json.load(fh)
        for block in (bd.get("samples", {}),
                      bd.get("rotation", {}).get("samples", {})):
            for q, samples in block.items():
                if samples:
                    priors[q] = statistics.median(samples)
    except Exception:  # noqa: BLE001 — priors are an ordering hint only
        pass
    candidates.sort(
        key=lambda n: (priors.get(n, 1.0 + _cost_rank(n)), n)
    )

    n_pending = sum(1 for n in candidates if n not in done)
    print(
        f"[plan] {len(candidates)} renderable candidates,"
        f" {len(excluded)} excluded, {len(done)} already recorded,"
        f" {n_pending} pending, cap {cap}s",
        file=sys.stderr,
        flush=True,
    )

    # watchdog: hard-exit when the in-flight query exceeds the cap —
    # a grinding in-process DuckDB call is not interruptible from a
    # sibling thread, and a py4j collect may be blocked in a socket
    # read; os._exit is the only reliable cancel. The sentinel record
    # already on disk turns the kill into a loud per-query timeout.
    inflight: dict = {"name": None, "t0": 0.0}
    lock = threading.Lock()

    def _watch() -> None:
        while True:
            time.sleep(5)
            with lock:
                name, t0 = inflight["name"], inflight["t0"]
            if name is not None and (time.time() - t0) > cap:
                print(
                    f"[WATCHDOG] {name} exceeded {cap}s — exiting 86"
                    " (sentinel record stands; rerun resumes)",
                    file=sys.stderr,
                    flush=True,
                )
                os._exit(86)

    threading.Thread(target=_watch, daemon=True).start()

    t_start = time.time()
    skipped_budget: list[str] = []
    for name in candidates:
        if name in done:
            continue
        if budget and (time.time() - t_start) > budget:
            skipped_budget.append(name)
            continue
        if deadline and time.time() > deadline:
            skipped_budget.append(name)
            continue
        sentinel = {
            "name": name,
            "ok": False,
            "err": f"in-flight sentinel — watchdog cap {cap}s"
            " (a completion record after this line supersedes it)",
            "sec": 0.0,
        }
        with open(out_path, "a") as fh:
            fh.write(json.dumps(sentinel) + "\n")
        t0 = time.time()
        with lock:
            inflight["name"], inflight["t0"] = name, t0
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
        finally:
            with lock:
                inflight["name"] = None
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
        "metric": "oracle_agghash_r12b",
        "sf_dir": sf_dir,
        "n_candidates": len(candidates),
        "n_ok": n_ok,
        "n_err": sum(1 for r in done.values() if not r.get("ok")),
        "skipped_budget": skipped_budget,
        "excluded": excluded,
        "out": out_path,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
