"""Generate scaled datasets by N-times content-distinct replication —
v3: crossJoin-with-range replication, value-identical to v2.

v2 (`scale_up_testdata_v2.py`) materializes an N-way `unionAll` with
per-replica `withColumn` offsets. That plan has N branches: at the 100
replicas of sf10 Catalyst analysis already takes seconds, and at the
1000 replicas a THIRD decade (sf100) needs, analysis alone would
dominate. v3 expresses the same replication as ONE crossJoin against a
broadcast `range(replicas)` frame and computes every per-replica
transform from the `rep` column — a 2-node plan at any N, and the scan
parallelism is rows×replicas instead of one task per replica branch.

Value parity with v2 is exact by construction and VERIFIED by
`--verify-against DIR` (row-multiset hash per table, order-free):

- key offsets: `col + rep * stride` in LONG — same arithmetic.
- documents text: replica i>0 suffixes every word with the replica
  number. Java regex replacement `concat('$1', rep)` parses as group 1
  + literal digits (only one group exists), matching v2's f-string
  `rf"$1{i}"`.
- embeddings sign flip: `pmod(hash(j, CAST(rep AS INT)), 2)` — the
  cast matters: v2 inlines the replica as an INT literal, and Spark's
  murmur3 hashes INT and LONG differently, so an uncast `rep` (LONG
  from `spark.range`) would silently generate DIFFERENT data than v2.
- replica 0 is the untouched base table for text/embedding (guarded
  with CASE WHEN rep = 0), exactly like v2's `if i > 0`.

Usage: python scripts/scale_up_testdata_v3.py OUT_DIR REPLICAS
       python scripts/scale_up_testdata_v3.py OUT_DIR REPLICAS \
              --verify-against V2_DIR   (order-free parity check only)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.session import get_spark

SRC = "/root/testdata/sf0.1"

OFFSETS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

ALL_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


# Output layout: at least CORES files per table and ~32 MB per file
# above that, so scan parallelism is CONSTANT (= all cores) at every
# rung for small tables and proportional to data for big ones — the
# ladder's cross-rung ratios then measure operator data-cost, not
# layout. Without the floor, a 58 MB documents table lands in 4 files
# and the CPU-bound shingle scans run 4-wide on a 32-core box
# (observed: dedup_minhash_lsh 45 s at sf10 under a 7-file layout vs
# 13 s under v2's many-file layout); without any repartition at all,
# the crossJoin writes one file per input split (2-3 multi-GB files at
# sf100) and reads collapse to the few row groups one writer produced
# (observed: pipe_pretrain_mix 74 s vs 24 s at sf10).
_TARGET_FILE_BYTES = 32 << 20
_MIN_FILES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _replicate(base, t: str, replicas: int, strides: dict):
    reps = F.broadcast(
        base.sparkSession.range(replicas).select(F.col("id").alias("rep"))
    )
    df = base.crossJoin(reps)
    for col, stride_of in OFFSETS[t].items():
        df = df.withColumn(
            col,
            (F.col(col) + F.col("rep") * F.lit(strides[stride_of])).cast("long"),
        )
    if t == "documents":
        df = df.withColumn(
            "text",
            F.expr(
                "CASE WHEN rep = 0 THEN text ELSE "
                "regexp_replace(text, '(\\\\w+)', "
                "concat('$1', CAST(rep AS STRING))) END"
            ),
        )
    if t == "embeddings":
        # murmur3-parity sign flip per (dim, replica); INT cast keeps
        # hash() bit-identical to v2's inlined int literal
        df = df.withColumn(
            "embedding",
            F.expr(
                "CASE WHEN rep = 0 THEN embedding ELSE "
                "transform(embedding, (x, j) -> CAST(x * "
                "(CASE WHEN pmod(hash(j, CAST(rep AS INT)), 2) = 0 "
                "THEN 1.0 ELSE -1.0 END) AS FLOAT)) END"
            ),
        )
    return df.drop("rep").select(*base.columns)


def _table_hash(spark, path: str) -> tuple[int, int]:
    """Order-free row-multiset fingerprint: (count, xor-free sum of
    per-row xxhash64 over all columns cast to string)."""
    df = spark.read.parquet(path)
    row_h = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(row_h.cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    return int(agg["n"]), int(agg["s"])


def main() -> int:
    out = sys.argv[1]
    replicas = int(sys.argv[2])
    verify_dir = None
    if "--verify-against" in sys.argv:
        verify_dir = sys.argv[sys.argv.index("--verify-against") + 1]
    os.makedirs(out, exist_ok=True)
    # the repartition shuffle of the replicated frame needs real heap —
    # the default local JVM OOMed writing sf10 lineitem (60M rows × 32
    # concurrent writer tasks). Driver memory must be set BEFORE the
    # JVM launches, hence PYSPARK_SUBMIT_ARGS rather than a builder
    # config (local mode: driver == the only JVM).
    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", "--driver-memory 48g pyspark-shell"
    )
    spark = get_spark("scale-up-testdata-v3")
    spark.sparkContext.setLogLevel("ERROR")

    # The driver's base files are SINGLE-row-group parquet (TESTDATA.md),
    # so a raw scan yields ONE non-empty split and the whole crossJoin
    # fan-out runs in one task (observed: the sf100 lineitem stage sat
    # 31-done/1-running for 25+ minutes generating 600M rows single-
    # threaded). Repartitioning the tiny base FIRST spreads the
    # replication across all cores; the final repartition below still
    # owns the output layout, and values are order-independent.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = {
        t: spark.read.parquet(f"{SRC}/{t}.parquet").repartition(cpus)
        for t in ALL_TABLES
    }
    strides = {
        t: base[t].agg(F.max(KEY_OF[t])).collect()[0][0] + 1 for t in KEY_OF
    }
    strides["events_user"] = (
        base["events"].agg(F.max("user_id")).collect()[0][0] + 1
    )

    for t in ("region", "nation"):
        base[t].write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"{t}: copied", flush=True)

    for t in OFFSETS:
        est_bytes = os.path.getsize(f"{SRC}/{t}.parquet") * replicas
        n_files = max(_MIN_FILES, -(-est_bytes // _TARGET_FILE_BYTES))
        _replicate(base[t], t, replicas, strides).repartition(
            int(n_files)
        ).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows ({replicas}x)", flush=True)
        if verify_dir:
            h_new = _table_hash(spark, f"{out}/{t}.parquet")
            h_old = _table_hash(spark, f"{verify_dir}/{t}.parquet")
            status = "PARITY" if h_new == h_old else "MISMATCH"
            print(f"{t}: {status} v3={h_new} v2={h_old}", flush=True)
            if h_new != h_old:
                return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
