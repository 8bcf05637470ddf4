"""Generate sf1/sf10-scale datasets by N-times content-distinct
replication of the driver's read-only sf0.1 tables (round-9 directive 1:
prove the SECOND decade — the 100 TB posture rested on a single
sf0.1→sf1 extrapolation; /root/testdata is read-only, so scaled copies
live in /tmp/engine_scale).

Replication scheme (v2 — generalizes scale_up_testdata.py past 10
replicas): every keyed table is unioned N× with per-replica key OFFSETS
(stride = 1 + max key of the base table), preserving referential
integrity. region/nation stay fixed (dimension constants, like TPC-H).

Content distinctness matters: naive copies make every document/embedding
an N-way exact near-duplicate, so dedup and ANN candidate pairs grow
quadratically in N — a property of the DATA, not the operators. v2 fixes
two v1 artifacts that limited honest measurement:

- documents: replica i>0 suffixes every word with the replica NUMBER —
  multi-digit for i>=10 (v1 only ever emitted one digit). Cross-replica
  shingle Jaccard ~ 0; token-level collisions (base token "x1" in
  replica 2 vs "x" in replica 12, both → "x12") touch isolated shingles,
  never whole documents.
- embeddings: replica i>0 sign-flips each dimension by the PARITY OF A
  HASH of (dim, replica) — v1 used (j·31 + i·17) % 2 ≡ (i+j) % 2, i.e.
  parity of i only, which made all even replicas share one transform and
  all odd replicas another: at 10 replicas the embedding table held 4-
  and 5-way EXACT duplicate vector sets, quadratically inflating ANN/
  semdedup candidate structure (a data artifact the smoke then measured
  instead of the operators). Murmur3-parity flips are pairwise ~random,
  so replicas are mutually ~orthogonal at every N.
- events: user_id offsets grow user cardinality N× over the SAME time
  range (a denser service — the realistic scale-up); session/window
  state grows linearly with users.

Usage: python scripts/scale_up_testdata_v2.py OUT_DIR REPLICAS
       e.g.  .../scale_up_testdata_v2.py /tmp/engine_scale/sf1 10
             .../scale_up_testdata_v2.py /tmp/engine_scale/sf10 100
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


def main() -> int:
    out = sys.argv[1]
    replicas = int(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    spark = get_spark("scale-up-testdata-v2")
    spark.sparkContext.setLogLevel("ERROR")

    base = {
        t: spark.read.parquet(f"{SRC}/{t}.parquet")
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
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

    for t, offs in OFFSETS.items():
        parts = []
        for i in range(replicas):
            df = base[t]
            for col, stride_of in offs.items():
                df = df.withColumn(
                    col, (F.col(col) + F.lit(i * strides[stride_of])).cast("long")
                )
            if t == "documents" and i > 0:
                df = df.withColumn(
                    "text", F.regexp_replace("text", r"(\w+)", rf"$1{i}")
                )
            if t == "embeddings" and i > 0:
                # murmur3-parity sign flip per (dim, replica): pairwise
                # ~orthogonal replicas at any N (see module docstring)
                df = df.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, j) -> CAST(x * "
                        f"(CASE WHEN pmod(hash(j, {i}), 2) = 0 "
                        "THEN 1.0 ELSE -1.0 END) AS FLOAT))"
                    ),
                )
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows ({replicas}x)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
