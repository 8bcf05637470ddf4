"""Generate an sf1-scale dataset by 10x content-distinct replication of
the driver's read-only sf0.1 tables (VERDICT r4 #7: scale smoke beyond
sf0.1 — /root/testdata is read-only, so the scaled copy lives in /tmp).

Replication scheme: every keyed table is unioned 10x with per-replica
key OFFSETS (stride = 1 + max key of the base table), preserving
referential integrity (orders.o_custkey moves with customer.c_custkey,
lineitem's three FKs move with their dims). region/nation stay fixed
(dimension constants, like TPC-H itself).

Content distinctness matters: naive copies would make every document /
embedding a 10-way exact near-duplicate, so dedup and ANN candidate
pairs would grow ~45x (pairs-per-group quadratic), not 10x — a property
of the DATA, not the operators. To measure operator scaling honestly:

- documents: replica i>0 suffixes every word with the replica number
  (regexp), so cross-replica shingle Jaccard ~ 0 while the corpus's
  internal near-dup structure is preserved per replica;
- embeddings: replica i>0 applies a per-(replica, dim) deterministic
  sign-flip pattern, making replicas ~orthogonal to the originals while
  keeping norms and within-replica geometry;
- events: user_id offsets grow user cardinality 10x over the SAME time
  range (a denser service, the realistic scale-up) — session/window
  state grows linearly with users.

Usage: python scripts/scale_up_testdata.py [OUT_DIR] [REPLICAS]
       (defaults: /tmp/engine_scale/sf1, 10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.session import get_spark

SRC = "/root/testdata/sf0.1"

# table -> columns to offset by (stride of the named base table)
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
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/engine_scale/sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    spark = get_spark("scale-up-testdata")

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
        print(f"{t}: copied")

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
                df = df.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, j) -> CAST(x * "
                        f"(CASE WHEN (j * 31 + {i} * 17) % 2 = 0 "
                        "THEN 1.0 ELSE -1.0 END) AS FLOAT))"
                    ),
                )
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows ({replicas}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
