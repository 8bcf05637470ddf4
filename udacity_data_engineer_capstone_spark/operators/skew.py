"""Skew-mitigation join variants (SURVEY §7 M4).

AQE's skew-join splitting handles most skew automatically (on in
session.py); this module provides the *manual* salting pattern for the
pathological cases AQE can't split (e.g. a single key holding >50% of a
100 TB fact table, or skew under a non-shuffle join constraint).

The salted join is semantically identical to the plain join — which is
exactly what its oracle asserts (the oracle is the *unsalted* SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table
from udacity_data_engineer_capstone_spark.registry import query

SALT_BUCKETS = 8

_SALTED_ORACLE = """
SELECT l.l_orderkey, l.l_linenumber, o.o_totalprice,
       l.l_extendedprice * (1 - l.l_discount) AS net_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


@query("join_salted_skew", oracle=_SALTED_ORACLE, tags=("join", "skew"))
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: the (conceptually skewed) fact side gets a
    deterministic salt in [0, 8); the dim side is replicated 8× with
    every salt value; the join key becomes (key, salt), spreading each
    hot key over 8 shuffle partitions. Output is row-identical to the
    plain join — verified by the unsalted oracle.

    Salt choice: ``l_linenumber % 8`` is deterministic (keeps the oracle
    exact); production salting uses a uniform random or hash salt —
    distribution quality matters, determinism doesn't."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", (F.col("l_linenumber") % SALT_BUCKETS).cast("int")
    )
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)]))
    )
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey) & (li.salt == orders.salt),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_totalprice",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )
