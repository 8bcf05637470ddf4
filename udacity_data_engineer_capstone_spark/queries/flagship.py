"""Flagship query: revenue by region/nation over the full star schema.

Structurally the reference's headline question — "which city do immigrants
favor" (``/root/reference/readme.md:5-7``) computed as a multi-dimension
star join + group-by (``etl.py:151-213``) — re-posed on the TPC-H-ish
testdata: which region/nation produces the most revenue.

Scale notes (100 TB posture):
- ``lineitem ⋈ orders`` is the only big-big join: both sides shuffle on
  the order key (sort-merge join; AQE may convert to shuffled-hash).
- ``customer`` is big-ish but the chain customer→nation→region is tiny
  after nation/region broadcast; we broadcast nation+region explicitly and
  let AQE decide customer (at sf0.1 it broadcasts too).
- Aggregation is partial (map-side) + final — only 25 nation groups reach
  the final shuffle, so the agg shuffle is negligible regardless of scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table
from udacity_data_engineer_capstone_spark.registry import query

_ORACLE = """
SELECT
  r.r_name AS region,
  n.n_name AS nation,
  CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
    AS BIGINT) AS revenue_ten_thousandths,
  COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


@query("flagship_regional_revenue", oracle=_ORACLE, tags=("flagship", "join", "agg"))
def flagship_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star join + 2-key group-by (SURVEY §2.5 ``join_left_5way`` +
    §2.6 ``agg_groupby_sum`` shape)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    return (
        lineitem
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            # exact *integer-cents* arithmetic per row: price is
            # cents-valued and discount is percent-valued, so
            # round(x*100) recovers the exact integer both engines agree
            # on, and the BIGINT sum is fold-order-independent — no
            # DECIMAL column ever reaches the output (decimal hashing
            # proved driver-unstable across r2/r3 despite value-perfect
            # results; integer cents is the suite-wide green pattern)
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (
                    F.lit(100).cast("long")
                    - F.round(F.col("l_discount") * 100).cast("long")
                )
            ).alias("revenue_ten_thousandths"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
