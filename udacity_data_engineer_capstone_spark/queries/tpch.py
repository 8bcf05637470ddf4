"""TPC-H-style analytic suite over the testdata star schema.

Six classic warehouse queries (pricing summary, shipping priority,
order-priority check, forecast revenue, returned items, customer
distribution), adapted to the columns the testdata carries — the
composite workloads an analytics engine is actually judged on, each one
exercising a different plan shape (wide aggregate, 3-way join + top-k,
EXISTS rewrite, selective scan, join + group + top-k, outer-join
distribution).

Float discipline (SCALE.md): every money aggregate runs in exact BIGINT
integer units — cents for prices, ten-thousandths for discounted prices,
millionths for tax-charged prices (price is cents-valued and
discount/tax are percent-valued, so ``round(x*100)`` recovers the exact
integer both engines agree on; integer sums are exact in any fold
order). No DECIMAL ever reaches an output schema: driver decimal
hashing proved unstable in r2/r3 despite value-perfect results.
Averages divide the exact integer sum cast to double by the count (IEEE
operations in a fixed order, bit-identical across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table, register_views
from udacity_data_engineer_capstone_spark.registry import query

# shared money expressions (Spark SQL and DuckDB accept the same text)
_PRICE_CENTS = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
_DISC_PCT = "CAST(ROUND(l_discount * 100) AS BIGINT)"
_TAX_PCT = "CAST(ROUND(l_tax * 100) AS BIGINT)"
# price*(1-discount) in 1/10000 units; *(1+tax) in 1/1000000 units
_DISC_PRICE = f"{_PRICE_CENTS} * (100 - {_DISC_PCT})"
_CHARGE = f"{_DISC_PRICE} * (100 + {_TAX_PCT})"

_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM({_PRICE_CENTS}) AS BIGINT) AS sum_base_price_cents,
       CAST(SUM({_DISC_PRICE}) AS BIGINT) AS sum_disc_price_ten_thousandths,
       CAST(SUM({_CHARGE}) AS BIGINT) AS sum_charge_millionths,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM({_PRICE_CENTS}) AS DOUBLE) / COUNT(*) / 100.0
         AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("tpch_q1_pricing_summary", oracle=_Q1, tags=("tpch", "agg"))
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary: the canonical wide aggregate — 6 measures over
    2 group keys with a pushed-down date filter. Partial+final hash
    aggregate; the shuffle carries one row per (flag, status)."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_Q1)


_Q3 = f"""
SELECT l.l_orderkey,
       CAST(SUM({_DISC_PRICE.replace('l_extendedprice', 'l.l_extendedprice')
                       .replace('l_discount', 'l.l_discount')}) AS BIGINT)
         AS revenue_ten_thousandths,
       o.o_orderdate
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue_ten_thousandths DESC, l.l_orderkey
LIMIT 10
"""


@query("tpch_q3_shipping_priority", oracle=_Q3, tags=("tpch", "join"))
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: selective dim filter → 3-way join → group →
    global top-10 (TakeOrderedAndProject, not a full sort). Total order
    via the orderkey tiebreak keeps the LIMIT deterministic."""
    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_Q3)


_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


@query("tpch_q4_order_priority", oracle=_Q4, tags=("tpch", "subquery"))
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority check (adapted: ship-after-order in place of the
    commit/receipt columns the testdata lacks): correlated EXISTS with a
    non-equi conjunct — Catalyst rewrites to a left semi join on
    orderkey with the date comparison as a join residual."""
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(_Q4)


_Q6 = f"""
SELECT CAST(SUM({_PRICE_CENTS} * {_DISC_PCT}) AS BIGINT)
         AS revenue_ten_thousandths,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("tpch_q6_forecast_revenue", oracle=_Q6, tags=("tpch", "agg"))
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast revenue: the pure-scan query — every predicate pushes
    to the parquet reader, no join, one global decimal sum. The query
    whose cost is IO alone; the planner's job is to not add anything."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_Q6)


_Q10 = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM({_DISC_PRICE.replace('l_extendedprice', 'l.l_extendedprice')
                       .replace('l_discount', 'l.l_discount')}) AS BIGINT)
         AS revenue_ten_thousandths,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue_ten_thousandths DESC, c.c_custkey
LIMIT 20
"""


@query("tpch_q10_returned_items", oracle=_Q10, tags=("tpch", "join"))
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned items: fact-heavy join with a broadcast nation dim,
    grouped revenue per customer, global top-20. The returnflag filter
    pushes to the lineitem scan before the join."""
    register_views(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    return spark.sql(_Q10)


_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


@query("tpch_q13_custdist", oracle=_Q13, tags=("tpch", "join"))
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer distribution: outer join with a join-condition filter
    (NOT a where-filter — customers with zero orders must survive),
    double aggregation. The classic outer-join-semantics trap query."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q13)
