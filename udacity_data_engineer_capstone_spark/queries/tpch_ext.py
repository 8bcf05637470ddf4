"""TPC-H suite completion: the 16 queries `tpch.py` doesn't cover.

Adapted to the testdata star schema (TESTDATA.md): there is no
``partsupp`` table, no ``l_shipmode``/``l_commitdate``/``l_receiptdate``
and no customer phone/part container, so Q2/Q9/Q11/Q16/Q20 derive the
part-supplier relation from ``lineitem`` (GROUP BY l_partkey,
l_suppkey), Q12 classifies on ship latency vs order date, and Q21/Q22
use returnflag / nationkey in place of receipt-lateness / phone prefix.
Every adaptation preserves the *plan shape* the original exercises —
correlated scalar subqueries (Q2/Q17), CTE reuse (Q15), nested
IN/EXISTS (Q18/Q20/Q21), OR-of-ANDs pushdown (Q19), anti-join (Q16/Q22)
— which is what matters for engine coverage.

Each query is one SQL text executed verbatim by BOTH Spark and DuckDB
(oracle) so semantics can't drift. Type discipline (SCALE.md): money
runs in exact BIGINT integer units — cents for prices, ten-thousandths
for discounted prices (``round(x*100)`` recovers the exact integer both
engines agree on; integer sums are exact in any fold order, and no
DECIMAL reaches an output schema — driver decimal hashing proved
unstable in r2/r3). All sums cast to BIGINT (DuckDB would return
HUGEINT); EXTRACT(YEAR ...) cast to INTEGER (DuckDB returns BIGINT);
averages = exact integer sum cast to DOUBLE, one IEEE divide.

Reference parity: the reference (``/root/reference/etl.py``) has no
analytic suite at all — this module is extension surface demonstrating
the engine handles the standard warehouse workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from udacity_data_engineer_capstone_spark.catalog import register_views
from udacity_data_engineer_capstone_spark.registry import query

from udacity_data_engineer_capstone_spark.queries.tpch import _DISC_PRICE

# lineitem-derived stand-in for partsupp: cheapest observed price per
# (part, supplier). MIN(BIGINT cents) is exact — no fold-order hazard.
_SUPPLY = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS ps_supplycost_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
"""

_Q2 = f"""
WITH supply AS ({_SUPPLY})
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
       sp.ps_supplycost_cents
FROM part p
JOIN supply sp ON sp.ps_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = sp.ps_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE p.p_size = 15 AND p.p_type = 'LARGE' AND r.r_name = 'ASIA'
  AND sp.ps_supplycost_cents = (
    SELECT MIN(sp2.ps_supplycost_cents)
    FROM supply sp2
    JOIN supplier s2 ON s2.s_suppkey = sp2.ps_suppkey
    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
    WHERE sp2.ps_partkey = p.p_partkey AND r2.r_name = 'ASIA')
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
"""


@query("tpch_q2_min_cost_supplier", oracle=_Q2, tags=("tpch", "subquery"))
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier: correlated scalar-MIN subquery over a
    derived supply relation, decorrelated by Catalyst into an aggregate
    + equi-join on (partkey, min cost). The region/nation dims broadcast;
    the only wide shuffle is the supply GROUP BY."""
    register_views(
        spark, sf_dir, ("part", "supplier", "nation", "region", "lineitem")
    )
    return spark.sql(_Q2)


_Q5 = f"""
SELECT n.n_name,
       CAST(SUM({_DISC_PRICE.replace('l_extendedprice', 'l.l_extendedprice')
                             .replace('l_discount', 'l.l_discount')})
            AS BIGINT) AS revenue_ten_thousandths
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
                AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'EUROPE'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue_ten_thousandths DESC, n.n_name
"""


@query("tpch_q5_local_supplier_volume", oracle=_Q5, tags=("tpch", "join"))
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: 6-way join where the supplier join
    carries an extra non-key equality (s_nationkey = c_nationkey) — the
    classic same-nation co-location constraint. nation/region broadcast;
    AQE picks the big-side join order."""
    register_views(spark, sf_dir)
    return spark.sql(_Q5)


_Q7 = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS BIGINT) AS revenue_ten_thousandths
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
         {_DISC_PRICE.replace('l_extendedprice', 'l.l_extendedprice')
                      .replace('l_discount', 'l.l_discount')} AS volume
  FROM supplier s
  JOIN lineitem l ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
      OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("tpch_q7_nation_volume", oracle=_Q7, tags=("tpch", "join"))
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between two nations: the nation dim joins
    twice under different aliases with an OR-of-ANDs cross-filter that
    can't collapse to one equi-pair — Catalyst broadcasts both copies
    and evaluates the disjunction post-join, which is the right plan
    (the filter is not an equi-condition)."""
    register_views(spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation"))
    return spark.sql(_Q7)


_Q8 = f"""
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                     ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
         {_DISC_PRICE.replace('l_extendedprice', 'l.l_extendedprice')
                      .replace('l_discount', 'l.l_discount')} AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON l.l_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@query("tpch_q8_market_share", oracle=_Q8, tags=("tpch", "join"))
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: 8-way star join, conditional-sum ratio.
    The share divides two exact decimal sums after one double cast each —
    bit-identical across engines regardless of join/agg order."""
    register_views(spark, sf_dir)
    return spark.sql(_Q8)


# Q9 profit: revenue minus a quantity-scaled cost proxy (p_retailprice at
# a 0.6 margin — testdata has no ps_supplycost). All BIGINT in 1/10000
# dollar units: disc_price is already ten-thousandths; the cost term is
# qty_tenths * retail_cents * 6 (= 0.6*qty*retail*10000 exactly, since
# quantity is tenths-valued and retailprice cents-valued).
_AMOUNT = (
    f"{_DISC_PRICE.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}"
    " - CAST(ROUND(l.l_quantity * 10) AS BIGINT)"
    " * CAST(ROUND(p.p_retailprice * 100) AS BIGINT)"
    " * 6"
)

_Q9 = f"""
SELECT nation, o_year,
       CAST(SUM(amount) AS BIGINT) AS sum_profit_ten_thousandths
FROM (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
         {_AMOUNT} AS amount
  FROM part p
  JOIN lineitem l ON l.l_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("tpch_q9_product_profit", oracle=_Q9, tags=("tpch", "join"))
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit: LIKE-filtered part dim drives a 5-way
    join; profit is exact integer arithmetic per row then an exact sum.
    The part filter prunes before the fact join (predicate pushdown +
    broadcast of the filtered dim)."""
    register_views(spark, sf_dir, ("part", "lineitem", "supplier", "orders", "nation"))
    return spark.sql(_Q9)


_Q11 = f"""
WITH supply_value AS (
  SELECT l.l_partkey AS ps_partkey,
         SUM({_DISC_PRICE.replace('l_extendedprice', 'l.l_extendedprice')
                          .replace('l_discount', 'l.l_discount')}) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_5'
  GROUP BY l.l_partkey
)
SELECT ps_partkey, CAST(value AS BIGINT) AS value_ten_thousandths
FROM supply_value
WHERE CAST(value AS DOUBLE) > (
  SELECT CAST(SUM(value) AS DOUBLE) * 0.001 FROM supply_value)
ORDER BY value_ten_thousandths DESC, ps_partkey
"""


@query("tpch_q11_important_stock", oracle=_Q11, tags=("tpch", "subquery"))
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock: HAVING-vs-global-scalar shape — a grouped
    CTE filtered against an uncorrelated scalar aggregate of itself.
    Spark evaluates the scalar subquery once (subquery broadcast), not
    per row. The 0.001 threshold compares double-vs-double after exact
    decimal sums, so both engines agree bit-for-bit."""
    register_views(spark, sf_dir, ("lineitem", "supplier", "nation"))
    return spark.sql(_Q11)


_Q12 = """
SELECT ship_class,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM (
  SELECT l_orderkey,
         CASE WHEN l_shipdate < o2.o_orderdate + INTERVAL 30 DAY
              THEN 'FAST' ELSE 'SLOW' END AS ship_class
  FROM lineitem
  JOIN orders o2 ON o2.o_orderkey = lineitem.l_orderkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
) classed
JOIN orders o ON o.o_orderkey = classed.l_orderkey
GROUP BY ship_class
ORDER BY ship_class
"""


@query("tpch_q12_ship_latency_priority", oracle=_Q12, tags=("tpch", "agg"))
def tpch_q12_ship_latency_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-priority check, adapted: testdata has no l_shipmode,
    so lines are classed FAST/SLOW by ship latency vs order date
    (interval arithmetic both engines share). Conditional-count
    pivot-style aggregate over a fact-fact join."""
    register_views(spark, sf_dir, ("lineitem", "orders"))
    return spark.sql(_Q12)


_PROMO_DISC = _DISC_PRICE.replace("l_extendedprice", "l.l_extendedprice").replace(
    "l_discount", "l.l_discount"
)

_Q14 = f"""
SELECT CAST(100 AS DOUBLE)
       * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_PROMO_DISC}
                       ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
       / CAST(SUM({_PROMO_DISC}) AS DOUBLE) AS promo_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
"""


@query("tpch_q14_promo_revenue", oracle=_Q14, tags=("tpch", "agg"))
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion revenue share: single-row conditional-aggregate
    ratio. Both sums are exact decimals; the two double casts and the
    multiply/divide are a fixed IEEE expression tree."""
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q14)


_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({_DISC_PRICE}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_revenue AS BIGINT) AS total_revenue_ten_thousandths
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@query("tpch_q15_top_supplier", oracle=_Q15, tags=("tpch", "subquery"))
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: CTE referenced twice (join side + scalar MAX).
    Equality on exact decimals is safe — the sums are fold-order
    independent, so the MAX matches the same rows on both engines."""
    register_views(spark, sf_dir, ("lineitem", "supplier"))
    return spark.sql(_Q15)


_Q16 = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@query("tpch_q16_supplier_cnt", oracle=_Q16, tags=("tpch", "subquery"))
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 parts/supplier relationship: NOT IN anti-join (null-aware,
    but s_suppkey is non-null so it compiles to a plain anti join)
    under a COUNT(DISTINCT) over brand/type/size buckets."""
    register_views(spark, sf_dir, ("lineitem", "part", "supplier"))
    return spark.sql(_Q16)


_Q17 = """
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND p.p_size = 7
  AND l.l_quantity < (
    SELECT CAST(0.2 AS DOUBLE)
           * (CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
"""


@query("tpch_q17_small_qty_revenue", oracle=_Q17, tags=("tpch", "subquery"))
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: correlated per-part average
    quantity, decorrelated to an aggregate + join. The average is the
    exact integer sum divided once as double (never AVG(double), whose
    fold order differs across engines)."""
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q17)


_Q18 = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@query("tpch_q18_large_volume_customer", oracle=_Q18, tags=("tpch", "subquery"))
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: IN-subquery with a HAVING aggregate
    (left-semi join on the grouped orderkeys), then re-aggregate with
    the customer dim. Integer quantity sums on both sides — no HUGEINT
    drift. Top-100 by price with orderkey tiebreak."""
    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_Q18)


_Q19 = f"""
SELECT CAST(SUM({_PROMO_DISC}) AS BIGINT) AS revenue_ten_thousandths
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


@query("tpch_q19_disc_revenue_or", oracle=_Q19, tags=("tpch", "filter"))
def tpch_q19_disc_revenue_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue: OR-of-AND predicate straddling both join
    sides. Catalyst extracts the common p_partkey equi-condition and
    pushes the per-side conjuncts (brand/size to the part scan,
    quantity to the lineitem scan) below the join."""
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q19)


_Q20 = """
SELECT s.s_name, s.s_suppkey
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_7'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'small%'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(CAST(l.l_quantity AS BIGINT)) > 50)
ORDER BY s.s_name
"""


@query("tpch_q20_promotion_suppliers", oracle=_Q20, tags=("tpch", "subquery"))
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion: semi-join against a grouped,
    HAVING-filtered subquery over a LIKE-pruned part set — suppliers who
    moved real volume of 'small%' parts. The IN compiles to left-semi;
    the part filter pushes below the fact join."""
    register_views(spark, sf_dir, ("supplier", "nation", "lineitem", "part"))
    return spark.sql(_Q20)


_Q21 = """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
  AND n.n_name = 'NATION_2'
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""


@query("tpch_q21_waiting_supplier", oracle=_Q21, tags=("tpch", "subquery"))
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting, adapted: 'late' =
    returnflag R (testdata has no receipt/commit dates). EXISTS +
    NOT EXISTS correlated on (orderkey, suppkey-inequality) — a
    left-semi then left-anti join against the same fact table, the
    hardest decorrelation shape in the suite."""
    register_views(spark, sf_dir, ("supplier", "lineitem", "orders", "nation"))
    return spark.sql(_Q21)


_Q22 = """
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS totacctbal_cents
FROM (
  SELECT CAST(c_nationkey % 7 AS INTEGER) AS cntrycode, c_acctbal
  FROM customer c
  WHERE c_nationkey IN (1, 3, 5, 8, 13, 17, 21)
    AND c_acctbal > (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*)
      FROM customer
      WHERE c_acctbal > 0.0
        AND c_nationkey IN (1, 3, 5, 8, 13, 17, 21))
    AND NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
"""


@query("tpch_q22_global_sales_opportunity", oracle=_Q22, tags=("tpch", "subquery"))
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity, adapted: country code derives from
    nationkey (testdata has no phone column). Scalar-average filter
    (exact decimal sum / count, one double divide) + NOT EXISTS
    anti-join against orders, then a one-pass regroup."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q22)
