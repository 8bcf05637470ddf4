"""Recursive-CTE surface (Spark 4 ``WITH RECURSIVE``).

The reference has no recursion anywhere (its only SQL is three flat
SELECTs, ``/root/reference/etl.py:159-221``); this is extension surface
for hierarchy walks — org charts, category trees, thread ancestry —
which a corpus-curation pipeline meets as soon as documents carry a
parent/reply structure.

Spark-first expression: Spark 4 executes ``WITH RECURSIVE`` natively
(iterative UNION ALL expansion under the hood, one filter+project per
level — no driver loop, no custom iteration code). DuckDB runs the
same recursion, so the oracle is the identical query modulo dialect
(`DIV` vs `//`, explicit BIGINT casts where DuckDB widens to HUGEINT).

Determinism/scale: the recursion walks each customer id up the implicit
binary-heap ancestor chain (``node -> node DIV 2`` until the root), so
it is acyclic by construction with depth ``log2(max_id)`` — ~10 levels
at sf0.01, ~30 at 100 TB id ranges: per-level work is one hash-free
projection over the frontier; total rows = n_custkeys * depth. Integer
arithmetic only — bit-exact across engines at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from udacity_data_engineer_capstone_spark.catalog import register_views
from udacity_data_engineer_capstone_spark.registry import query

# Spark: integer division is DIV; SUM(BIGINT) stays BIGINT.
_REC_SPARK = """
WITH RECURSIVE chain AS (
  SELECT cust_id, cust_id AS node, 0 AS depth
  FROM (SELECT DISTINCT o_custkey AS cust_id FROM orders)
  UNION ALL
  SELECT cust_id, node DIV 2 AS node, depth + 1 AS depth
  FROM chain WHERE node > 1
)
SELECT depth,
       CAST(COUNT(*) AS BIGINT) AS n_chains,
       CAST(COUNT(DISTINCT node) AS BIGINT) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS sum_nodes
FROM chain
GROUP BY depth
"""

# DuckDB: // for integer division; SUM over BIGINT widens to HUGEINT →
# explicit cast back (driver hashes are type-sensitive).
_REC_ORACLE = """
WITH RECURSIVE chain AS (
  SELECT cust_id, cust_id AS node, 0 AS depth
  FROM (SELECT DISTINCT o_custkey AS cust_id FROM orders)
  UNION ALL
  SELECT cust_id, node // 2 AS node, depth + 1 AS depth
  FROM chain WHERE node > 1
)
SELECT depth,
       CAST(COUNT(*) AS BIGINT) AS n_chains,
       CAST(COUNT(DISTINCT node) AS BIGINT) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS sum_nodes
FROM chain
GROUP BY depth
"""


@query("sql_recursive_cte", oracle=_REC_ORACLE, tags=("sql", "recursive"))
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor-chain walk via native ``WITH RECURSIVE``: every customer id
    climbs its binary-heap ancestor path (``node DIV 2``) to the root,
    then a per-depth rollup counts chains, distinct ancestors, and total
    node mass. Depth 0 is one row per distinct customer; the frontier
    halves its value each level, so termination is structural."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_REC_SPARK)
