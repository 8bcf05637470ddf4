"""Sketch and bitwise aggregates: the distributed-distinct toolbox.

``agg_hll_partitioned`` is the pattern every 100 TB distinct-count uses
in production: build a *mergeable* HLL sketch per partition-group
(map-side, fixed 2^lgK bytes each), union the sketches upward, estimate
once — no shuffle of raw values at all.  Exact ``COUNT(DISTINCT)``
shuffles every distinct value; sketches shuffle kilobytes.  The sketch
estimate is engine-specific, so the driver-checkable contract follows
the ``agg_approx_distinct`` pattern: emit the exact count plus a
``sketch_ok`` boolean asserting the estimate landed inside the sketch's
error envelope, and the oracle computes the exact side with TRUE
literals.

``agg_bitwise_masks`` covers the BIT_OR/BIT_AND/BIT_XOR aggregate
family (bitmap-style presence masks); one SQL text runs verbatim on
both engines.

Reference parity: the reference (``/root/reference/etl.py``) has no
approximate or bitwise aggregates — extension surface (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from udacity_data_engineer_capstone_spark.catalog import register_views
from udacity_data_engineer_capstone_spark.registry import query

# lgConfigK = 14 -> relative standard error ~0.81%; the 5% gate below is
# > 6 sigma, so the boolean is deterministic in practice at any scale.
_LG_K = 14

_HLL_ORACLE = """
SELECT source,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_exact,
       TRUE AS sketch_ok
FROM documents
GROUP BY source
"""


@query("agg_hll_partitioned", oracle=_HLL_ORACLE, tags=("agg", "sketch"))
def agg_hll_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable distinct count: HLL sketches built per
    (source, lang) group — the map-side partial — then merged per source
    with ``hll_union_agg`` and estimated.  This is the shape that scales:
    sketch bytes cross the shuffle, never the distinct values.  The exact
    count is computed alongside only to *verify* the estimate; a real
    100 TB run would ship the sketch alone."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        f"""
        WITH partials AS (
          SELECT source, lang,
                 hll_sketch_agg(text, {_LG_K}) AS sk,
                 COUNT(DISTINCT text) AS n_part
          FROM documents
          GROUP BY source, lang
        ),
        merged AS (
          SELECT source,
                 hll_sketch_estimate(hll_union_agg(sk, TRUE)) AS n_est
          FROM partials
          GROUP BY source
        ),
        exact AS (
          SELECT source, CAST(COUNT(DISTINCT text) AS BIGINT) AS n_exact
          FROM documents
          GROUP BY source
        )
        SELECT e.source, e.n_exact,
               ABS(m.n_est - e.n_exact) <= CAST(0.05 * e.n_exact AS BIGINT)
                 AS sketch_ok
        FROM exact e JOIN merged m ON m.source = e.source
        """
    )


# Presence bitmasks over customer-residue classes: BIT_OR accumulates
# which residues appear per order status (a 64-bit bitmap index cell),
# BIT_AND finds always-set bits, BIT_XOR gives the parity fingerprint.
# One text, both engines; outputs cast to BIGINT (DuckDB would keep
# INT128 lanes otherwise on some paths).
_BITWISE_SQL = """
SELECT o_orderstatus,
       CAST(BIT_OR(o_custkey % 64) AS BIGINT) AS residue_or,
       CAST(BIT_AND(o_custkey % 64 + 64) AS BIGINT) AS residue_and,
       CAST(BIT_XOR(o_custkey % 64) AS BIGINT) AS residue_xor,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


@query("agg_bitwise_masks", oracle=_BITWISE_SQL, tags=("agg",))
def agg_bitwise_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (BIT_OR/BIT_AND/BIT_XOR) as bitmap
    presence masks.  Associative + commutative, so Spark evaluates them
    as partial+final hash aggregates — map-side combine leaves one long
    per group to shuffle."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_BITWISE_SQL)
