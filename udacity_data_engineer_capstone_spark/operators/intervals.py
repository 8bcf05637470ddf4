"""Interval-overlap join via bucket decomposition.

Extension surface (the reference — ``/root/reference/etl.py`` — has no
interval operators): the temporal analogue of the spatial grid join.
"Find all pairs of time intervals that overlap" is a non-equi join
(``a.start <= b.end AND b.start <= a.end``) that a naive plan executes
as a broadcast-nested-loop over all |A|·|B| pairs. The scalable
expression decomposes every interval into the fixed-width time buckets
it covers (here: 7-day weeks), equi-joins on the bucket id, and keeps a
pair only in the bucket containing ``greatest(a.start, b.start)`` — the
overlap's first day — so each overlapping pair is emitted exactly once
with NO dedup shuffle. The bucketing is COMPLETE (overlapping intervals
share the bucket of their overlap start by construction), so the result
equals the brute-force answer exactly while the shuffle stays linear in
intervals x buckets-per-interval.

All arithmetic runs in integer day numbers (datediff from a fixed
epoch), so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table
from udacity_data_engineer_capstone_spark.registry import query

_BUCKET_DAYS = 14  # covers the longest interval (13 days) in <= 2 buckets

# Deterministic interval sets derived from orders (day numbers since
# 1992-01-01): set A = promotion windows, set B = delivery windows.
_INTERVALS_CTE = """
base AS (
  SELECT o_orderkey AS id,
         CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS d
  FROM orders
),
ia AS (
  SELECT id, d AS s, d + id % 7 + 1 AS e FROM base WHERE id % 11 = 0
),
ib AS (
  SELECT id, d + id % 5 AS s, d + id % 5 + id % 9 + 1 AS e
  FROM base WHERE id % 13 = 0
)
"""

_OVERLAP_ORACLE = f"""
WITH {_INTERVALS_CTE}
SELECT a.id AS a_id, b.id AS b_id,
       CAST(least(a.e, b.e) - greatest(a.s, b.s) + 1 AS BIGINT)
         AS overlap_days
FROM ia a JOIN ib b ON a.s <= b.e AND b.s <= a.e
"""


@query("join_interval_overlap", oracle=_OVERLAP_ORACLE, tags=("join", "interval"))
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All overlapping (promotion, delivery) interval pairs, via
    week-bucket decomposition.

    Each interval explodes into the {_BUCKET_DAYS}-day buckets it
    covers (``s DIV {_BUCKET_DAYS} .. e DIV {_BUCKET_DAYS}`` — at most 2
    here since intervals are <= 13 days); the join is an equi-join on
    the bucket id with the overlap test and the once-per-pair gate
    (bucket == bucket(greatest(a.s, b.s))) as residuals. Plan-pinned
    no-cartesian in tests/test_plans.py. At 100 TB: shuffle volume is
    intervals x <=2 bucket rows, hash-partitioned by time bucket — and
    time-bucketed data is usually *already* partitioned this way, so
    the exchange often disappears entirely.
    """
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1992-01-01").cast("date")
        ).cast("long").alias("d"),
    )
    ia = base.where(F.col("id") % 11 == 0).select(
        "id", F.col("d").alias("s"), (F.col("d") + F.col("id") % 7 + 1).alias("e")
    )
    ib = base.where(F.col("id") % 13 == 0).select(
        "id",
        (F.col("d") + F.col("id") % 5).alias("s"),
        (F.col("d") + F.col("id") % 5 + F.col("id") % 9 + 1).alias("e"),
    )

    def buckets(df: DataFrame) -> DataFrame:
        return df.select(
            "id",
            "s",
            "e",
            F.explode(
                F.expr(f"sequence(s DIV {_BUCKET_DAYS}, e DIV {_BUCKET_DAYS})")
            ).alias("bk"),
        )

    a = buckets(ia).alias("a")
    b = buckets(ib).alias("b")
    start = F.greatest(F.col("a.s"), F.col("b.s"))
    end = F.least(F.col("a.e"), F.col("b.e"))
    return (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e"))
            # emit the pair only in the bucket where the overlap starts
            # (integer DIV — same semantics as the bucket stamping)
            & (
                F.col("a.bk")
                == F.expr(f"greatest(a.s, b.s) DIV {_BUCKET_DAYS}")
            ),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            (end - start + 1).alias("overlap_days"),
        )
    )
