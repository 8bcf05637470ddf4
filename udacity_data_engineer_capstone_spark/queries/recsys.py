"""Recommender / market-basket analysis over order baskets.

Classic co-purchase mining on the ``lineitem`` fact: which parts are
bought together more often than chance (association rules:
support / confidence / lift), and which parts have the most similar
buyer baskets (item-item Jaccard) — the batch half of an item-to-item
collaborative-filtering pipeline (Amazon-style "customers who bought X
also bought Y").

Reference parity: the reference (``/root/reference/etl.py``) has no
co-occurrence mining — extension surface (SURVEY §2.8).

Scale notes (100 TB posture):

- The pair expansion is an **equi self-join on the basket key**
  (``l_orderkey``), so the shuffle is hash-partitioned by basket and
  never all-pairs across the corpus.
- Within a basket the expansion is quadratic in basket size, so both
  operators cap baskets at ``_MAX_BASKET`` items — the standard guard
  that keeps one hot basket (a re-seller buying 10 000 distinct parts)
  from emitting 10^8 pairs. The cap is applied with one window count,
  and dropped baskets are a deliberate, documented exclusion.
- Pair counting and item counting are map-side-combinable hash
  aggregates; the per-item counts joined back onto pairs are
  item-dimension-sized (bounded by the catalog, not the fact), which
  AQE broadcasts.
- All ratios are computed as ``FLOOR(double)`` over **exact integer
  counts** — at these magnitudes (quotients < 1e7) the double quotient
  is exact-or-well-separated from integers, so both engines floor
  identically; no double is ever summed across rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table
from udacity_data_engineer_capstone_spark.registry import query

# Baskets larger than this are excluded from pair mining (quadratic
# blowup guard); 2-item minimum because singleton baskets carry no
# co-occurrence signal.
_MAX_BASKET = 50

_BASKET_CTES = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS item FROM lineitem
),
sized AS (
  SELECT okey, item, COUNT(*) OVER (PARTITION BY okey) AS bsize FROM items
),
kept AS (
  SELECT okey, item FROM sized WHERE bsize BETWEEN 2 AND {_MAX_BASKET}
),
nb AS (
  SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_baskets FROM kept
),
item_cnt AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt FROM kept GROUP BY item
),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b,
         CAST(COUNT(*) AS BIGINT) AS pair_cnt
  FROM kept a JOIN kept b ON a.okey = b.okey AND a.item < b.item
  GROUP BY a.item, b.item
)
"""

_BASKET_SQL = (
    _BASKET_CTES
    + """
SELECT p.item_a, p.item_b, p.pair_cnt,
       ca.cnt AS cnt_a, cb.cnt AS cnt_b,
       CAST(FLOOR(p.pair_cnt * 1000000.0 / nb.n_baskets) AS BIGINT)
         AS support_ppm,
       CAST(FLOOR(p.pair_cnt * 1000000.0 / ca.cnt) AS BIGINT)
         AS confidence_a_to_b_ppm,
       CAST(FLOOR(CAST(CAST(p.pair_cnt AS DECIMAL(38,0)) * nb.n_baskets
                       AS DOUBLE) * 1000.0
                  / CAST(CAST(ca.cnt AS DECIMAL(38,0)) * cb.cnt AS DOUBLE))
            AS BIGINT) AS lift_milli
FROM pairs p
JOIN item_cnt ca ON ca.item = p.item_a
JOIN item_cnt cb ON cb.item = p.item_b
CROSS JOIN nb
ORDER BY p.pair_cnt DESC, p.item_a, p.item_b
LIMIT 50
"""
)


def _kept_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduped, basket-size-capped (basket, item) set, materialized
    ONCE: the SQL CTE form re-scans the fact for every reference
    (pair-join sides, item counts, basket count — four parquet scans in
    the plan); localCheckpoint pins the id-width intermediate so all
    consumers reuse a single scan — the same reuse device the graph
    operators use for static adjacency."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("item")
        )
        .distinct()
    )
    bsize = F.count(F.lit(1)).over(Window.partitionBy("okey"))
    kept = (
        items.withColumn("bsize", bsize)
        .where((F.col("bsize") >= 2) & (F.col("bsize") <= _MAX_BASKET))
        .drop("bsize")
    )
    return kept.localCheckpoint(eager=True)


def _pair_counts(kept: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )
    item_cnt = kept.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    nb = kept.agg(F.countDistinct("okey").alias("n_baskets"))
    return pairs, item_cnt, nb


@query("rec_market_basket", oracle=_BASKET_SQL, tags=("recsys", "join", "agg"))
def rec_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: top-50 co-purchased part
    pairs with support (ppm of baskets), directional confidence
    P(b|a), and lift vs independence — the classic market-basket
    output a merchandising team reads directly.

    Dedup to (basket, item), window-count to enforce the basket-size
    cap, equi self-join on the basket key to expand pairs, two hash
    aggregates for pair and item counts, and a deterministic top-50
    (count desc, then the pair key, so boundary ties are
    total-ordered). The capped basket set materializes once (see
    ``_kept_items``); the oracle SQL expresses the identical
    computation as CTEs."""
    pairs, item_cnt, nb = _pair_counts(_kept_items(spark, sf_dir))
    ca = item_cnt.select(
        F.col("item").alias("item_a"), F.col("cnt").alias("cnt_a")
    )
    cb = item_cnt.select(
        F.col("item").alias("item_b"), F.col("cnt").alias("cnt_b")
    )
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "pair_cnt",
            "cnt_a",
            "cnt_b",
            F.floor(
                F.col("pair_cnt") * F.lit(1000000.0) / F.col("n_baskets")
            )
            .cast("long")
            .alias("support_ppm"),
            F.floor(F.col("pair_cnt") * F.lit(1000000.0) / F.col("cnt_a"))
            .cast("long")
            .alias("confidence_a_to_b_ppm"),
            # count-product lanes wide (round-10 overflow audit): the
            # int64 products pair_cnt·n_baskets and cnt_a·cnt_b die at
            # ~3e9 baskets; decimal keeps them exact, one cast to
            # DOUBLE preserves the old values below that cliff
            F.floor(
                (F.col("pair_cnt").cast("decimal(38,0)") * F.col("n_baskets"))
                .cast("double")
                * F.lit(1000.0)
                / (F.col("cnt_a").cast("decimal(38,0)") * F.col("cnt_b")).cast(
                    "double"
                )
            )
            .cast("long")
            .alias("lift_milli"),
        )
        .orderBy(F.col("pair_cnt").desc(), "item_a", "item_b")
        .limit(50)
    )


_JACCARD_SQL = (
    _BASKET_CTES
    + """
SELECT p.item_a, p.item_b, p.pair_cnt,
       CAST(ca.cnt + cb.cnt - p.pair_cnt AS BIGINT) AS union_cnt,
       CAST(FLOOR(p.pair_cnt * 1000.0 / (ca.cnt + cb.cnt - p.pair_cnt))
            AS BIGINT) AS jaccard_milli
FROM pairs p
JOIN item_cnt ca ON ca.item = p.item_a
JOIN item_cnt cb ON cb.item = p.item_b
WHERE p.pair_cnt >= 2
ORDER BY jaccard_milli DESC, p.item_a, p.item_b
LIMIT 50
"""
)


@query(
    "rec_copurchase_jaccard",
    oracle=_JACCARD_SQL,
    tags=("recsys", "join", "agg"),
)
def rec_copurchase_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item basket similarity: Jaccard overlap of the basket sets
    of every co-purchased part pair (intersection from the pair count,
    union by inclusion-exclusion from the two item counts — no second
    pass over the data). ``pair_cnt >= 2`` drops one-off
    coincidences, the noise floor of collaborative filtering; top-50
    by similarity with a total-order tie-break.

    Shares the capped-basket pair expansion with
    ``rec_market_basket`` — same equi-join scale shape and the same
    single-scan materialization."""
    pairs, item_cnt, _nb = _pair_counts(_kept_items(spark, sf_dir))
    ca = item_cnt.select(
        F.col("item").alias("item_a"), F.col("cnt").alias("cnt_a")
    )
    cb = item_cnt.select(
        F.col("item").alias("item_b"), F.col("cnt").alias("cnt_b")
    )
    union_cnt = F.col("cnt_a") + F.col("cnt_b") - F.col("pair_cnt")
    return (
        pairs.where(F.col("pair_cnt") >= 2)
        .join(ca, "item_a")
        .join(cb, "item_b")
        .select(
            "item_a",
            "item_b",
            "pair_cnt",
            union_cnt.cast("long").alias("union_cnt"),
            F.floor(F.col("pair_cnt") * F.lit(1000.0) / union_cnt)
            .cast("long")
            .alias("jaccard_milli"),
        )
        .orderBy(F.col("jaccard_milli").desc(), "item_a", "item_b")
        .limit(50)
    )
