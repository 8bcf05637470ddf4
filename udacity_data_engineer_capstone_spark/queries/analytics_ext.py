"""Second analytics wave: grouping sets, distribution windows, full-outer
joins, datetime/string scalar breadth, bivariate statistics, and range
frames (SURVEY §2.8 categories the reference lacks entirely).

Cross-engine determinism rules used throughout (see MEMORY/SCALE.md):
integer-valued sums are exact in any fold order; correlation/stddev are
rounded on both sides; window orderings extend to total orders unless
the frame is tie-insensitive (RANGE frames include peers, so their
aggregates are deterministic even with duplicate sort keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table, register_views
from udacity_data_engineer_capstone_spark.operators.ordinal import (
    composite_bucket_key,
    global_cum,
    global_row_number,
    ntile_from_rank,
)
from udacity_data_engineer_capstone_spark.registry import query

# ---------------------------------------------------------------------------
# grouping sets
# ---------------------------------------------------------------------------

# same SQL text runs in both engines: Spark's grouping_id() equals
# DuckDB's GROUPING(a, b) bit mask (first grouping column = MSB)
_GROUPING_SETS_BODY = """
SELECT l_returnflag, l_linestatus,
       {gid} AS gid,
       SUM(l_quantity) AS sum_qty,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@query(
    "agg_grouping_sets",
    oracle=_GROUPING_SETS_BODY.format(gid="GROUPING(l_returnflag, l_linestatus)"),
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with a grouping_id disambiguator (NULL as
    data vs NULL as subtotal). Plans as one Expand + a single shuffle —
    not one job per set."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_GROUPING_SETS_BODY.format(gid="grouping_id()"))


# ---------------------------------------------------------------------------
# distribution windows: ntile / percent_rank / cume_dist / lead
# ---------------------------------------------------------------------------

_NTILE_ORACLE = """
SELECT c_custkey, c_nationkey,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume,
       lead(c_custkey) OVER w AS next_cust
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
"""


@query("win_ntile_dist", oracle=_NTILE_ORACLE, tags=("window",))
def win_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions per nation. The ORDER BY extends to
    a total order (custkey tiebreak) so ntile/lead are deterministic;
    percent_rank/cume_dist are exact rational values — identical doubles
    in both engines."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.lead("c_custkey").over(w).alias("next_cust"),
    )


# ---------------------------------------------------------------------------
# full outer join
# ---------------------------------------------------------------------------

_FULL_OUTER_ORACLE = """
WITH ocnt AS (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
)
SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
       c.c_mktsegment AS segment,
       o.n_orders,
       (c.c_custkey IS NULL) AS customer_missing,
       (o.o_custkey IS NULL) AS orders_missing
FROM customer c
FULL OUTER JOIN ocnt o ON o.o_custkey = c.c_custkey
"""


@query("join_full_outer", oracle=_FULL_OUTER_ORACLE, tags=("join",))
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with coalesced key + per-side missing indicators
    (the reconciliation-report shape). Full outer cannot broadcast —
    both sides shuffle on the key, which is the correct plan at any
    scale."""
    customer = load_table(spark, sf_dir, "customer").alias("c")
    ocnt = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .alias("o")
    )
    return customer.join(
        ocnt, F.col("o.o_custkey") == F.col("c.c_custkey"), "full_outer"
    ).select(
        F.coalesce("c.c_custkey", "o.o_custkey").alias("custkey"),
        F.col("c.c_mktsegment").alias("segment"),
        "o.n_orders",
        F.col("c.c_custkey").isNull().alias("customer_missing"),
        F.col("o.o_custkey").isNull().alias("orders_missing"),
    )


# ---------------------------------------------------------------------------
# datetime scalar breadth
# ---------------------------------------------------------------------------

_DATETIME_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(year(l_shipdate) AS INT) AS y,
       CAST(quarter(l_shipdate) AS INT) AS q,
       CAST(month(l_shipdate) AS INT) AS m,
       CAST(dayofmonth(l_shipdate) AS INT) AS dom,
       CAST(dayofweek(l_shipdate) + 1 AS INT) AS dow,
       CAST(date_trunc('month', l_shipdate) AS DATE) AS month_start,
       CAST(l_shipdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
       last_day(l_shipdate) AS month_end,
       CAST(datediff('day', DATE '1995-01-01', l_shipdate) AS INT) AS days_since,
       strftime(l_shipdate, '%Y-%m') AS ym
FROM lineitem
"""


@query("fn_datetime", oracle=_DATETIME_ORACLE, tags=("scalar", "datetime"))
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar surface: extraction, truncation, month arithmetic
    (end-of-month clamping matches DuckDB's interval add), day diffs,
    and formatting. DuckDB's dayofweek is 0-based Sunday vs Spark's
    1-based — the oracle adds 1."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.year(d).alias("y"),
        F.quarter(d).alias("q"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("dom"),
        F.dayofweek(d).alias("dow"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.add_months(d, 2).alias("plus2m"),
        F.last_day(d).alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


# ---------------------------------------------------------------------------
# bivariate statistics
# ---------------------------------------------------------------------------

_CORR_ORACLE = """
SELECT o_orderpriority,
       ROUND(corr(o_totalprice, o_custkey), 6) AS price_cust_corr,
       ROUND(stddev_samp(o_totalprice), 2) AS sd_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


@query("agg_corr_stddev", oracle=_CORR_ORACLE, tags=("agg", "stats"))
def agg_corr_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample stddev per group, rounded on both
    sides (double folds differ between engines in the last ulps; corr is
    O(1)-magnitude so 6 decimals is safe, stddev ~1e5 gets 2)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("price_cust_corr"),
        F.round(F.stddev_samp("o_totalprice"), 2).alias("sd_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# string distance
# ---------------------------------------------------------------------------

_LEV_ORACLE = """
SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist,
       CAST(length(a.p_name) AS INT) AS a_len
FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
"""


@query("fn_levenshtein", oracle=_LEV_ORACLE, tags=("scalar", "string"))
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance between consecutive part names — the fuzzy-matching
    scalar (identical dynamic-programming semantics in both engines).
    At scale this shape is a self-equi-join on adjacent keys, not a
    cross join."""
    part = load_table(spark, sf_dir, "part")
    a = part.alias("a")
    b = part.alias("b")
    return a.join(b, F.col("b.p_partkey") == F.col("a.p_partkey") + 1).select(
        F.col("a.p_partkey").alias("a_key"),
        F.col("b.p_partkey").alias("b_key"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("edit_dist"),
        F.length(F.col("a.p_name")).alias("a_len"),
    )


# ---------------------------------------------------------------------------
# RANGE window frame
# ---------------------------------------------------------------------------

_RANGE_ORACLE = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       COUNT(*) OVER w AS n_in_band,
       CAST(SUM(o_custkey) OVER w AS BIGINT) AS custkey_sum
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
             RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
"""


@query("win_range_frame", oracle=_RANGE_ORACLE, tags=("window",))
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-RANGE frame (all orders within $1000 below the current
    price). RANGE frames include peer rows, so the aggregates are
    deterministic even though o_totalprice alone is not a total order;
    the summed column is integer-valued, hence fold-order exact."""
    orders = load_table(spark, sf_dir, "orders")
    # SQL frame spec: PySpark's rangeBetween() accepts only integer
    # offsets, but the SQL dialect takes any numeric literal
    frame = (
        "OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice "
        "RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)"
    )
    return orders.selectExpr(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        f"COUNT(*) {frame} AS n_in_band",
        f"SUM(o_custkey) {frame} AS custkey_sum",
    )


# ---------------------------------------------------------------------------
# exact weighted median (cumulative-weight crossing)
# ---------------------------------------------------------------------------

# Shared SQL text. Ordering ties inside one value-block cannot move the
# crossing value (the block's cumulative total is order-free), and the
# weights sum in exact decimal, so the result is deterministic at any
# parallelism.
_WMEDIAN_SQL = """
WITH w AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
         CAST(l_quantity AS BIGINT) AS wt
  FROM lineitem
),
c AS (
  SELECT l_returnflag, v, wt,
         SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY v, wt
                       ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(wt) OVER (PARTITION BY l_returnflag) AS tot
  FROM w
)
SELECT l_returnflag,
       CAST(MIN(v) AS DOUBLE) AS weighted_median_price
FROM c
WHERE cum * 2 >= tot
GROUP BY l_returnflag
"""


@query("agg_weighted_median", oracle=_WMEDIAN_SQL, tags=("agg", "stats"))
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median price per return flag — the
    robust-statistics sibling of percentile_cont that none of the
    built-in aggregates cover (approx_percentile has no weights). One
    sort-window pass accumulates weights; the median is the smallest
    value whose cumulative weight crosses half the total. Weights sum
    in exact integers, so the crossing point is deterministic; the sort
    is per-group (RangePartitioning on the window key), never global."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_WMEDIAN_SQL)


# ---------------------------------------------------------------------------
# pivot -> unpivot round-trip
# ---------------------------------------------------------------------------

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

# The oracle is the LONG form computed directly — the pivot/unpivot pair
# must be the identity on it (absent combinations never materialize:
# unpivoted NULL cells are filtered, matching the long-form group-by).
_UNPIVOT_ORACLE = """
SELECT c_nationkey, c_mktsegment AS segment,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
GROUP BY c_nationkey, c_mktsegment
"""


@query("agg_unpivot_roundtrip", oracle=_UNPIVOT_ORACLE, tags=("agg",))
def agg_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping via Spark's native ``unpivot`` (ANSI UNPIVOT
    semantics), proven as the exact inverse of a ``pivot``: per-nation
    account balances pivot into one column per market segment and
    unpivot back to (nation, segment, total) rows equal to the direct
    long-form aggregate. The pivot list is explicit (never inferred via
    a distinct scan), so the plan is a single aggregate with a fixed
    column fan-out — the reshape itself is map-side metadata, no extra
    shuffle."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    wide = (
        cust.groupBy("c_nationkey")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.sum("bal"))
    )
    return (
        wide.unpivot(
            ids=["c_nationkey"],
            values=_SEGMENTS,
            variableColumnName="segment",
            valueColumnName="total_dec",
        )
        .filter(F.col("total_dec").isNotNull())
        .select(
            "c_nationkey",
            "segment",
            F.col("total_dec").cast("double").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# relative-rank windows: percent_rank + cume_dist
# ---------------------------------------------------------------------------

_PCTRANK_ORACLE = """
SELECT o_orderkey,
       o_orderpriority,
       o_totalprice,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


@query("win_percent_rank_cume", oracle=_PCTRANK_ORACLE, tags=("window",))
def win_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing windows: percent_rank ((rank-1)/(n-1)) and
    cume_dist per order priority. The ordering key (price, orderkey) is
    total, so ranks are tie-free and both ratios are the same exact
    integer division in either engine — correctly-rounded IEEE doubles,
    hash-stable. One window pass partitioned by priority."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# ---------------------------------------------------------------------------
# percentile-threshold banding (the scale path past global ntile)
# ---------------------------------------------------------------------------

# Global ntile sorts the whole table in ONE partition; at extreme
# cardinality the scalable shape is: compute the three quartile cut
# VALUES (discrete quantiles at ranks ceil(n*q) — exact integers, no
# interpolation arithmetic to disagree on), broadcast them, and band by
# comparison. Shared SQL text.
_BANDS_SQL = """
WITH metrics AS (
  SELECT user_id,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT cents, row_number() OVER (ORDER BY cents, user_id) AS r,
         COUNT(*) OVER () AS n
  FROM metrics
),
cuts AS (
  SELECT MAX(CASE WHEN r * 4 <= n THEN cents END) AS q1,
         MAX(CASE WHEN r * 2 <= n THEN cents END) AS q2,
         MAX(CASE WHEN r * 4 <= n * 3 THEN cents END) AS q3
  FROM ranked
)
SELECT m.user_id, m.cents,
       CAST(CASE WHEN m.cents <= c.q1 THEN 1
                 WHEN m.cents <= c.q2 THEN 2
                 WHEN m.cents <= c.q3 THEN 3
                 ELSE 4 END AS INT) AS band,
       c.q1, c.q2, c.q3
FROM metrics m CROSS JOIN cuts c
"""


@query("agg_percentile_threshold_bands", oracle=_BANDS_SQL, tags=("agg", "window"))
def agg_percentile_threshold_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile banding via broadcast threshold values instead of a
    global ntile — the shape that survives when the banded table is too
    big to sort in one partition: cut values come from the two-phase
    exact global ordinal (``operators.ordinal.global_row_number`` —
    this op used to DEMONSTRATE the scale path while computing its own
    cut ranks in a single-partition window; now it practices it), then
    banding is a map-only comparison against the broadcast 1-row cuts.
    Discrete quantiles (value at rank ⌈n·q⌉) keep every number an
    exact integer."""
    ev = load_table(spark, sf_dir, "events")
    metrics = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("cents")
    )
    ranked, n = global_row_number(
        metrics,
        [F.col("cents"), F.col("user_id")],
        composite_bucket_key(F.col("cents"), F.col("user_id")),
        out="r",
    )
    cuts = ranked.agg(
        F.max(F.when(F.col("r") * 4 <= F.lit(n), F.col("cents"))).alias("q1"),
        F.max(F.when(F.col("r") * 2 <= F.lit(n), F.col("cents"))).alias("q2"),
        F.max(F.when(F.col("r") * 4 <= F.lit(3 * n), F.col("cents"))).alias(
            "q3"
        ),
    )
    return ranked.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        "cents",
        F.when(F.col("cents") <= F.col("q1"), 1)
        .when(F.col("cents") <= F.col("q2"), 2)
        .when(F.col("cents") <= F.col("q3"), 3)
        .otherwise(4)
        .cast("int")
        .alias("band"),
        "q1",
        "q2",
        "q3",
    )


# ---------------------------------------------------------------------------
# rolling OLS slope (windowed trend detection)
# ---------------------------------------------------------------------------

# Rolling least-squares slope of value-cents against the event index
# over the trailing 16 events per user. All five windowed moments are
# int64-exact (x = position index ≤ stream length, y = cents), and the
# slope is one fixed IEEE expression — engine-invariant. NULL where the
# trailing variance is zero or the window is a single row.
# The quadratic window lanes (x², x·y and the centering products) run
# in the DECIMAL(38,0)↔HUGEINT wide pair: x is the per-user row number,
# so a hot user with ~1e10 events puts a single x² ≈ 1e20 past int64
# before any summation (round-11 Σ-square audit).


def _rollreg_sql(wide: str) -> str:
    return f"""
WITH seq AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS y,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS x
  FROM events
),
moments AS (
  SELECT user_id, ts, event_id, x, y,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(y) OVER w AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS {wide}) * x) OVER w AS {wide}) AS sxx,
         CAST(SUM(CAST(x AS {wide}) * y) OVER w AS {wide}) AS sxy
  FROM seq
  WINDOW w AS (PARTITION BY user_id ORDER BY x
               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
)
SELECT user_id, ts, event_id, y,
       CASE WHEN n > 1 AND CAST(n AS {wide}) * sxx - CAST(sx AS {wide}) * sx > 0
            THEN CAST(CAST(n AS {wide}) * sxy
                      - CAST(sx AS {wide}) * sy AS DOUBLE)
                 / CAST(CAST(n AS {wide}) * sxx
                        - CAST(sx AS {wide}) * sx AS DOUBLE)
            END AS slope_cents_per_step
FROM moments
"""


@query(
    "win_rolling_regression", oracle=_rollreg_sql("HUGEINT"), tags=("window", "stats")
)
def win_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling OLS slope of spend over the trailing 16 events —
    the windowed trend detector behind 'is this account ramping up'.
    One window pass per user carrying five integer moments; the slope
    is a single division of exact wide-integer expressions (the x², x·y
    and centering lanes run DECIMAL(38,0)↔HUGEINT), so both engines
    emit identical doubles. Shared SQL text shape."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_rollreg_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# column profiling (the warehouse "describe" audit)
# ---------------------------------------------------------------------------

_PROFILE_SQL = """
SELECT 'o_orderkey' AS col,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
FROM orders
UNION ALL
SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)
FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)
FROM orders
"""


@query("agg_null_profile", oracle=_PROFILE_SQL, tags=("agg", "quality"))
def agg_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the orders table (count / nulls / distinct per
    column) — the automated 'describe' audit a warehouse publishes per
    load. Expressed as one aggregate per column unioned together;
    Catalyst collapses the scans and each aggregate is partial+final.
    At very wide tables you'd do one pass with approx_count_distinct
    per column instead — exact distincts here keep the oracle strict."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_PROFILE_SQL)


# ---------------------------------------------------------------------------
# model-score decile gains / lift table
# ---------------------------------------------------------------------------

# The classic campaign-targeting artifact: rank users by a model score
# (here: engagement count as the predictor), cut into score deciles, and
# report per-decile response rate, cumulative capture, and lift vs the
# base rate. All ratios are EXACT integer ppm via the same two-step
# division on both engines (rate first — bounded 1e6 — then scaled by
# totals), so no int64 headroom issue below ~9e12 users and the hash
# gate is safe.
_LIFT_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type IN ('click', 'view')
                       THEN 1 ELSE 0 END) AS BIGINT) AS score,
         CAST(MAX(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS responded
  FROM events GROUP BY user_id
),
d AS (
  SELECT score, responded,
         ntile(10) OVER (ORDER BY score DESC, user_id) AS decile
  FROM u
),
per AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(responded) AS BIGINT) AS n_responders
  FROM d GROUP BY decile
),
tot AS (
  SELECT CAST(SUM(n_users) AS BIGINT) AS tu,
         CAST(SUM(n_responders) AS BIGINT) AS tr
  FROM per
)
SELECT CAST(decile AS INT) AS decile, n_users, n_responders,
       CAST(n_responders * 1000000 // n_users AS BIGINT) AS response_ppm,
       CAST(CAST(SUM(n_responders) OVER (ORDER BY decile) AS BIGINT)
            * 1000000 // tr AS BIGINT) AS cum_capture_ppm,
       CAST((n_responders * 1000000 // n_users) * tu // (tr * 1000000)
            * 1000000
            + ((n_responders * 1000000 // n_users) * tu % (tr * 1000000))
              * 1000000 // (tr * 1000000) AS BIGINT) AS lift_ppm
FROM per, tot
"""


@query("agg_decile_lift", oracle=_LIFT_ORACLE, tags=("agg", "analytics"))
def agg_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains table: users ranked by engagement score, cut into
    ntile(10) deciles (deterministic tie-break on user_id), with exact
    integer-ppm response rate, cumulative responder capture, and lift
    vs the overall base rate.

    Scale shape: per-user scoring is a partial+final hash aggregate;
    the global ntile is the two-phase exact ordinal
    (``operators.ordinal.global_row_number``) with the decile derived
    from (rank, driver-known n) by ``ntile_from_rank`` — identical
    tiles to ``ntile(10) OVER (ORDER BY ...)``, no single-partition
    window. Engagement scores are small integers with heavy ties, so
    the bucket key folds user_id in (``composite_bucket_key``) to keep
    the within-bucket sorts parallel. Decile totals and the running
    capture run on a constant 10-row frame (audited allowlist)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0)
        )
        .cast("long")
        .alias("score"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("responded"),
    )
    ranked, n = global_row_number(
        u,
        [F.col("score").desc(), F.col("user_id")],
        composite_bucket_key(-F.col("score"), F.col("user_id")),
        out="urk",
    )
    d = ranked.select(
        "score",
        "responded",
        ntile_from_rank(F.col("urk"), n, 10).alias("decile"),
    )
    per = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("responded").cast("long").alias("n_responders"),
    )
    tot = per.agg(
        F.sum("n_users").cast("long").alias("tu"),
        F.sum("n_responders").cast("long").alias("tr"),
    )
    w = Window.orderBy("decile")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_users",
            "n_responders",
            F.expr("CAST(n_responders * 1000000 DIV n_users AS BIGINT)").alias(
                "response_ppm"
            ),
            F.expr(
                "CAST(CAST(SUM(n_responders) OVER (ORDER BY decile) AS BIGINT)"
                " * 1000000 DIV tr AS BIGINT)"
            ).alias("cum_capture_ppm"),
            F.expr(
                "CAST((n_responders * 1000000 DIV n_users) * tu DIV (tr * 1000000)"
                " * 1000000"
                " + ((n_responders * 1000000 DIV n_users) * tu % (tr * 1000000))"
                "   * 1000000 DIV (tr * 1000000) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# ratio-to-report window: share of group
# ---------------------------------------------------------------------------

_SHARE_SQL = """
WITH rev AS (
  SELECT n.n_regionkey AS regionkey, c.c_nationkey AS nationkey,
         CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS nation_cents
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_regionkey, c.c_nationkey
)
SELECT regionkey, nationkey, nation_cents,
       CAST(SUM(nation_cents) OVER (PARTITION BY regionkey) AS BIGINT)
         AS region_cents,
       CAST(floor(CAST(nation_cents AS DOUBLE) * 1000000
            / SUM(nation_cents) OVER (PARTITION BY regionkey)) AS BIGINT)
         AS share_ppm,
       CAST(RANK() OVER (PARTITION BY regionkey
                         ORDER BY nation_cents DESC, nationkey) AS INT)
         AS rank_in_region
FROM rev
"""


@query("win_share_of_group", oracle=_SHARE_SQL, tags=("window", "agg"))
def win_share_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue share (ppm) and rank
    inside its region — the windowed 'percent of total' every BI layer
    asks for. One aggregate down to nations, then partition-total
    windows over the 25-row frame; integer-cent lanes, with the share
    division done as a single floor(double) (integer `/` semantics
    differ between the engines: DuckDB CASTs doubles by rounding,
    Spark by truncation — floor() spells the same thing in both).

    Scale shape: the only corpus-sized stage is the orders aggregate;
    windows run over dimension-bounded frames at any data size."""
    register_views(spark, sf_dir, ("customer", "orders", "nation"))
    return spark.sql(_SHARE_SQL)


# ---------------------------------------------------------------------------
# Pareto coverage: how concentrated is revenue within each nation?
# ---------------------------------------------------------------------------

_PARETO_SQL = """
WITH rev AS (
  SELECT c.c_nationkey AS nationkey, c.c_custkey AS custkey,
         CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey, c.c_custkey
),
ranked AS (
  SELECT nationkey, custkey, cents,
         ROW_NUMBER() OVER (PARTITION BY nationkey
                            ORDER BY cents DESC, custkey) AS rk,
         SUM(cents) OVER (PARTITION BY nationkey
                          ORDER BY cents DESC, custkey
                          ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cents) OVER (PARTITION BY nationkey) AS tot,
         COUNT(*) OVER (PARTITION BY nationkey) AS n_cust
  FROM rev
)
SELECT nationkey,
       CAST(MAX(n_cust) AS BIGINT) AS n_customers,
       CAST(MAX(tot) AS BIGINT) AS total_cents,
       CAST(MIN(CASE WHEN cum * 5 >= tot * 4 THEN rk END) AS BIGINT)
         AS n_for_80pct,
       CAST(floor(CAST(MIN(CASE WHEN cum * 5 >= tot * 4 THEN rk END)
                        AS DOUBLE) * 1000000 / MAX(n_cust)) AS BIGINT)
         AS concentration_ppm
FROM ranked
GROUP BY nationkey
"""


@query("agg_pareto_coverage", oracle=_PARETO_SQL, tags=("agg", "window"))
def agg_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto 80/20 report per nation: the minimum number of customers
    whose (descending) revenue covers 80% of the nation's total, and
    that head's share of the customer base (ppm) — the concentration
    readout a capacity/risk planner reads before an optimizer trusts
    per-key statistics (high concentration = skew; cf.
    ``stat_join_skew_diag``, which diagnoses the same property on join
    keys).

    All decision lanes exact integers: the 80% test is
    ``cum*5 >= tot*4`` (no floats anywhere); only the final reporting
    ratio is a floor(double) (cast semantics differ between engines on
    bare integer division). Scale shape: one corpus aggregate to
    (nation, customer), ranking windows partitioned by nation, then a
    25-row fold."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_PARETO_SQL)


# ---------------------------------------------------------------------------
# top-N per group with an OTHERS rollup row
# ---------------------------------------------------------------------------

_TOPN_OTHERS_N = 2

_TOPN_OTHERS_SQL = f"""
WITH rev AS (
  SELECT n.n_regionkey AS regionkey, n.n_name AS nation,
         CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_regionkey, n.n_name
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY regionkey
                               ORDER BY cents DESC, nation) AS rk
  FROM rev
)
SELECT regionkey,
       CASE WHEN rk <= {_TOPN_OTHERS_N} THEN nation ELSE 'OTHERS' END
         AS nation_bucket,
       CAST(SUM(cents) AS BIGINT) AS cents,
       CAST(COUNT(*) AS BIGINT) AS n_nations,
       MIN(rk) <= {_TOPN_OTHERS_N} AS is_top
FROM ranked
GROUP BY regionkey,
         CASE WHEN rk <= {_TOPN_OTHERS_N} THEN nation ELSE 'OTHERS' END
"""


@query("agg_topn_plus_others", oracle=_TOPN_OTHERS_SQL, tags=("agg", "window"))
def agg_topn_plus_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{n} nations per region with everything else rolled into one
    OTHERS row — the chart-ready shape every BI 'top categories' visual
    wants (a bare top-k silently drops the tail mass; the OTHERS row
    keeps totals honest). Rank window partitioned by region, then a
    second small aggregate over the bucketed label.

    Scale shape: corpus work is the orders aggregate; the rank and the
    rollup run on dimension-bounded frames (WindowGroupLimit prunes
    nothing here because OTHERS needs every row — the tail mass is the
    point).""".replace("{n}", str(_TOPN_OTHERS_N))
    register_views(spark, sf_dir, ("customer", "orders", "nation"))
    return spark.sql(_TOPN_OTHERS_SQL)


# ---------------------------------------------------------------------------
# skyline (Pareto frontier): cheapest part for every size level
# ---------------------------------------------------------------------------

# A part is on the (min price, max size) skyline iff no other part is
# both <= price and >= size with one strict. Window formulation: order
# by price; a row survives iff its size beats the running max size of
# all STRICTLY cheaper rows (integer-cents RANGE frame), and it is the
# best-size (tie-broken) representative of its exact price point.
_SKYLINE_SQL = """
WITH pts AS (
  SELECT p_partkey,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part
),
w AS (
  SELECT p_partkey, price_cents, size,
         MAX(size) OVER (ORDER BY price_cents
                         RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_cheaper_size,
         ROW_NUMBER() OVER (PARTITION BY price_cents
                            ORDER BY size DESC, p_partkey) AS price_rank
  FROM pts
)
SELECT p_partkey, price_cents, size
FROM w
WHERE price_rank = 1
  AND (best_cheaper_size IS NULL OR size > best_cheaper_size)
ORDER BY price_cents
"""


@query("agg_skyline_pareto", oracle=_SKYLINE_SQL, tags=("agg", "analytics"))
def agg_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query over (price ↓, size ↑): the
    parts no purchaser can strictly improve on — the multi-criteria
    shortlist behind 'best camera under every budget' product pages
    and trade-off dashboards. A per-price-point reduction plus one
    exact running max replace the naive O(n²) dominance self-join.

    Scale shape: the per-price representative is a PARTITIONED window
    (never global); the strictly-cheaper running max runs on the
    distinct-price frame via the two-phase exact cumulative
    (``operators.ordinal.global_cum``, max, exclusive) — no
    single-partition window even with a wide price domain. For d > 2
    criteria, pre-partition by one dimension's bands and merge band
    frontiers."""
    pts = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + 0.5)
        .cast("long")
        .alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    rep = (
        pts.withColumn(
            "price_rank",
            F.row_number().over(
                Window.partitionBy("price_cents").orderBy(
                    F.col("size").desc(), F.col("p_partkey")
                )
            ),
        )
        .where(F.col("price_rank") == 1)
        .drop("price_rank")
    )
    pp = pts.groupBy("price_cents").agg(F.max("size").alias("msize"))
    best = global_cum(
        pp,
        [F.col("price_cents")],
        F.col("price_cents"),
        F.col("msize"),
        agg="max",
        inclusive=False,
        out="best_cheaper_size",
    ).select("price_cents", "best_cheaper_size")
    return (
        rep.join(best, "price_cents")
        .where(
            F.col("best_cheaper_size").isNull()
            | (F.col("size") > F.col("best_cheaper_size"))
        )
        .select("p_partkey", "price_cents", "size")
    )
