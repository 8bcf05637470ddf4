"""Analytics surface beyond the reference (SURVEY §2.8 lists these
categories as absent there): window functions, sorts/limits/top-k, set
operations, pivot/rollup/cube, distinct counting, semi/anti joins, as-of
and range joins, and scalar math/array/map functions.

A complete engine needs these for real workloads; each is registered
with a DuckDB oracle. Orderings inside window frames always extend to a
*total* order (tie-break on unique keys) so Spark and DuckDB agree
row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table, register_views
from udacity_data_engineer_capstone_spark.registry import query

# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------

_RANK_ORACLE = """
WITH rev AS (
  SELECT c.c_nationkey AS nationkey, c.c_custkey AS custkey,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT nationkey, custkey, revenue_cents, CAST(rnk AS INT) AS rnk
FROM (SELECT *, rank() OVER (PARTITION BY nationkey
                             ORDER BY revenue_cents DESC, custkey) AS rnk
      FROM rev)
WHERE rnk <= 3
"""


@query("win_rank_topk", oracle=_RANK_ORACLE, tags=("window",))
def win_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by revenue per nation — ranking window after an
    aggregate. The rank filter is pushed below the final sort by Spark's
    window-group-limit optimization, so only ~3 rows per partition
    survive the shuffle at any scale. Revenue is exact BIGINT integer
    cents (round(price*100)) — fold-order-independent, and no DECIMAL
    reaches the output (driver decimal hashing proved unstable r2/r3)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rev = (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_custkey").alias("custkey"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("revenue_cents")
        )
    )
    w = Window.partitionBy("nationkey").orderBy(
        F.col("revenue_cents").desc(), F.col("custkey")
    )
    return rev.withColumn("rnk", F.rank().over(w)).filter(F.col("rnk") <= 3)


_RUNNING_ORACLE = """
SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
       SUM(l_quantity) OVER (PARTITION BY l_suppkey
                             ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                      l_partkey
                             ROWS UNBOUNDED PRECEDING) AS running_qty,
       lag(l_quantity) OVER (PARTITION BY l_suppkey
                             ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                      l_partkey)
         AS prev_qty
FROM lineitem
"""


@query("win_running_frame", oracle=_RUNNING_ORACLE, tags=("window",))
def win_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit ROWS frame + lag — analytic windows
    over a total order. The tie-break includes l_partkey because
    (orderkey, linenumber) is NOT unique in this testdata (sf0.1 carries
    a duplicated line number within one order, caught by the full sf0.1
    oracle sweep) — without a total order, lag()/ROWS frames are
    engine-dependent on the tied rows."""
    li = load_table(spark, sf_dir, "lineitem")
    order = [
        F.col("l_shipdate"),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.col("l_partkey"),
    ]
    w = Window.partitionBy("l_suppkey").orderBy(*order)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.sum("l_quantity")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("running_qty"),
        F.lag("l_quantity").over(w).alias("prev_qty"),
    )


# ---------------------------------------------------------------------------
# sort / limit / top-k
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@query("ord_global_topk", oracle=_TOPK_ORACLE, tags=("sort",))
def ord_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: sort + limit compiles to TakeOrderedAndProject —
    each partition keeps k rows, the driver merges k·partitions rows;
    no full sort ever happens, at any scale."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------

_SETOPS_ORACLE = """
SELECT 'building_or_machinery' AS op, c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
)
UNION ALL
SELECT 'with_orders_intersect' AS op, c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT o_custkey FROM orders
)
UNION ALL
SELECT 'no_orders_except' AS op, c_custkey FROM (
  SELECT c_custkey FROM customer
  EXCEPT
  SELECT o_custkey FROM orders
)
"""


@query("set_union_intersect_except", oracle=_SETOPS_ORACLE, tags=("setop",))
def set_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct), INTERSECT, EXCEPT in one result, tagged by op.
    INTERSECT/EXCEPT plan as left-semi/left-anti hash joins."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = customer.filter("c_mktsegment = 'BUILDING'").select("c_custkey")
    machinery = customer.filter("c_mktsegment = 'MACHINERY'").select("c_custkey")
    order_cust = orders.select(F.col("o_custkey").alias("c_custkey"))

    u = building.union(machinery).distinct().select(
        F.lit("building_or_machinery").alias("op"), "c_custkey"
    )
    i = building.intersect(order_cust).select(
        F.lit("with_orders_intersect").alias("op"), "c_custkey"
    )
    # subtract = distinct EXCEPT (exceptAll().distinct() would diverge
    # when the left side has a row more times than the right)
    e = customer.select("c_custkey").subtract(order_cust).select(
        F.lit("no_orders_except").alias("op"), "c_custkey"
    )
    return u.unionAll(i).unionAll(e)


# ---------------------------------------------------------------------------
# pivot / rollup / cube
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT l_returnflag,
       SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O,
       SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_pivot", oracle=_PIVOT_ORACLE, tags=("agg",))
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on line status (explicit value list ⇒ single-pass plan, no
    distinct-values pre-query)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
    )


_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty, COUNT(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("agg_rollup", oracle=_ROLLUP_ORACLE, tags=("agg",))
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total in one pass —
    Expand + single shuffle, not one job per level)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_items"))
    )


_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_price_cents
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("agg_cube", oracle=_CUBE_ORACLE, tags=("agg",))
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets in one pass).
    Price sum in exact BIGINT integer cents — no DECIMAL in the output."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .alias("sum_price_cents")
        )
    )


# ---------------------------------------------------------------------------
# distinct counting
# ---------------------------------------------------------------------------

_DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_distinct_count", oracle=_DISTINCT_ORACLE, tags=("agg",))
def agg_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counts (Expand-based plan: one shuffle
    for both distinct columns)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_APPROX_DISTINCT_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts_exact,
       TRUE AS approx_within_5pct
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_approx_distinct", oracle=_APPROX_DISTINCT_ORACLE, tags=("agg", "approx"))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB path where exact
    distinct is too expensive (fixed-size sketch per group, mergeable
    map-side). HLL values are engine-specific, so the *checkable*
    output is the exact count plus a sketch-error bound: the oracle
    computes the exact side and TRUE literals, turning an
    approximate-by-design op into a real driver hash row."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("n_parts_exact"),
            F.approx_count_distinct("l_partkey", 0.02).alias("n_approx"),
        )
        .select(
            "l_returnflag",
            "n_parts_exact",
            (
                F.abs(F.col("n_approx") - F.col("n_parts_exact"))
                <= 0.05 * F.col("n_parts_exact")
            ).alias("approx_within_5pct"),
        )
    )


_ARGMAX_ORACLE = """
SELECT o_orderpriority,
       arg_max(o_orderkey, o_totalprice) AS biggest_order,
       arg_min(o_orderkey, o_totalprice) AS smallest_order,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderpriority
"""


@query("agg_argminmax", oracle=_ARGMAX_ORACLE, tags=("agg",))
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max/arg-min aggregates (``max_by``/``min_by``) — the
    which-row-was-extreme question answered in one pass, no self-join
    back onto the aggregate."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


_COLLECT_ORACLE = """
SELECT c_mktsegment,
       array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations_csv,
       COUNT(DISTINCT c_nationkey) AS n_nations
FROM customer
GROUP BY c_mktsegment
"""


@query("agg_collect_set", oracle=_COLLECT_ORACLE, tags=("agg",))
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set collection per group (``collect_set``), rendered sorted so the
    result is order-deterministic across engines. At scale collect_set is
    memory-bounded by group cardinality — only safe for low-cardinality
    value domains like these 25 nation keys."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("c_nationkey"))).alias(
                "nations_csv"
            ),
            F.countDistinct("c_nationkey").alias("n_nations"),
        )
    )


# ---------------------------------------------------------------------------
# semi / anti joins
# ---------------------------------------------------------------------------

_SEMI_ANTI_ORACLE = """
SELECT 'has_recent_order' AS op, c_custkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2000-01-01')
UNION ALL
SELECT 'no_order_ever' AS op, c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@query("join_semi_anti", oracle=_SEMI_ANTI_ORACLE, tags=("join",))
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS as left-semi and left-anti hash joins — the
    probe side never duplicates rows, so output ≤ input regardless of
    match multiplicity."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.filter(F.col("o_orderdate") >= "2000-01-01")
    semi = customer.join(
        recent, customer.c_custkey == recent.o_custkey, "left_semi"
    ).select(F.lit("has_recent_order").alias("op"), "c_custkey")
    anti = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select(F.lit("no_order_ever").alias("op"), "c_custkey")
    return semi.unionAll(anti)


# ---------------------------------------------------------------------------
# as-of join & range join
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type,
         max(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_ts
  FROM events
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, last_click_ts
FROM tagged
WHERE event_type = 'purchase'
"""


@query("join_asof_event", oracle=_ASOF_ORACLE, tags=("join", "asof"))
def join_asof_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the most recent *strictly prior*
    click by the same user. Expressed as a running-max window over the
    interleaved event stream — one shuffle on user_id, no range
    self-join, which is the scalable as-of formulation (the naive
    t1 ≤ t2 join is quadratic per user)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = ev.withColumn(
        "last_click_ts",
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
    )
    return tagged.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_click_ts",
    )


_RANGE_ORACLE = """
SELECT a.user_id, COUNT(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
GROUP BY a.user_id
"""


@query("join_range_event", oracle=_RANGE_ORACLE, tags=("join", "range"))
def join_range_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range self-join: pairs of same-user events within 5 minutes.
    The equi-key (user_id) hash-partitions the join; the range predicate
    filters within each user's bucket, so cost is Σ per-user-pairs, not
    n². (For keyless range joins, bucketize time into join keys first.)"""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    a = ev.alias("a")
    b = ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# scalar function sampler (math / string / date / array / map)
# ---------------------------------------------------------------------------

_SCALAR_ORACLE = """
SELECT p_partkey,
       round(sqrt(p_retailprice), 4) AS sqrt_price,
       abs(p_size - 25) AS size_dev,
       upper(substring(p_name, 1, 4)) AS name4,
       CAST(length(p_name) AS INT) AS name_len,
       CAST(greatest(p_size, 10) AS INT) AS size_floor10,
       CAST(floor(p_retailprice / 100) AS BIGINT) AS price_bucket
FROM part
"""


@query("fn_scalar_sampler", oracle=_SCALAR_ORACLE, tags=("scalar",))
def fn_scalar_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math/string scalar sampler — all codegen'd JVM expressions."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.sqrt("p_retailprice"), 4).alias("sqrt_price"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.upper(F.substring("p_name", 1, 4)).alias("name4"),
        F.length("p_name").alias("name_len"),
        F.greatest("p_size", F.lit(10)).alias("size_floor10"),
        F.floor(F.col("p_retailprice") / 100).cast("long").alias("price_bucket"),
    )


_DATEFN_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(dayofweek(o_orderdate) AS INT) + 1 AS dow,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT)
         AS days_since_95,
       strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
"""


@query("fn_date_sampler", oracle=_DATEFN_ORACLE, tags=("scalar", "date"))
def fn_date_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar sampler (DuckDB dayofweek is 0-based Sunday,
    Spark's is 1-based Sunday — the oracle adds 1)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


_ARRAY_ORACLE = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       round(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6)
         AS max_coord,
       round(list_sum(list_transform(embedding,
                                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6)
         AS sq_norm,
       list_contains(list_transform(embedding, x -> CAST(x AS DOUBLE) > 0.4),
                     true) AS has_large
FROM embeddings
"""


@query("fn_array_sampler", oracle=_ARRAY_ORACLE, tags=("scalar", "array"))
def fn_array_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function sampler over the embedding column (size, max,
    element-wise transform + fold, existence predicate)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.expr("array_max(transform(embedding, x -> CAST(x AS DOUBLE)))"), 6
        ).alias("max_coord"),
        F.round(
            F.expr(
                "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * "
                "CAST(x AS DOUBLE)), 0D, (acc, x) -> acc + x)"
            ),
            6,
        ).alias("sq_norm"),
        F.expr("exists(embedding, x -> CAST(x AS DOUBLE) > 0.4)").alias("has_large"),
    )


_ASOF_NEAREST_ORACLE = """
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type,
         max(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS back_ts,
         min(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS fwd_ts
  FROM events
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       CASE
         WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
         WHEN fwd_ts IS NULL THEN back_ts
         WHEN back_ts IS NULL THEN fwd_ts
         WHEN epoch_us(ts) - epoch_us(back_ts)
              <= epoch_us(fwd_ts) - epoch_us(ts) THEN back_ts
         ELSE fwd_ts
       END AS nearest_click_ts,
       CASE
         WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
         WHEN fwd_ts IS NULL THEN 'b'
         WHEN back_ts IS NULL THEN 'f'
         WHEN epoch_us(ts) - epoch_us(back_ts)
              <= epoch_us(fwd_ts) - epoch_us(ts) THEN 'b'
         ELSE 'f'
       END AS direction,
       CASE
         WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
         WHEN fwd_ts IS NULL THEN epoch_us(ts) - epoch_us(back_ts)
         WHEN back_ts IS NULL THEN epoch_us(fwd_ts) - epoch_us(ts)
         WHEN epoch_us(ts) - epoch_us(back_ts)
              <= epoch_us(fwd_ts) - epoch_us(ts)
           THEN epoch_us(ts) - epoch_us(back_ts)
         ELSE epoch_us(fwd_ts) - epoch_us(ts)
       END AS gap_us
FROM tagged
WHERE event_type = 'purchase'
"""


@query("join_asof_nearest", oracle=_ASOF_NEAREST_ORACLE, tags=("join", "asof"))
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof(direction=
    'nearest')``): for every purchase, the temporally closest click by
    the same user — before OR after, ties to the earlier side.

    Same scalable formulation as ``join_asof_event``: one running max
    (backward candidate) and one running min (forward candidate) over
    the interleaved per-user stream, then a pure-projection arbiter on
    exact integer microseconds. One shuffle on user_id, no range
    self-join, per-user sort bounded by user activity — the asymmetric
    window pair is what keeps 'nearest' from becoming the naive
    |t1−t2|-argmin quadratic join at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    tagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.max(click_ts).over(wb).alias("back_ts"),
        F.min(click_ts).over(wf).alias("fwd_ts"),
    )
    back_gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("back_ts"))
    fwd_gap = F.unix_micros(F.col("fwd_ts")) - F.unix_micros(F.col("ts"))
    prefer_back = back_gap <= fwd_gap
    both_null = F.col("back_ts").isNull() & F.col("fwd_ts").isNull()
    return tagged.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(both_null, F.lit(None).cast("timestamp"))
        .when(F.col("fwd_ts").isNull(), F.col("back_ts"))
        .when(F.col("back_ts").isNull(), F.col("fwd_ts"))
        .when(prefer_back, F.col("back_ts"))
        .otherwise(F.col("fwd_ts"))
        .alias("nearest_click_ts"),
        F.when(both_null, F.lit(None).cast("string"))
        .when(F.col("fwd_ts").isNull(), F.lit("b"))
        .when(F.col("back_ts").isNull(), F.lit("f"))
        .when(prefer_back, F.lit("b"))
        .otherwise(F.lit("f"))
        .alias("direction"),
        F.when(both_null, F.lit(None).cast("long"))
        .when(F.col("fwd_ts").isNull(), back_gap)
        .when(F.col("back_ts").isNull(), fwd_gap)
        .when(prefer_back, back_gap)
        .otherwise(fwd_gap)
        .alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# keyset (seek) pagination
# ---------------------------------------------------------------------------

# Cursor = the last row of the previous page in (o_orderdate, o_orderkey)
# order — a constant here, exactly how a real API passes it back.
_PAGE_SIZE = 50
_CURSOR_DATE = "TIMESTAMP '1995-06-01 00:00:00'"
_CURSOR_KEY = 0

_KEYSET_SQL = f"""
SELECT o_orderkey, o_orderdate, o_custkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         AS price_cents
FROM orders
WHERE (o_orderdate > {_CURSOR_DATE})
   OR (o_orderdate = {_CURSOR_DATE} AND o_orderkey > {_CURSOR_KEY})
ORDER BY o_orderdate, o_orderkey
LIMIT {_PAGE_SIZE}
"""


@query("ord_keyset_pagination", oracle=_KEYSET_SQL, tags=("order", "limit"))
def ord_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination: the next page after a cursor in total
    (o_orderdate, o_orderkey) order — the ONLY pagination pattern that
    survives scale. OFFSET n walks and discards n rows on every page
    (O(pages²) total work and unstable under concurrent inserts);
    the keyset predicate instead prunes at the scan (min/max row-group
    stats on o_orderdate skip everything before the cursor) and the
    ORDER BY + LIMIT plans as TakeOrderedAndProject — per-partition
    top-k, driver merge of k·partitions rows, no global sort.
    One SQL text, both engines; price rides as exact integer cents."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_KEYSET_SQL)


# ---------------------------------------------------------------------------
# null-safe equality join
# ---------------------------------------------------------------------------

# A nullable join key: clerk badge number goes NULL for one cohort
# (deterministic o_orderkey gate). Plain `=` drops every NULL pair;
# `<=>` / IS NOT DISTINCT FROM matches NULL with NULL — the semantic a
# dedup on nullable business keys needs.
_NULLSAFE_ORACLE = """
WITH keyed AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 0 THEN NULL
              ELSE o_custkey % 100 END AS badge
  FROM orders
),
dim AS (
  SELECT DISTINCT badge FROM keyed
)
SELECT COALESCE(CAST(d.badge AS BIGINT), -1) AS badge_or_null,
       CAST(COUNT(k.o_orderkey) AS BIGINT) AS n_orders
FROM dim d
JOIN keyed k ON k.badge IS NOT DISTINCT FROM d.badge
GROUP BY d.badge
"""


@query("join_null_safe_eq", oracle=_NULLSAFE_ORACLE, tags=("join",))
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` ≙ IS NOT DISTINCT FROM): the NULL
    badge cohort joins to the NULL dim row instead of vanishing — the
    correct behavior when the join key is a nullable business attribute
    (plain `=` silently drops those rows; an unnoticed row-loss bug in
    real pipelines). Spark plans `<=>` as a hash join on the
    null-tolerant key (NULL hashes to one bucket), so this stays an
    equi-join, not a nested loop; with a skewed NULL cohort, salt the
    NULL bucket like any hot key (`join_salted_skew`)."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 13 == 0, F.lit(None))
        .otherwise(F.col("o_custkey") % 100)
        .alias("badge"),
    )
    dim = keyed.select("badge").distinct()
    return (
        dim.alias("d")
        .join(
            keyed.alias("k"),
            F.col("k.badge").eqNullSafe(F.col("d.badge")),
        )
        .groupBy(F.col("d.badge").alias("badge"))
        .agg(F.count("k.o_orderkey").alias("n_orders"))
        .select(
            F.coalesce(F.col("badge").cast("long"), F.lit(-1)).alias(
                "badge_or_null"
            ),
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# deterministic surrogate-key minting
# ---------------------------------------------------------------------------

# UUID-shaped key from the md5 of the pipe-joined natural key — the
# idempotent alternative to monotonically_increasing_id()/sequences:
# re-running the pipeline (or running it on two clusters) mints the
# SAME key for the same business row, which is what makes incremental
# MERGEs and cross-system joins stable. One SQL text, both engines.
_SURROGATE_SQL = """
SELECT c_custkey,
       concat(
         substring(h, 1, 8), '-', substring(h, 9, 4), '-',
         substring(h, 13, 4), '-', substring(h, 17, 4), '-',
         substring(h, 21, 12)
       ) AS customer_sk,
       h AS key_md5
FROM (
  SELECT c_custkey,
         md5(concat(CAST(c_custkey AS STRING), '|', c_name, '|',
                    CAST(c_nationkey AS STRING))) AS h
  FROM customer
) hashed
"""


@query("fn_surrogate_key", oracle=_SURROGATE_SQL, tags=("scalar", "warehouse"))
def fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic UUID-shaped surrogate keys minted from the natural
    key (md5 of the pipe-joined business columns). Unlike
    ``monotonically_increasing_id()`` (partition-layout-dependent) or a
    sequence (single point of coordination), content-derived keys are
    idempotent across reruns and clusters — a pure codegen'd projection
    with zero shuffle and zero state at any scale. The '|' delimiter
    prevents ('ab','c') / ('a','bc') collisions."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_SURROGATE_SQL)


# ---------------------------------------------------------------------------
# as-of join with a staleness tolerance
# ---------------------------------------------------------------------------

_ASOF_TOL_MIN = 15

_ASOF_TOL_ORACLE = f"""
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type,
         max(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_ts
  FROM events
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       CASE WHEN last_click_ts >= ts - INTERVAL {_ASOF_TOL_MIN} MINUTE
            THEN last_click_ts END AS fresh_click_ts,
       last_click_ts IS NOT NULL
         AND last_click_ts < ts - INTERVAL {_ASOF_TOL_MIN} MINUTE AS stale
FROM tagged
WHERE event_type = 'purchase'
"""


@query("join_asof_tolerance", oracle=_ASOF_TOL_ORACLE, tags=("join", "asof"))
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with BOUNDED STALENESS (pandas ``merge_asof``'s
    ``tolerance``, kdb's windowed aj): the most recent prior click only
    counts if it falls within 15 minutes of the purchase — older
    matches surface as NULL plus a ``stale`` flag, which is how
    feature-serving joins distinguish 'no signal' from 'signal too old
    to use' (training-serving skew guard). Same running-max window
    shape as ``join_asof_event`` (one user-keyed shuffle, never a
    range self-join); the tolerance is a map-side CASE after it."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tol = F.expr(f"INTERVAL {_ASOF_TOL_MIN} MINUTE")
    tagged = ev.withColumn(
        "last_click_ts",
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
    )
    return tagged.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(
            F.col("last_click_ts") >= F.col("ts") - tol, F.col("last_click_ts")
        ).alias("fresh_click_ts"),
        (
            F.col("last_click_ts").isNotNull()
            & (F.col("last_click_ts") < F.col("ts") - tol)
        ).alias("stale"),
    )
