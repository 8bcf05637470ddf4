"""Third SQL-surface wave: correlated subqueries, scalar subqueries,
exact percentiles, array higher-order functions, and FILTERed aggregates.

These are capabilities a user migrating any SQL workload onto the engine
expects; none exist in the reference (its only SQL is a flat SELECT,
``/root/reference/etl.py:152-157``). Spark-first expression: the subquery
forms go through ``spark.sql`` over the registered views (Catalyst rewrites
correlated EXISTS/IN into semi/anti joins and correlated scalar subqueries
into aggregated left joins — the same physical plans the DataFrame API
would produce, with pushdown and broadcast intact).

Cross-engine determinism: all float outputs here are either exact
(min/max/single-division) or integer-quantized before summing, so DuckDB
hash parity is bit-exact — see SCALE.md "float parity" notes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table, register_views
from udacity_data_engineer_capstone_spark.registry import query

# ---------------------------------------------------------------------------
# correlated EXISTS / NOT EXISTS
# ---------------------------------------------------------------------------

# identical text runs in both engines
_EXISTS_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 150000)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F'
                    AND o.o_orderpriority = '1-URGENT')
"""


@query("sub_exists_corr", oracle=_EXISTS_SQL, tags=("subquery",))
def sub_exists_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS ∧ NOT EXISTS. Catalyst rewrites these to a left
    semi + left anti join on ``o_custkey`` (`RewritePredicateSubquery`),
    so the plan is two hash joins with the filters pushed below — no
    per-row subquery execution, which is what makes the form safe at
    100 TB."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_EXISTS_SQL)


# ---------------------------------------------------------------------------
# scalar subqueries (correlated + uncorrelated)
# ---------------------------------------------------------------------------

# MAX/COUNT only — exact in any fold order, so the doubles hash
# identically in both engines (an AVG here would not).
_SCALAR_SQL = """
SELECT c.c_custkey,
       (SELECT MAX(o.o_totalprice) FROM orders o
        WHERE o.o_custkey = c.c_custkey) AS max_order_price,
       (SELECT COUNT(*) FROM orders o
        WHERE o.o_custkey = c.c_custkey) AS n_orders,
       (SELECT MAX(o_totalprice) FROM orders) AS global_max_price
FROM customer c
"""


@query("sub_scalar", oracle=_SCALAR_SQL, tags=("subquery",))
def sub_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated and uncorrelated scalar subqueries. The correlated
    pair becomes one aggregate-then-left-join on ``o_custkey``; the
    uncorrelated max becomes a one-row broadcast — Catalyst's
    decorrelation, not row-at-a-time evaluation."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_SCALAR_SQL)


# ---------------------------------------------------------------------------
# exact percentiles
# ---------------------------------------------------------------------------

# l_quantity is integer-valued; continuous interpolation at dyadic
# fractions (.25/.5/.75) is exact double arithmetic in both engines.
_PERCENTILE_SQL = """
SELECT l_returnflag,
       percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q1,
       percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS q2,
       percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity) AS q3,
       percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS med_disc,
       median(l_quantity) AS med,
       MIN(l_quantity) AS lo,
       MAX(l_quantity) AS hi
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_percentiles", oracle=_PERCENTILE_SQL, tags=("agg", "stats"))
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartiles per group: ``percentile_cont``/``percentile_disc``
    WITHIN GROUP plus ``median``. Exact percentiles sort within each
    group (one shuffle on the group key); for billion-row groups the
    scale path is ``approx_percentile`` (t-digest sketch, map-side
    mergeable) — kept exact here because the oracle is exact."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_PERCENTILE_SQL)


# ---------------------------------------------------------------------------
# array higher-order functions
# ---------------------------------------------------------------------------

_HOF_ORACLE = """
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
       CAST(floor(list_reduce(
              list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
              (a, b) -> greatest(a, b)) * 1000000) AS BIGINT) AS absmax_e6,
       CAST(list_sum(list_transform(embedding,
         x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS sum_milli,
       list_sum(list_transform(range(1, len(embedding) + 1),
         i -> CAST(floor(CAST(embedding[i] AS DOUBLE)
                         * CAST(embedding[len(embedding) + 1 - i] AS DOUBLE)
                         * 1000000) AS BIGINT))) :: BIGINT AS revdot_e6,
       len(list_filter(embedding, x -> abs(x) > 0.25)) > 0 AS has_large_dim
FROM embeddings
"""


@query("fn_array_hof", oracle=_HOF_ORACLE, tags=("scalar", "array"))
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over the embedding column:
    ``filter``/``size``, max-reduce via ``aggregate``, integer-quantized
    elementwise sums, ``zip_with`` against the reversed vector, and
    ``exists``. All per-row codegen'd expressions — zero shuffle; sums
    are quantized to integers *before* folding so the result is
    fold-order exact across engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.expr("size(filter(embedding, x -> x > 0))").alias("n_pos"),
        F.expr(
            "CAST(floor(aggregate(embedding, CAST(0 AS DOUBLE),"
            " (a, x) -> greatest(a, abs(CAST(x AS DOUBLE)))) * 1000000)"
            " AS BIGINT)"
        ).alias("absmax_e6"),
        F.expr(
            "aggregate(transform(embedding,"
            " x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)),"
            " CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("sum_milli"),
        F.expr(
            "aggregate(zip_with(embedding, reverse(embedding),"
            " (x, y) -> CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)"
            " * 1000000) AS BIGINT)), CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("revdot_e6"),
        F.expr("exists(embedding, x -> abs(x) > 0.25)").alias("has_large_dim"),
    )


# ---------------------------------------------------------------------------
# FILTERed / conditional aggregates
# ---------------------------------------------------------------------------

_FILTER_AGG_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n_all,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       CAST(SUM(CAST(l_quantity AS BIGINT))
         FILTER (WHERE l_tax > 0.04) AS BIGINT) AS qty_high_tax,
       COUNT(DISTINCT l_suppkey)
         FILTER (WHERE l_linestatus = 'O') AS n_open_suppliers,
       bool_or(l_quantity > 49) AS any_bulk,
       bool_and(l_quantity > 0) AS all_positive
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_filter_clause", oracle=_FILTER_AGG_SQL, tags=("agg",))
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER clause on aggregates plus bool_or/bool_and — the
    conditional-aggregate surface (one pass, one shuffle, partial
    aggregation intact; vs the naive multi-query/self-join phrasing).
    The filtered SUM is cast to BIGINT first: integer sums are
    fold-order exact."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_FILTER_AGG_SQL)


# ---------------------------------------------------------------------------
# ordered string aggregation
# ---------------------------------------------------------------------------

_LISTAGG_ORACLE = """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation
GROUP BY n_regionkey
"""

_LISTAGG_SPARK = """
SELECT n_regionkey,
       listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation
GROUP BY n_regionkey
"""


@query("agg_listagg", oracle=_LISTAGG_ORACLE, tags=("agg", "string"))
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (``listagg`` WITHIN GROUP ≙ DuckDB
    ``string_agg``): deterministic because the order-by is a total order
    within each group. At scale listagg cannot partial-aggregate (the
    ordered concat needs the full group) — keep it off billion-row
    groups, or pre-truncate with a group cap first."""
    register_views(spark, sf_dir, ("nation",))
    return spark.sql(_LISTAGG_SPARK)


# ---------------------------------------------------------------------------
# IGNORE NULLS navigation windows
# ---------------------------------------------------------------------------

# a value that is genuinely NULL for some rows: non-error events carry it
_IGNORE_NULLS_ORACLE = """
SELECT event_id, user_id, ts,
       first_value(nv IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_ok,
       last_value(nv IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS last_ok_so_far
FROM (SELECT event_id, user_id, ts,
             CASE WHEN event_type <> 'error' THEN value END AS nv
      FROM events)
"""

_IGNORE_NULLS_SPARK = """
SELECT event_id, user_id, ts,
       first_value(nv) IGNORE NULLS
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_ok,
       last_value(nv) IGNORE NULLS
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS last_ok_so_far
FROM (SELECT event_id, user_id, ts,
             CASE WHEN event_type <> 'error' THEN value END AS nv
      FROM events)
"""


@query("win_ignore_nulls", oracle=_IGNORE_NULLS_ORACLE, tags=("window",))
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS navigation: first/last non-null observation per user
    timeline (the gap-fill / last-observation-carried-forward primitive
    for sensor and clickstream data). Total order (ts, event_id) makes
    it deterministic; values pass through untouched, so doubles hash
    exactly."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_IGNORE_NULLS_SPARK)


# ---------------------------------------------------------------------------
# URL parsing
# ---------------------------------------------------------------------------

# a deterministic URL per document, so parse_url's output is verifiable
# against the ground-truth components the URL was built from
_URL_EXPR_SPARK = (
    "concat('https://', source, '.example.com/docs/', CAST(doc_id AS STRING),"
    " '?lang=', lang, '&v=2')"
)

_URL_ORACLE = """
SELECT doc_id,
       source || '.example.com' AS host,
       '/docs/' || CAST(doc_id AS VARCHAR) AS path,
       'lang=' || lang || '&v=2' AS query,
       lang AS lang_param
FROM documents
"""


@query("fn_url_parse", oracle=_URL_ORACLE, tags=("scalar", "string"))
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse_url`` extraction (HOST / PATH / QUERY / single query
    param) over per-document URLs. The oracle rebuilds each component
    from the fields the URL was constructed from, so the parser is
    verified against ground truth rather than another parser. Pure
    projection — codegen'd, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "url", F.expr(_URL_EXPR_SPARK)
    )
    return docs.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


# ---------------------------------------------------------------------------
# bitwise + conditional scalars
# ---------------------------------------------------------------------------

_MISC_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_orderkey & l_partkey AS b_and,
       l_orderkey | l_partkey AS b_or,
       xor(l_orderkey, l_partkey) AS b_xor,
       CAST(l_linenumber AS BIGINT) << 2 AS shl,
       l_orderkey >> 1 AS shr,
       nullif(l_returnflag, 'N') AS flag_or_null,
       COALESCE(nullif(l_returnflag, 'N'), l_linestatus) AS flag_fallback,
       GREATEST(l_orderkey, l_partkey, l_suppkey) AS hi_key,
       LEAST(l_orderkey, l_partkey, l_suppkey) AS lo_key
FROM lineitem
"""


@query("fn_misc_scalar", oracle=_MISC_ORACLE, tags=("scalar",))
def fn_misc_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise (&, |, xor, shifts) and conditional (nullif / coalesce /
    greatest / least) scalar surface — all integer/string exact, pure
    codegen projections."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("l_orderkey & l_partkey").alias("b_and"),
        F.expr("l_orderkey | l_partkey").alias("b_or"),
        F.expr("l_orderkey ^ l_partkey").alias("b_xor"),
        F.expr("shiftleft(CAST(l_linenumber AS BIGINT), 2)").alias("shl"),
        F.expr("shiftright(l_orderkey, 1)").alias("shr"),
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_or_null"),
        F.coalesce(
            F.nullif(F.col("l_returnflag"), F.lit("N")), F.col("l_linestatus")
        ).alias("flag_fallback"),
        F.greatest("l_orderkey", "l_partkey", "l_suppkey").alias("hi_key"),
        F.least("l_orderkey", "l_partkey", "l_suppkey").alias("lo_key"),
    )


# ---------------------------------------------------------------------------
# approximate percentiles (sketch path)
# ---------------------------------------------------------------------------


# The sketch values are engine-specific, so the checkable output is the
# EXACT quartiles (interpolation over integer-valued l_quantity is exact
# in binary on both engines) plus a sketch-error-bound boolean; the
# oracle computes the exact side and a TRUE literal — a real driver
# hash row instead of rows-only.
_APPROX_PCT_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q1_exact,
       quantile_cont(l_quantity, 0.50) AS med_exact,
       quantile_cont(l_quantity, 0.75) AS q3_exact,
       TRUE AS approx_within_5pct
FROM lineitem
GROUP BY l_returnflag
"""


@query(
    "agg_approx_percentile",
    oracle=_APPROX_PCT_ORACLE,
    tags=("agg", "stats", "approx"),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_percentile`` — the mergeable-sketch quantile path that
    replaces the exact within-group sort at billion-row groups — checked
    against the exact quartiles, emitted alongside (see oracle note)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 10000)"
        ).alias("ap"),
        F.expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").alias("ex"),
    )
    within = (
        (F.abs(F.col("ap")[0] - F.col("ex")[0]) <= 0.05 * F.col("ex")[0])
        & (F.abs(F.col("ap")[1] - F.col("ex")[1]) <= 0.05 * F.col("ex")[1])
        & (F.abs(F.col("ap")[2] - F.col("ex")[2]) <= 0.05 * F.col("ex")[2])
    )
    return agg.select(
        "l_returnflag",
        F.col("ex")[0].alias("q1_exact"),
        F.col("ex")[1].alias("med_exact"),
        F.col("ex")[2].alias("q3_exact"),
        within.alias("approx_within_5pct"),
    )


# ---------------------------------------------------------------------------
# SQL-registered Python UDF
# ---------------------------------------------------------------------------

_SQL_UDF_ORACLE = """
SELECT doc_id,
       CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS DOUBLE)
         / n_chars AS tokens_per_char
FROM documents
WHERE n_chars > 0
"""


@query("udf_sql_registered", oracle=_SQL_UDF_ORACLE, tags=("udf",))
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A pandas (Arrow-vectorized) UDF registered into the SQL function
    catalog with ``spark.udf.register`` and invoked from a SQL string —
    the path by which SQL-only users reach Python logic. The division is
    one exact int/int op, so the result hashes identically to the
    oracle."""
    @F.pandas_udf("double")
    def tokens_per_char(text: pd.Series, n_chars: pd.Series) -> pd.Series:
        toks = text.str.lower().str.split(r"\s+", regex=True).str.len()
        return toks.astype("float64") / n_chars.astype("float64")

    spark.udf.register("tokens_per_char", tokens_per_char)
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        "SELECT doc_id, tokens_per_char(text, n_chars) AS tokens_per_char "
        "FROM documents WHERE n_chars > 0"
    )


# ---------------------------------------------------------------------------
# ANSI-safe (try_*) arithmetic
# ---------------------------------------------------------------------------

_TRY_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_linenumber - 1 = 0 THEN NULL
            ELSE l_quantity / (l_linenumber - 1) END AS qty_per_prior_line,
       TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
       TRY_CAST(CAST(l_orderkey AS VARCHAR) AS INTEGER) AS key_roundtrip
FROM lineitem
"""


@query("fn_try_arithmetic", oracle=_TRY_ORACLE, tags=("scalar",))
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: ``try_divide`` (NULL on zero divisor
    instead of an error under ANSI mode) and ``try_cast`` (NULL on
    malformed input). The safety valves a production pipeline needs once
    ANSI SQL mode is on — one bad row must not kill a 100 TB job."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "try_divide(l_quantity, CAST(l_linenumber - 1 AS DOUBLE))"
        ).alias("qty_per_prior_line"),
        F.expr("try_cast(l_returnflag AS INT)").alias("flag_as_int"),
        F.expr(
            "try_cast(CAST(l_orderkey AS STRING) AS INT)"
        ).alias("key_roundtrip"),
    )


# ---------------------------------------------------------------------------
# deterministic mode (most frequent value with total-order tiebreak)
# ---------------------------------------------------------------------------

_MODE_SQL = """
SELECT user_id, event_type AS modal_type, n
FROM (
  SELECT user_id, event_type, COUNT(*) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events
  GROUP BY user_id, event_type
)
WHERE rn = 1
"""


@query("agg_mode_det", oracle=_MODE_SQL, tags=("agg",))
def agg_mode_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode per key: most frequent event type with a
    lexicographic tiebreak (the built-in ``mode()`` is tie-arbitrary —
    useless for reproducible pipelines). One partial-aggregated count
    shuffle + a WindowGroupLimit-pruned ranking window; identical SQL
    runs in both engines."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_MODE_SQL)


# ---------------------------------------------------------------------------
# LATERAL correlated derived tables
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice
         FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 3) t
"""


@query("sub_lateral_topn", oracle=_LATERAL_SQL, tags=("subquery",))
def sub_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table: top-3 orders per customer — the
    per-row-subquery phrasing of a grouped top-n. Catalyst decorrelates
    the LATERAL into a ranked window over one join (DomainJoin rewrite),
    so the plan is the same shuffle a window top-n costs, never an
    order-by-limit per customer. Total order (price desc, orderkey)
    keeps the LIMIT deterministic."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# event-time RANGE frame (rolling interval aggregate)
# ---------------------------------------------------------------------------

_ROLLING_SQL = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         AS BIGINT) AS rolling_1h_cents,
       COUNT(*)
         OVER (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         AS rolling_1h_events
FROM events
"""


@query("win_range_interval", oracle=_ROLLING_SQL, tags=("window", "events"))
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time rolling aggregate: a RANGE frame bounded by an
    INTERVAL — each row sums its user's trailing hour. RANGE frames
    include sort-key peers, so duplicate timestamps can't make the
    result order-dependent; the summed value is integer cents, exact in
    any fold order. One window shuffle on user_id."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_ROLLING_SQL)


# ---------------------------------------------------------------------------
# bag-semantics set operations
# ---------------------------------------------------------------------------

# l_suppkey projections carry duplicates, so ALL vs DISTINCT semantics
# genuinely differ — the case set_union_intersect_except can't exercise
_BAG_SET_SQL = """
SELECT s, COUNT(*) AS n FROM (
  SELECT l_suppkey AS s FROM lineitem WHERE l_returnflag = 'R'
  INTERSECT ALL
  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
) GROUP BY s
"""

_BAG_EXCEPT_SQL = """
SELECT s, COUNT(*) AS n FROM (
  SELECT l_suppkey AS s FROM lineitem WHERE l_returnflag = 'R'
  EXCEPT ALL
  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
) GROUP BY s
"""


@query("set_bag_intersect", oracle=_BAG_SET_SQL, tags=("set",))
def set_bag_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each supplier key survives
    min(count_left, count_right) times, which only shows on inputs with
    duplicates (this projection has them; the DISTINCT variants in
    set_union_intersect_except cannot see the difference)."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_BAG_SET_SQL)


@query("set_bag_except", oracle=_BAG_EXCEPT_SQL, tags=("set",))
def set_bag_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: count_left − count_right occurrences
    survive (floor 0). The multiplicity-preserving form dedup accounting
    needs."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_BAG_EXCEPT_SQL)


# ---------------------------------------------------------------------------
# pattern-matching scalars
# ---------------------------------------------------------------------------

_PATTERN_SQL = """
SELECT p_partkey, p_name,
       p_name LIKE '%steel%' AS has_steel,
       p_name ILIKE '%STEEL%' AS has_steel_ci,
       p_type LIKE 'PROMO%' AS is_promo,
       regexp_matches(p_name, '^[a-z]+ [a-z]+') AS two_words
FROM part
"""

_PATTERN_SPARK = """
SELECT p_partkey, p_name,
       p_name LIKE '%steel%' AS has_steel,
       p_name ILIKE '%STEEL%' AS has_steel_ci,
       p_type LIKE 'PROMO%' AS is_promo,
       p_name RLIKE '^[a-z]+ [a-z]+' AS two_words
FROM part
"""


@query("fn_pattern_match", oracle=_PATTERN_SQL, tags=("scalar", "string"))
def fn_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-matching surface: LIKE, case-insensitive ILIKE, prefix
    LIKE (which Catalyst compiles to StartsWith — no regex engine), and
    RLIKE ≙ regexp_matches with a dialect-portable pattern. Pure codegen
    projections."""
    register_views(spark, sf_dir, ("part",))
    return spark.sql(_PATTERN_SPARK)


# ---------------------------------------------------------------------------
# running distinct count (first-occurrence trick)
# ---------------------------------------------------------------------------

# COUNT(DISTINCT) OVER a running frame is unsupported in both engines;
# the portable form marks each key's first occurrence and running-sums
# the marks — the standard rewrite, and it partial-aggregates fine.
_RUN_DISTINCT_SQL = """
SELECT user_id, ts, event_id,
       CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING)
         AS BIGINT) AS distinct_types_so_far
FROM (
  SELECT user_id, ts, event_id,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
"""


@query("win_running_distinct", oracle=_RUN_DISTINCT_SQL, tags=("window",))
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-count per user timeline (how many event types
    has this user touched so far) via the first-occurrence rewrite —
    windowed COUNT(DISTINCT) doesn't exist, but a running SUM over
    first-seen markers is equivalent, integer-exact, and needs only two
    window passes over the same user_id shuffle."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_RUN_DISTINCT_SQL)


# ---------------------------------------------------------------------------
# robust statistics: median absolute deviation
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH med AS (
  SELECT l_returnflag, median(l_quantity) AS m
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       ANY_VALUE(m.m) AS med_qty,
       median(abs(l.l_quantity - m.m)) AS mad_qty
FROM lineitem l JOIN med m ON m.l_returnflag = l.l_returnflag
GROUP BY l.l_returnflag
"""

_MAD_SPARK = """
WITH med AS (
  SELECT l_returnflag, median(l_quantity) AS m
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       ANY_VALUE(m.m) AS med_qty,
       median(abs(l.l_quantity - m.m)) AS mad_qty
FROM lineitem l JOIN med m ON m.l_returnflag = l.l_returnflag
GROUP BY l.l_returnflag
"""


@query("agg_mad_robust", oracle=_MAD_ORACLE, tags=("agg", "stats"))
def agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    measure outlier detection uses where stddev is poisoned by the
    outliers themselves. Two-pass: per-group median (broadcast back as
    a tiny dim), then the median of absolute deviations. Integer-valued
    quantities keep every interpolation exact; ANY_VALUE is
    deterministic here because m is constant within each group."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_MAD_SPARK)


# ---------------------------------------------------------------------------
# Spark 4 SQL-language surface: SQL scalar UDFs + pipe syntax
# ---------------------------------------------------------------------------

# Spark 4 adds ANSI SQL scalar functions (CREATE FUNCTION ... RETURN
# expr) — reusable catalog-registered expressions that inline into the
# plan at analysis time (no Python boundary, full codegen, pushdown
# intact). The oracle expands the function body, proving the engine's
# UDF inlining computes exactly the standard expression.
_SQL_UDF_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS disc_revenue_cents
FROM lineitem
GROUP BY l_returnflag
"""


@query("sql_scalar_udf", oracle=_SQL_UDF_ORACLE, tags=("sql", "udf"))
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDF (Spark 4 ``CREATE FUNCTION ... RETURN``): the
    discounted-price-in-cents business rule registered ONCE as a
    catalog function and reused by name. SQL UDFs inline at analysis
    time — the physical plan is identical to writing the expression
    inline (whole-stage codegen, aggregate pushdown), unlike a Python
    UDF which would force a BatchEvalPython boundary. That inlining is
    exactly what the oracle checks: DuckDB runs the expanded
    expression, cent-exact."""
    register_views(spark, sf_dir, ("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_cents(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN CAST(floor(p * (1 - d) * 100 + 0.5) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(disc_cents(l_extendedprice, l_discount)) AS BIGINT)
                 AS disc_revenue_cents
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


# Spark 4's SQL pipe syntax (|>) — linear dataflow SQL. Same logical
# plan as the nested form; the oracle is the classic formulation.
_PIPE_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
HAVING COUNT(*) > 10
"""


@query("sql_pipe_syntax", oracle=_PIPE_ORACLE, tags=("sql",))
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax: the filter → aggregate → having chain
    written as a linear ``|>`` dataflow. Pipe stages desugar to the
    identical logical plan as nested SQL — Catalyst sees no
    difference — which the classic-form DuckDB oracle verifies
    cent-exactly."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
                     CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                          AS BIGINT) AS total_cents
           GROUP BY o_orderpriority
        |> WHERE n_orders > 10
        """
    )


# ---------------------------------------------------------------------------
# parameterized SQL (named-parameter binding)
# ---------------------------------------------------------------------------

_PARAM_STATUS = "O"
_PARAM_MIN_PRICE = 1000.0

# The oracle inlines the same literals the Spark side binds as named
# parameters — binding must be semantically identical to inlining.
_PARAM_ORACLE = f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderstatus = '{_PARAM_STATUS}' AND o_totalprice > {_PARAM_MIN_PRICE}
GROUP BY o_orderpriority
"""


@query("sql_parameterized", oracle=_PARAM_ORACLE, tags=("sql",))
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL binding (``spark.sql(..., args={...})``) —
    the injection-safe surface an application layer calls with user
    input instead of string-formatting literals into query text.
    Parameters bind as typed literals, so Catalyst constant-folds and
    pushes them down exactly like inline text (the oracle IS the
    inlined twin; parity proves the equivalence).

    Plan shape: filter pushed to the scan, partial+final aggregate —
    identical to the literal version at any scale."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                 AS BIGINT) AS total_cents
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice > :min_price
        GROUP BY o_orderpriority
        """,
        args={"status": _PARAM_STATUS, "min_price": _PARAM_MIN_PRICE},
    )


# ---------------------------------------------------------------------------
# base64 round-trip (binary wire-format function coverage)
# ---------------------------------------------------------------------------

_B64_ORACLE = """
SELECT n_nationkey,
       to_base64(encode(n_name)) AS b64,
       CAST(octet_length(encode(n_name)) AS BIGINT) AS n_bytes,
       decode(from_base64(to_base64(encode(n_name)))) = n_name AS roundtrip_ok
FROM nation
"""


@query("fn_base64_roundtrip", oracle=_B64_ORACLE, tags=("scalar", "binary"))
def fn_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 encode/decode round-trip over a binary column — the wire
    format every API-facing export path hits (webhooks, JSON-embedded
    blobs, Avro defaults). Asserts the decode(encode(x)) identity
    per row alongside the encoded text, so parity covers padding and
    alphabet, not just length. Map-only projection."""
    nation = load_table(spark, sf_dir, "nation")
    enc = F.encode("n_name", "utf-8")
    return nation.select(
        "n_nationkey",
        F.base64(enc).alias("b64"),
        F.octet_length(enc).cast("long").alias("n_bytes"),
        (
            F.decode(F.unbase64(F.base64(enc)), "utf-8") == F.col("n_name")
        ).alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# GROUP BY ALL / ORDER BY ALL (modern-SQL ergonomics)
# ---------------------------------------------------------------------------

_GBA_SQL = """
SELECT o_orderpriority,
       o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY ALL
"""


@query("sql_group_by_all", oracle=_GBA_SQL, tags=("sql",))
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` — the modern-SQL ergonomic both engines now
    share (DuckDB pioneered it; Spark adopted it in 3.4): every
    non-aggregate select item becomes a grouping key, so adding a
    dimension to the SELECT list can never silently break the GROUP BY
    clause. One shared statement text runs verbatim on both engines;
    the plan is the ordinary partial+final hash aggregate."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_GBA_SQL)


# ---------------------------------------------------------------------------
# CLUSTER BY (Spark physical-distribution SQL)
# ---------------------------------------------------------------------------

_CLUSTER_ORACLE = """
SELECT o_orderpriority,
       o_orderkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
FROM orders
WHERE o_orderstatus = 'F'
"""


@query("sql_cluster_by", oracle=_CLUSTER_ORACLE, tags=("sql",))
def sql_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's hive-heritage ``CLUSTER BY`` (= DISTRIBUTE BY + SORT BY):
    co-locates and locally sorts rows by the key WITHOUT a global sort
    — the SQL spelling of the repartition+sortWithinPartitions layout
    idiom the sinks in this repo use before partitioned writes. The
    ROWS delivered are identical to the plain filter (which is what
    the oracle checks — distribution is a physical property); the plan
    pin asserts the RepartitionByExpression + per-partition Sort
    actually appear."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority,
               o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
        WHERE o_orderstatus = 'F'
        CLUSTER BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# CIDR matching: classify client IPs against network blocks
# ---------------------------------------------------------------------------

# Client IPs derive from events (10.0.<user_id%256>.7, the same
# rendering src_apache_logs writes); the block table is inline. An IP
# matches a /p block when its integer form lies in [base, base+2^(32-p));
# overlapping blocks resolve by LONGEST prefix — the routing-table rule.
_CIDR_SQL = """
WITH ips AS (
  SELECT CAST(167772160 + (user_id % 256) * 256 + 7 AS BIGINT) AS ip_int,
         user_id,
         CAST(COUNT(*) AS BIGINT) AS n_req
  FROM events
  GROUP BY user_id
),
blocks AS (
  SELECT 'corp-lan' AS block, CAST(24 AS BIGINT) AS prefix,
         CAST(167772160 AS BIGINT) AS lo,
         CAST(167772160 + 255 AS BIGINT) AS hi
  UNION ALL
  SELECT 'dc-east', 22,
         CAST(167772160 + 4 * 256 AS BIGINT),
         CAST(167772160 + 8 * 256 - 1 AS BIGINT)
  UNION ALL
  SELECT 'dc-east-gpu', 24,
         CAST(167772160 + 5 * 256 AS BIGINT),
         CAST(167772160 + 6 * 256 - 1 AS BIGINT)
  UNION ALL
  SELECT 'wide-10', 8, CAST(167772160 AS BIGINT),
         CAST(167772160 + 16777215 AS BIGINT)
),
matched AS (
  SELECT i.user_id, i.ip_int, i.n_req, b.block, b.prefix,
         ROW_NUMBER() OVER (PARTITION BY i.user_id, i.ip_int
                            ORDER BY b.prefix DESC, b.block) AS r
  FROM ips i JOIN blocks b ON i.ip_int BETWEEN b.lo AND b.hi
)
SELECT block, CAST(prefix AS BIGINT) AS prefix,
       CAST(SUM(n_req) AS BIGINT) AS n_requests,
       CAST(COUNT(DISTINCT ip_int) AS BIGINT) AS n_ips
FROM matched
WHERE r = 1
GROUP BY block, prefix
"""


@query("fn_ip_cidr_match", oracle=_CIDR_SQL, tags=("function", "join"))
def fn_ip_cidr_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix CIDR classification of client IPs: integer IP
    forms range-join against a network-block table and overlaps
    resolve routing-table style (most-specific prefix wins, via one
    ranking window). The request/IP rollup per block is what a
    security or traffic dashboard reads; the 10.0.5.x IPs land in
    'dc-east-gpu' even though 'dc-east' and 'wide-10' also contain
    them.

    Scale shape: the block table is routing-table-sized → broadcast;
    the range predicate evaluates map-side against it; one window
    keyed by IP + one hash aggregate. No data-sized shuffle beyond
    the rollup."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_CIDR_SQL)


# ---------------------------------------------------------------------------
# star-except projection (schema-evolution-proof column dropping)
# ---------------------------------------------------------------------------


@query(
    "sql_select_except",
    oracle="""
SELECT * EXCLUDE (c_name, c_acctbal) FROM customer ORDER BY c_custkey
""",
    tags=("sql", "projection"),
)
def sql_select_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-except projection — ``SELECT * EXCEPT (...)`` (Spark) ≙
    ``SELECT * EXCLUDE (...)`` (DuckDB): drop the sensitive/unneeded
    columns by NAME and keep everything else, so the projection
    survives upstream schema evolution (a new column flows through
    without a code change, unlike an explicit column list). The
    PII-minimizing sibling of ``prj_drop``.

    Scale shape: pure projection — column pruning reaches the scan
    and the dropped columns are never read."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        "SELECT * EXCEPT (c_name, c_acctbal) FROM customer ORDER BY c_custkey"
    )


# ---------------------------------------------------------------------------
# Luhn checksum validation (payment-card style data cleaning)
# ---------------------------------------------------------------------------

# Synthetic 16-digit account numbers minted from the customer key; the
# last digit is chosen so that ~half the numbers fail Luhn (parity of
# the key), making both verdicts observable. The doubled-digit rule
# sum(d*2 > 9 ? d*2-9 : d*2) unrolls over the 16 fixed positions —
# pure integer/substring expressions shared by both engines.
def _luhn_sql() -> str:
    acct = (
        "CONCAT('4', LPAD(CAST(c_custkey AS STRING), 14, '0'),"
        " CAST(c_custkey % 10 AS STRING))"
    )
    terms = []
    for pos in range(1, 17):
        d = f"CAST(substr(acct, {pos}, 1) AS BIGINT)"
        if pos % 2 == 1:  # doubled positions (odd index from left, 16-digit)
            terms.append(
                f"(CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END)"
            )
        else:
            terms.append(d)
    total = " + ".join(terms)
    return f"""
WITH accts AS (
  SELECT c_custkey, {acct} AS acct FROM customer
),
checked AS (
  SELECT c_custkey, acct, CAST({total} AS BIGINT) AS luhn_sum
  FROM accts
)
SELECT CAST(luhn_sum % 10 = 0 AS BOOLEAN) AS luhn_valid,
       CAST(COUNT(*) AS BIGINT) AS n_accounts,
       CAST(MIN(c_custkey) AS BIGINT) AS min_key,
       CAST(MAX(c_custkey) AS BIGINT) AS max_key
FROM checked
GROUP BY luhn_sum % 10 = 0
"""


@query("fn_luhn_checksum", oracle=_luhn_sql(), tags=("function", "quality"))
def fn_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn (mod-10) checksum validation over synthetic 16-digit
    account numbers — the classic ingest-time cleaning rule for
    payment-card-shaped fields (a mistyped digit flips the verdict).
    The doubled-digit sum unrolls into 16 fixed substring/integer
    terms, identical text on both engines, summarized by verdict.

    Scale shape: map-side expressions + one 2-group aggregate."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_luhn_sql())


# ---------------------------------------------------------------------------
# locale number parsing: EU-formatted amounts back to exact cents
# ---------------------------------------------------------------------------

# Render each order total as a German-style string ('1.234.567,89' —
# dot thousands, comma decimals) with pure integer string ops (both
# engines render identically), then PARSE it back and prove the round
# trip per row. The parse chain is the ingest rule for any European
# CSV drop; the render exists only because the synthetic data has no
# dirty strings of its own.
_LOCALE_SQL = """
WITH cents_t AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
parts AS (
  SELECT o_orderkey, cents,
         CAST(FLOOR(cents / 100.0) AS BIGINT) AS d,
         CAST(cents % 100 AS BIGINT) AS frac
  FROM cents_t
),
rendered AS (
  SELECT o_orderkey, cents,
         CONCAT(
           CASE WHEN d >= 1000
                THEN CONCAT(CAST(CAST(FLOOR(d / 1000.0) AS BIGINT) AS STRING),
                            '.',
                            LPAD(CAST(d % 1000 AS STRING), 3, '0'))
                ELSE CAST(d AS STRING) END,
           ',', LPAD(CAST(frac AS STRING), 2, '0')) AS eu_text
  FROM parts
),
parsed AS (
  SELECT o_orderkey, cents, eu_text,
         CAST(FLOOR(
           CAST(REPLACE(REPLACE(eu_text, '.', ''), ',', '.') AS DOUBLE)
           * 100 + 0.5) AS BIGINT) AS parsed_cents
  FROM rendered
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN parsed_cents = cents THEN 1 ELSE 0 END) AS BIGINT)
         AS n_roundtrip_ok,
       SUM(CASE WHEN parsed_cents = cents THEN 1 ELSE 0 END) = COUNT(*)
         AS all_exact,
       MIN(eu_text) AS sample_min_text,
       MAX(eu_text) AS sample_max_text
FROM parsed
"""


@query("fn_locale_number_parse", oracle=_LOCALE_SQL, tags=("function", "text"))
def fn_locale_number_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EU-locale number parsing ('1.234,56' → exact cents): strip the
    dot thousands separators, swap the decimal comma, cast, re-scale —
    with a per-row round-trip proof against the integer-cents source
    (render and parse must be exact inverses on every order). The
    ingest-cleaning rule for European CSV drops, exercised end to end.

    Scale shape: pure map-side string/integer expressions + one 1-row
    rollup."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_LOCALE_SQL)


# ---------------------------------------------------------------------------
# semantic-version parsing and ordering
# ---------------------------------------------------------------------------

# Deterministic client versions minted from order keys; the sortable
# form zero-pads each numeric field so STRING order == semver order —
# the standard trick for version columns in engines without a semver
# type. Latest-per-major via one ranking window.
_SEMVER_SQL = """
WITH versions AS (
  SELECT CONCAT(CAST(o_orderkey % 4 AS STRING), '.',
                CAST(o_orderkey % 12 AS STRING), '.',
                CAST(o_orderkey % 100 AS STRING)) AS ver
  FROM orders
),
counted AS (
  SELECT ver, CAST(COUNT(*) AS BIGINT) AS n_clients FROM versions GROUP BY ver
),
parsed AS (
  SELECT ver, n_clients,
         CAST(split_part(ver, '.', 1) AS BIGINT) AS major,
         CAST(split_part(ver, '.', 2) AS BIGINT) AS minor,
         CAST(split_part(ver, '.', 3) AS BIGINT) AS patch
  FROM counted
),
sortable AS (
  SELECT ver, n_clients, major, minor, patch,
         CONCAT(LPAD(CAST(major AS STRING), 4, '0'), '.',
                LPAD(CAST(minor AS STRING), 4, '0'), '.',
                LPAD(CAST(patch AS STRING), 4, '0')) AS sort_key
  FROM parsed
)
SELECT ver, n_clients, major, minor, patch, sort_key,
       CAST(ROW_NUMBER() OVER (PARTITION BY major
                               ORDER BY minor DESC, patch DESC)
            AS BIGINT) = 1 AS latest_in_major
FROM sortable
"""


@query("fn_semver_parse", oracle=_SEMVER_SQL, tags=("function", "text"))
def fn_semver_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-version handling for a client-version column: parse
    major/minor/patch, build the zero-padded sort key that makes
    STRING order equal semver order (the '1.10.0' > '1.9.0' trap that
    plain string sorting gets wrong), and mark the newest release per
    major line — the deprecation-dashboard staple.

    Scale shape: map-side parsing + one version-cardinality aggregate
    + a ranking window over the (tiny) distinct-version table."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_SEMVER_SQL)


# ---------------------------------------------------------------------------
# collation-aware comparison (Spark 4 COLLATE)
# ---------------------------------------------------------------------------

# Case-mangled nation names: even keys uppercase, odd keys lowercase —
# binary equality against the lowered dim finds only the odd half,
# case-insensitive collation finds all 25.
_COLLATION_ORACLE = """
WITH mangled AS (
  SELECT n_nationkey,
         CASE WHEN n_nationkey % 2 = 0 THEN upper(n_name)
              ELSE lower(n_name) END AS name_raw
  FROM nation
),
dim AS (SELECT n_nationkey AS k, lower(n_name) AS name_lc FROM nation)
SELECT
  CAST((SELECT COUNT(*) FROM mangled m JOIN dim d
        ON m.name_raw = d.name_lc) AS BIGINT) AS n_binary_matches,
  CAST((SELECT COUNT(*) FROM mangled m JOIN dim d
        ON m.name_raw COLLATE NOCASE = d.name_lc COLLATE NOCASE) AS BIGINT)
    AS n_ci_matches,
  CAST((SELECT COUNT(DISTINCT name_raw COLLATE NOCASE) FROM mangled)
       AS BIGINT) AS n_ci_distinct
"""


@query("sql_collation_ci", oracle=_COLLATION_ORACLE, tags=("sql", "function"))
def sql_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware string semantics — Spark 4's ``COLLATE
    'UNICODE_CI'`` ≙ DuckDB's ``COLLATE NOCASE``: the same join and
    DISTINCT that miss half the case-mangled keys under binary
    comparison find all of them under a case-insensitive collation,
    WITHOUT rewriting every predicate through lower() (which would
    break index/stats use on a real engine and loses locale rules like
    the Turkish I that lower() mishandles). Counts: 13 binary matches
    (the lowercased half + none of the uppercase), 25 CI matches, 25
    CI-distinct names.

    Scale shape: collation is a comparator property — joins stay
    equi-joins (hash on the collation key), no expression wrapping, no
    pushdown loss."""
    register_views(spark, sf_dir, ("nation",))
    return spark.sql(
        """
WITH mangled AS (
  SELECT n_nationkey,
         CASE WHEN n_nationkey % 2 = 0 THEN upper(n_name)
              ELSE lower(n_name) END AS name_raw
  FROM nation
),
dim AS (SELECT n_nationkey AS k, lower(n_name) AS name_lc FROM nation)
SELECT
  CAST((SELECT COUNT(*) FROM mangled m JOIN dim d
        ON m.name_raw = d.name_lc) AS BIGINT) AS n_binary_matches,
  CAST((SELECT COUNT(*) FROM mangled m JOIN dim d
        ON collate(m.name_raw, 'UNICODE_CI')
           = collate(d.name_lc, 'UNICODE_CI')) AS BIGINT) AS n_ci_matches,
  CAST((SELECT COUNT(DISTINCT collate(name_raw, 'UNICODE_CI'))
        FROM mangled) AS BIGINT) AS n_ci_distinct
"""
    )
