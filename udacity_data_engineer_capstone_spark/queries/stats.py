"""Hypothesis-test statistics over the corpus: Welch's t-test and a
chi-square independence test, computed distributively from EXACT integer
moments.

The reference has no statistics at all (its 269-line ETL never aggregates
beyond COUNT, ``/root/reference/etl.py:159-221``); this is extension
surface for the data-quality side of a curation pipeline — "did source A
drift from source B", "is event mix independent of user cohort" are the
questions a 100 TB corpus refresh has to answer before shipping.

Cross-engine determinism: every sum is over INTEGER values (text lengths,
cell counts), so partial aggregation is fold-order-exact; the final
statistic is then a fixed tree of IEEE-754 double ops (+,-,*,/,sqrt are
all correctly-rounded per the standard, hence bit-identical in Spark and
DuckDB given identical inputs). Where a statistic sums per-cell DOUBLE
contributions (chi-square), each contribution is quantized to an integer
first so the sum is again fold-order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table, register_views
from udacity_data_engineer_capstone_spark.operators.ordinal import (
    composite_bucket_key,
    global_cum,
    global_row_number,
)
from udacity_data_engineer_capstone_spark.registry import query

# ---------------------------------------------------------------------------
# Welch's two-sample t-test: doc length, per source pair vs source 'src0'
# ---------------------------------------------------------------------------

# Shared SQL text shape (wide lane parameterized per engine). Sample
# variance from exact integer power sums: v = (n*ss - s^2) / (n*(n-1)),
# evaluated as one double division of two exact products. The round-9
# text disclosed "at petabyte row counts the BIGINT products would
# need DECIMAL(38,0) widening" — the round-10 overflow audit executed
# that widening (Σlen² ≈ 1e20 and n·ss ≈ s² ≈ 1e32 at the 1e12-row /
# 100 TB target): the quadratic lanes now run in the
# DECIMAL(38,0)↔HUGEINT wide pair, exact to 1e38, cast to DOUBLE once.


def _ttest_sql(wide: str) -> str:
    return f"""
WITH moments AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(length(text)) AS BIGINT) AS s,
         CAST(SUM(CAST(length(text) AS {wide}) * length(text)) AS {wide})
           AS ss
  FROM documents
  GROUP BY source
),
stats AS (
  SELECT source, n, s, ss,
         CAST(s AS DOUBLE) / n AS mean_len,
         CAST(CAST(n AS {wide}) * ss - CAST(s AS {wide}) * s AS DOUBLE)
           / CAST(CAST(n AS {wide}) * (n - 1) AS DOUBLE)
           AS var_len
  FROM moments
),
base AS (
  SELECT * FROM stats WHERE source = 'src0'
)
SELECT o.source,
       o.n AS n_other,
       b.n AS n_base,
       o.mean_len AS mean_other,
       b.mean_len AS mean_base,
       (o.mean_len - b.mean_len)
         / sqrt(o.var_len / o.n + b.var_len / b.n) AS t_stat
FROM stats o CROSS JOIN base b
WHERE o.source <> 'src0'
"""


@query("stat_welch_ttest", oracle=_ttest_sql("HUGEINT"), tags=("stats",))
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of document length, every source
    against the 'src0' baseline — the drift detector a corpus refresh
    runs per ingest source. One hash aggregate computes exact integer
    moments (n, Σx, Σx²) per source; the t statistic is a fixed
    double-precision expression over those exact sums, so the value is
    bit-identical across engines and partitionings. The baseline row is
    a 1-row broadcast to every comparison."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_ttest_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# chi-square independence: event_type x user-id parity
# ---------------------------------------------------------------------------

# Per-cell contributions (obs-exp)^2/exp are doubles; quantizing each to
# an integer (floor * 1e9) before the final sum keeps the total
# fold-order-exact. dof = (levels(type)-1) * (levels(cohort)-1).
_CHI2_SQL = """
WITH cells AS (
  SELECT event_type, CAST(user_id % 2 AS BIGINT) AS cohort,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM events
  GROUP BY event_type, user_id % 2
),
tot AS (
  SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells
),
margins AS (
  SELECT c.event_type, c.cohort, c.obs,
         CAST(SUM(c.obs) OVER (PARTITION BY c.event_type) AS BIGINT) AS row_tot,
         CAST(SUM(c.obs) OVER (PARTITION BY c.cohort) AS BIGINT) AS col_tot
  FROM cells c
),
contrib AS (
  SELECT m.event_type, m.cohort,
         CAST(floor(
           (CAST(m.obs AS DOUBLE)
              - CAST(m.row_tot AS DOUBLE) * m.col_tot / t.n)
           * (CAST(m.obs AS DOUBLE)
              - CAST(m.row_tot AS DOUBLE) * m.col_tot / t.n)
           / (CAST(m.row_tot AS DOUBLE) * m.col_tot / t.n)
           * 1000000000) AS BIGINT) AS q_contrib
  FROM margins m CROSS JOIN tot t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST((SELECT COUNT(DISTINCT event_type) FROM cells) - 1 AS BIGINT)
         * ((SELECT COUNT(DISTINCT cohort) FROM cells) - 1) AS dof,
       CAST(SUM(q_contrib) AS BIGINT) AS chi2_nano
FROM contrib
"""


@query("stat_chi2_independence", oracle=_CHI2_SQL, tags=("stats",))
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event type vs user-id parity
    cohort (an A/B-split sanity check: event mix should be independent
    of the hash cohort). Contingency cells come from one exact hash
    aggregate; expected counts from window-computed margins over the
    |types|x|cohorts| cell table (tiny — window cost is nil); each
    cell's (obs-exp)^2/exp is quantized to nano-units before summing so
    the statistic is deterministic under any partitioning."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_CHI2_SQL)


# ---------------------------------------------------------------------------
# OLS simple regression from exact moments
# ---------------------------------------------------------------------------

# x = whitespace token count, y = character length, per source. All five
# power sums are exact BIGINTs; slope/intercept/r2 are then fixed trees
# of IEEE double ops — deterministic under any partitioning. The token
# count reuses the whitespace tokenizer contract from text_tokens
# (split on runs of whitespace).
# Quadratic lanes (sxx/syy/sxy and the n·s-product numerators) run in
# the DECIMAL(38,0)↔HUGEINT wide pair: at the 1e12-row target Σy² ≈
# 1e20 and n·syy ≈ 1e32 overflow int64 (round-10 overflow audit).


def _ols_sql(wide: str) -> str:
    return f"""
WITH obs AS (
  SELECT source,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
           AS x,
         CAST(length(text) AS BIGINT) AS y
  FROM documents
),
m AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS {wide}) * x) AS {wide}) AS sxx,
         CAST(SUM(CAST(y AS {wide}) * y) AS {wide}) AS syy,
         CAST(SUM(CAST(x AS {wide}) * y) AS {wide}) AS sxy
  FROM obs
  GROUP BY source
),
cov AS (
  SELECT source, n, sx, sy,
         CAST(CAST(n AS {wide}) * sxy - CAST(sx AS {wide}) * sy AS DOUBLE)
           AS cxy,
         CAST(CAST(n AS {wide}) * sxx - CAST(sx AS {wide}) * sx AS DOUBLE)
           AS cxx,
         CAST(CAST(n AS {wide}) * syy - CAST(sy AS {wide}) * sy AS DOUBLE)
           AS cyy
  FROM m
)
SELECT source, n,
       cxy / cxx AS slope,
       (CAST(sy AS DOUBLE) - (cxy / cxx) * sx) / n AS intercept,
       cxy * cxy / (cxx * cyy) AS r2
FROM cov
"""


@query("stat_ols_regression", oracle=_ols_sql("HUGEINT"), tags=("stats",))
def stat_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source simple linear regression (char length ~ token count) —
    the chars-per-token fit that flags machine-generated or boilerplate
    sources in a corpus audit. One exact hash aggregate produces the
    five integer power sums; slope, intercept, and r² are fixed
    double-precision expressions over them, bit-identical cross-engine.
    Map-side combine does the heavy lifting; output is |sources| rows."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_ols_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# equi-depth histogram (ntile)
# ---------------------------------------------------------------------------

# Total order (price, orderkey) makes ntile assignment deterministic;
# decimal min/max avoid float drift. Shared SQL text.
_EQUIDEPTH_SQL = """
WITH t AS (
  SELECT o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         o_orderkey,
         ntile(4) OVER (PARTITION BY o_orderstatus
                        ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey)
           AS bucket
  FROM orders
)
SELECT o_orderstatus, CAST(bucket AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(price) AS DOUBLE) AS lo,
       CAST(MAX(price) AS DOUBLE) AS hi
FROM t
GROUP BY o_orderstatus, bucket
"""


@query("agg_equidepth_histogram", oracle=_EQUIDEPTH_SQL, tags=("agg", "stats"))
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram of order value per status —
    the optimizer-statistics shape (equal mass per bucket, data-driven
    bounds) vs the equi-width `agg_value_histogram`. ntile over a TOTAL
    order (value, key) is deterministic; per-group range partitioning
    sorts each status's orders once, and bucket bounds come from a
    follow-up hash aggregate. At 100 TB the same result comes cheaper
    from approx_percentile bounds — this op is the exact reference."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_EQUIDEPTH_SQL)


# ---------------------------------------------------------------------------
# join-skew diagnostics (the "do I need to salt?" pre-flight)
# ---------------------------------------------------------------------------

# Group sizes are exact BIGINTs; the share/ratio outputs are single
# IEEE divisions of exact integers — deterministic. Shared SQL text.
_SKEWDIAG_SQL = """
WITH sizes AS (
  SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY o_custkey
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt
  FROM sizes
),
p99 AS (
  SELECT CAST(MIN(cnt) AS BIGINT) AS p99_cnt
  FROM (
    SELECT cnt,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, cnt) AS rk,
           COUNT(*) OVER () AS n
    FROM sizes
  ) r
  WHERE rk <= CAST(ceil(n * 0.01) AS BIGINT)
)
SELECT s.n_keys, s.n_rows, s.max_cnt, p.p99_cnt,
       CAST(s.max_cnt AS DOUBLE) / s.n_rows AS top_key_share,
       CAST(s.max_cnt AS DOUBLE) * s.n_keys / s.n_rows AS skew_factor
FROM stats s CROSS JOIN p99 p
"""


@query("stat_join_skew_diag", oracle=_SKEWDIAG_SQL, tags=("stats", "skew"))
def stat_join_skew_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for orders.o_custkey: hottest-key row
    share, p99 group size, and skew factor (max/mean group ratio) — the
    numbers that decide between a plain shuffle join, AQE skew split,
    or explicit salting (`join_salted_skew`). One hash aggregate for
    group sizes; the p99 group size comes from the two-phase exact
    ordinal over the key-count table (key-cardinality-sized — a global
    rank window here would serialize every join key through one task),
    min-reduced over the top 1% of ranks. skew_factor ~ 1 means
    uniform; >> 1 means the hottest reducer owns the job."""
    import math

    orders = load_table(spark, sf_dir, "orders")
    sizes = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    ranked, n = global_row_number(
        sizes,
        [F.col("cnt").desc(), F.col("key")],
        composite_bucket_key(-F.col("cnt"), F.col("key")),
        out="rk",
    )
    p99 = ranked.where(F.col("rk") <= math.ceil(n * 0.01)).agg(
        F.min("cnt").cast("long").alias("p99_cnt")
    )
    stats = sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    return stats.crossJoin(F.broadcast(p99)).select(
        "n_keys",
        "n_rows",
        "max_cnt",
        "p99_cnt",
        (F.col("max_cnt").cast("double") / F.col("n_rows")).alias(
            "top_key_share"
        ),
        (
            F.col("max_cnt").cast("double") * F.col("n_keys") / F.col("n_rows")
        ).alias("skew_factor"),
    )


# ---------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov test (pure integer arithmetic)
# ---------------------------------------------------------------------------

# D = sup |ECDF_a - ECDF_b| evaluated at the pooled distinct values.
# |cum_a/n_a - cum_b/n_b| maximizes exactly where |cum_a*n_b - cum_b*n_a|
# does, so the supremum is found in EXACT integer arithmetic; only the
# final statistic is one IEEE division. Shared SQL text.
_KS_SQL = """
WITH s AS (
  SELECT n_chars AS v,
         CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_a
  FROM documents WHERE source IN ('src0', 'src1')
),
counts AS (
  SELECT v, CAST(SUM(is_a) AS BIGINT) AS c_a,
         CAST(SUM(1 - is_a) AS BIGINT) AS c_b
  FROM s GROUP BY v
),
cum AS (
  SELECT CAST(SUM(c_a) OVER (ORDER BY v) AS BIGINT) AS cum_a,
         CAST(SUM(c_b) OVER (ORDER BY v) AS BIGINT) AS cum_b
  FROM counts
),
tot AS (
  SELECT CAST(SUM(is_a) AS BIGINT) AS n_a,
         CAST(SUM(1 - is_a) AS BIGINT) AS n_b
  FROM s
)
SELECT t.n_a, t.n_b,
       CAST(MAX(abs(c.cum_a * t.n_b - c.cum_b * t.n_a)) AS BIGINT) AS d_num,
       CAST(t.n_a * t.n_b AS BIGINT) AS d_den,
       CAST(MAX(abs(c.cum_a * t.n_b - c.cum_b * t.n_a)) AS DOUBLE)
         / (t.n_a * t.n_b) AS ks_stat
FROM cum c CROSS JOIN tot t
GROUP BY t.n_a, t.n_b
"""


@query("stat_ks_test", oracle=_KS_SQL, tags=("stats",))
def stat_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic comparing the document
    length distributions of two sources — the distribution-drift test a
    corpus monitor runs between ingestion batches. The ECDF difference
    is maximized in exact cross-multiplied integers (no float ECDFs),
    so the answer is deterministic at any parallelism; the only float
    op is the final d_num/d_den division. One hash aggregate on the
    pooled values, then the two-phase exact prefix sums
    (``operators.ordinal.global_cum``) over the distinct-value table —
    no single-partition window even when the value domain is wide."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.where(F.col("source").isin("src0", "src1")).select(
        F.col("n_chars").alias("v"),
        F.when(F.col("source") == "src0", 1).otherwise(0).alias("is_a"),
    )
    counts = s.groupBy("v").agg(
        F.sum("is_a").cast("long").alias("c_a"),
        F.sum(1 - F.col("is_a")).cast("long").alias("c_b"),
    )
    cum = global_cum(
        counts, [F.col("v")], F.col("v"), F.col("c_a"), out="cum_a"
    )
    cum = global_cum(cum, [F.col("v")], F.col("v"), F.col("c_b"), out="cum_b")
    tot = s.agg(
        F.sum("is_a").cast("long").alias("n_a"),
        F.sum(1 - F.col("is_a")).cast("long").alias("n_b"),
    )
    g = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("n_b")
                    - F.col("cum_b") * F.col("n_a")
                )
            )
            .cast("long")
            .alias("d_num")
        )
    )
    return g.select(
        "n_a",
        "n_b",
        "d_num",
        (F.col("n_a") * F.col("n_b")).cast("long").alias("d_den"),
        (
            F.col("d_num").cast("double") / (F.col("n_a") * F.col("n_b"))
        ).alias("ks_stat"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient (inequality of order value)
# ---------------------------------------------------------------------------

# Exact integer cents + a total order (cents, orderkey) make the ranked
# sum deterministic; the statistic is one fixed double expression over
# exact integer sums. The rank-weighted sum Σi·c is O(n²·c̄) — int64
# died at sf10 (5M rows/group × 1.5e7 cents ≈ 2e20; found by the
# round-10 third-decade oracle replay, ARITHMETIC_OVERFLOW under
# Spark 4's ANSI default) — so that lane and Σc run in the
# DECIMAL(38,0)↔HUGEINT wide pair (cf. ``stat_skew_kurtosis``):
# headroom Σi·c ≤ 1e12² × 5e7 ≈ 5e31 ≪ 1e38 at the 100 TB row target.
# The numerator stays EXACT integer arithmetic in the wide type and is
# cast to DOUBLE once, so values (and hashes) are unchanged wherever
# the old int64 lane didn't overflow.


def _gini_sql(wide: str) -> str:
    return f"""
WITH cents AS (
  SELECT o_orderstatus,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
         o_orderkey
  FROM orders
),
ranked AS (
  SELECT o_orderstatus, c,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY c, o_orderkey) AS i
  FROM cents
),
sums AS (
  SELECT o_orderstatus,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(c AS {wide})) AS {wide}) AS sx,
         CAST(SUM(CAST(i AS {wide}) * c) AS {wide}) AS six
  FROM ranked GROUP BY o_orderstatus
)
SELECT o_orderstatus, n,
       CAST(2 * six - (CAST(n AS {wide}) + 1) * sx AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) AS gini
FROM sums
"""


@query("stat_gini", oracle=_gini_sql("HUGEINT"), tags=("stats",))
def stat_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order value per status — the inequality /
    concentration measure (is revenue spread across orders or owned by
    a few whales?). Uses the ranked-sum identity
    G = (2*sum(i*x_i) - (n+1)*sum(x_i)) / (n*sum(x_i)) over integer
    cents with a total order, so everything up to the final division is
    exact integer arithmetic (wide DECIMAL(38,0) lanes — the int64
    rank-sum overflowed at sf10). One per-group sort window + one hash
    aggregate; output is |statuses| rows."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_gini_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# token-distribution entropy per source (corpus diversity)
# ---------------------------------------------------------------------------

# H = -(sum_t c_t * ln(c_t/T)) / T. Each term's c*ln(c/T) is
# micro-quantized to a BIGINT before summing (the per-term value is the
# only non-correctly-rounded op), so the cross-term sum is exact and
# order-free; the final negate/divide is one fixed double expression.
_ENTROPY_SQL = """
WITH tokens AS (
  SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS term
  FROM documents
),
tc AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM tokens GROUP BY source, term
),
tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM tc GROUP BY source
),
contrib AS (
  SELECT tc.source,
         CAST(floor(tc.c * ln(CAST(tc.c AS DOUBLE) / tot.t) * 1000000)
              AS BIGINT) AS q
  FROM tc JOIN tot ON tc.source = tot.source
)
SELECT c.source, t.t AS n_tokens,
       CAST(SUM(c.q) AS BIGINT) AS neg_sum_micro,
       -(CAST(SUM(c.q) AS DOUBLE) / 1000000) / t.t AS entropy_nats
FROM contrib c JOIN tot t ON c.source = t.source
GROUP BY c.source, t.t
"""


def _entropy_spark_sql() -> str:
    # Spark: split() instead of string_split_regex, explode instead of
    # unnest; the arithmetic text is identical.
    return _ENTROPY_SQL.replace(
        "unnest(string_split_regex(lower(text), '\\s+'))",
        "explode(split(lower(text), '\\\\s+'))",
    )


@query("stat_token_entropy", oracle=_ENTROPY_SQL, tags=("stats", "text"))
def stat_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each source's token distribution — the
    corpus-diversity audit that flags template/boilerplate sources (low
    entropy) before they skew a training mix. Per-(source, term) counts
    from one hash aggregate; each term's c*ln(c/T) contribution is
    micro-quantized so the per-source sum is exact integer arithmetic;
    one final fixed double expression yields nats. All shuffles carry
    vocabulary-sized aggregates, never raw tokens."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_entropy_spark_sql())


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

# Expected Benford share of each leading digit, in exact ppm literals
# (floor(log10(1 + 1/d) * 1e6)) so neither engine computes a log.
_BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}
_BENFORD_CASE = (
    "CASE first_digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items())
    + " END"
)

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substring(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
           AS first_digit
  FROM lineitem
  WHERE l_extendedprice >= 1
),
counted AS (
  SELECT first_digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY first_digit
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counted)
SELECT c.first_digit,
       c.n,
       CAST(c.n * 1000000 // t.t AS BIGINT) AS observed_ppm,
       CAST({_BENFORD_CASE} AS BIGINT) AS benford_ppm,
       CAST(c.n * 1000000 // t.t - {_BENFORD_CASE} AS BIGINT) AS deviation_ppm
FROM counted c CROSS JOIN tot t
"""


@query("stat_benford_digits", oracle=_BENFORD_ORACLE, tags=("stats", "audit"))
def stat_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of extended prices — the standard
    fabricated-data / corruption screen run over financial fact tables.
    Observed shares are exact integer ppm against embedded Benford
    constants (no runtime logarithms), so the comparison is hash-exact.
    One hash aggregate to 9 rows plus a broadcast of the scalar total;
    nothing about the plan changes at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    digits = li.where(F.col("l_extendedprice") >= 1).select(
        F.substring(
            F.floor("l_extendedprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("first_digit")
    )
    counted = digits.groupBy("first_digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counted.agg(F.sum("n").alias("t"))
    return counted.crossJoin(F.broadcast(tot)).selectExpr(
        "first_digit",
        "CAST(n AS BIGINT) AS n",
        "CAST(n * 1000000 DIV t AS BIGINT) AS observed_ppm",
        f"CAST({_BENFORD_CASE} AS BIGINT) AS benford_ppm",
        f"CAST(n * 1000000 DIV t - {_BENFORD_CASE} AS BIGINT) AS deviation_ppm",
    )


# ---------------------------------------------------------------------------
# lag-k autocorrelation of the hourly event-rate series
# ---------------------------------------------------------------------------

# All moments are exact BIGINTs over integer counts; the Pearson r is
# one fixed tree of IEEE ops at the end, so both engines emit the same
# double bit-for-bit (same discipline as the anomaly/corr operators).
# Pairs are (h, h+lag) where BOTH hours observed events — join, not a
# dense-spine fill, so the statistic is over the observed series.
# Quadratic lanes wide (DECIMAL(38,0)↔HUGEINT): hourly counts reach
# ~4.6e8 at the 1e12-row target, so Σx² ≈ 2160·2.1e17 ≈ 4.6e20 and
# n·sxx ≈ 1e24 overflow int64 (round-10 overflow audit).


def _autocorr_sql(wide: str) -> str:
    return f"""
WITH buckets AS (
  SELECT event_type, date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
lags AS (SELECT * FROM (VALUES (1), (2), (3)) t(lag)),
pairs AS (
  SELECT a.event_type, l.lag, a.c AS x, b.c AS y
  FROM buckets a
  JOIN lags l ON TRUE
  JOIN buckets b
    ON b.event_type = a.event_type
   AND b.h = a.h + l.lag * INTERVAL 1 HOUR
),
moments AS (
  SELECT event_type, lag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS {wide}) * x) AS {wide}) AS sxx,
         CAST(SUM(CAST(y AS {wide}) * y) AS {wide}) AS syy,
         CAST(SUM(CAST(x AS {wide}) * y) AS {wide}) AS sxy
  FROM pairs
  GROUP BY event_type, lag
),
cov AS (
  SELECT event_type, lag, n,
         CAST(CAST(n AS {wide}) * sxy - CAST(sx AS {wide}) * sy AS DOUBLE)
           AS cxy,
         CAST(CAST(n AS {wide}) * sxx - CAST(sx AS {wide}) * sx AS DOUBLE)
           AS cxx,
         CAST(CAST(n AS {wide}) * syy - CAST(sy AS {wide}) * sy AS DOUBLE)
           AS cyy
  FROM moments
)
SELECT event_type, CAST(lag AS INT) AS lag, n,
       cxy / (sqrt(cxx) * sqrt(cyy)) AS autocorr
FROM cov
WHERE cxx > 0 AND cyy > 0
"""


@query(
    "stat_autocorrelation",
    oracle=_autocorr_sql("HUGEINT"),
    tags=("stats", "timeseries"),
)
def stat_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1/2/3 autocorrelation of each event type's hourly rate — the
    seasonality screen a capacity planner or anomaly detector runs
    first. Integer moments ride one hash aggregate per (type, lag);
    the lag alignment is an equi-join of the bucket series against
    itself shifted by whole hours (bucket-cardinality-sized, tiny
    relative to the event scan). Shared SQL shape with the oracle."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_autocorr_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# CUSUM change-point detection on the hourly rate series
# ---------------------------------------------------------------------------

# Test statistic kept integral: with S_t the running count sum over the
# first t buckets and S_n, n the totals, the scaled deviation
# D_t = |n·S_t − t·S_n| is exact int64 (counts ≤ 1e12 safe). The
# change-point is argmax_t D_t with min-t tie-break, encoded as
# MAX(D_t * 100000 + (100000 - 1 - t)) so it rides one aggregate.
#
# Encoding headroom (cf. the markov/pca operators' documented bounds):
# the tie-break field assumes t < 100000 hourly buckets (≈ 11.4 years of
# hourly data per event type) and the packed value d*100000 + … needs
# d < ~9.2e13 to stay inside int64 — with n·S_t ≤ n·S_n that means
# n_buckets · total_events per type must stay below ~9.2e13 (e.g. 1e5
# buckets × 9e8 events). Past either bound, non-ANSI Spark wraps int64
# while DuckDB raises — widen the 100000 radix and the d bound together
# if a deployment ever approaches them.
_CUSUM_SQL = """
WITH buckets AS (
  SELECT event_type, date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
ordered AS (
  SELECT event_type, h, c,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS t,
         SUM(c) OVER (PARTITION BY event_type ORDER BY h
                      ROWS UNBOUNDED PRECEDING) AS s_t
  FROM buckets
),
tot AS (
  SELECT event_type, CAST(MAX(t) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s_n
  FROM ordered GROUP BY event_type
),
dev AS (
  SELECT o.event_type, o.t, o.h,
         abs(tt.n * o.s_t - o.t * tt.s_n) AS d
  FROM ordered o JOIN tot tt ON tt.event_type = o.event_type
),
best AS (
  SELECT event_type,
         CAST(MAX(d * 100000 + (100000 - 1 - t)) AS BIGINT) AS enc
  FROM dev GROUP BY event_type
)
SELECT b.event_type,
       CAST(b.enc // 100000 AS BIGINT) AS d_max,
       CAST(100000 - 1 - b.enc % 100000 AS BIGINT) AS change_t,
       d2.h AS change_hour,
       tt.n AS n_buckets,
       tt.s_n AS total_events
FROM best b
JOIN tot tt ON tt.event_type = b.event_type
JOIN dev d2 ON d2.event_type = b.event_type
           AND d2.t = 100000 - 1 - b.enc % 100000
"""


@query("stat_cusum_changepoint", oracle=_CUSUM_SQL, tags=("stats", "timeseries"))
def stat_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point scan per event type: the hour where the
    cumulative count deviates most from a constant-rate line — the
    first tool reached for when a telemetry rate shifts. The deviation
    |n·S_t − t·S_n| stays integral end to end, and the argmax (min-t
    tie-break) is encoded into one MAX aggregate, so the whole scan is
    a window pass plus two hash aggregates, no driver data."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_CUSUM_SQL.replace("//", "DIV"))


# ---------------------------------------------------------------------------
# seasonality profile: hour-of-day shape per event type
# ---------------------------------------------------------------------------

_SEASONALITY_SQL = """
WITH by_hour AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, hour(ts)
),
tot AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS t FROM by_hour GROUP BY event_type
),
shaped AS (
  SELECT b.event_type, b.hod, b.c,
         CAST(b.c * 1000000 // t.t AS BIGINT) AS share_ppm,
         row_number() OVER (PARTITION BY b.event_type
                            ORDER BY b.c DESC, b.hod) AS peak_rank
  FROM by_hour b JOIN tot t ON t.event_type = b.event_type
)
SELECT event_type, hod, c, share_ppm,
       (peak_rank = 1) AS is_peak_hour
FROM shaped
"""


@query("stat_seasonality_profile", oracle=_SEASONALITY_SQL, tags=("stats", "timeseries"))
def stat_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day load shape per event type (exact ppm shares, peak
    hour flagged under a tie-broken total order) — the diurnal profile
    capacity planning and anomaly baselines start from. One 24×|types|
    hash aggregate plus a broadcast-sized share join; nothing about the
    plan changes with event volume."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_SEASONALITY_SQL.replace("//", "DIV"))


# ---------------------------------------------------------------------------
# Mann-Whitney U rank-sum test
# ---------------------------------------------------------------------------

# Nonparametric two-sample test ('click' vs 'purchase' values): ranks
# are kept integral by working in DOUBLED rank units (tie-average rank
# r + (t-1)/2 becomes 2r + t - 1, an exact integer), so the rank sum
# and U statistic are pure int64; the normal-approximation z is one
# fixed IEEE expression at the end. Shared SQL text.
#
# The variance product n1*n2*(n1+n2+1) is CUBIC in sample size and
# must multiply in DOUBLE, not int64 (each factor < 2^53 converts
# exactly; the int64 product overflows past ~2.1M rows per group —
# found by the round-10 sf10 oracle replay, where 10M events aborted
# with ARITHMETIC_OVERFLOW). Both shared texts use the identical
# double-product expression tree, so the engines stay bit-identical.
#
# Remaining (documented) width cliff: the DOUBLED rank-sum lanes
# r1_doubled/u1_doubled are OUTPUT columns ~ n² and the centering
# product n1*(n1+1) is int64 — both die loudly (ANSI) at ~3e9 rows per
# group. That is a reporting-width choice shared by both engines (same
# class as stat_wilcoxon_signed_rank's w_plus_x2), not a silent-wrong
# lane; the z statistic itself is double-safe to that point.
_MWU_SQL = """
WITH samples AS (
  SELECT event_type AS grp,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
),
ranked AS (
  SELECT grp, cents,
         rank() OVER (ORDER BY cents) AS r,
         COUNT(*) OVER (PARTITION BY cents) AS t
  FROM samples
),
sums AS (
  SELECT
    CAST(SUM(CASE WHEN grp = 'click' THEN 2 * r + t - 1 ELSE 0 END) AS BIGINT)
      AS r1_doubled,
    CAST(SUM(CASE WHEN grp = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM ranked
)
SELECT n1, n2,
       CAST((r1_doubled - n1 * (n1 + 1)) AS BIGINT) AS u1_doubled,
       (CAST(r1_doubled - n1 * (n1 + 1) AS DOUBLE) / 2.0
        - CAST(n1 * n2 AS DOUBLE) / 2.0)
       / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
              * CAST(n1 + n2 + 1 AS DOUBLE) / 12.0) AS z_score
FROM sums
"""


@query("stat_mann_whitney", oracle=_MWU_SQL, tags=("stats",))
def stat_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test comparing click vs purchase value
    distributions — the nonparametric alternative to the t-test (cf.
    stat_welch_ttest) that survives heavy tails. Doubled-rank units
    keep every accumulation int64-exact (tie handling included). The
    rank never materializes per ROW: the doubled tie-average rank
    2r + t - 1 is a function of each distinct VALUE (r = 1 + #smaller
    rows, t = rows at the value), so one per-value aggregate + the
    two-phase exact prefix sum (``operators.ordinal.global_cum``,
    exclusive) replace the oracle's sample-sized global rank window,
    then a single-row aggregate folds U and z."""
    ev = load_table(spark, sf_dir, "events")
    samples = ev.where(F.col("event_type").isin("click", "purchase")).select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    per = samples.groupBy("cents").agg(
        F.sum(F.when(F.col("grp") == "click", 1).otherwise(0))
        .cast("long")
        .alias("n1_v"),
        F.count(F.lit(1)).cast("long").alias("t_v"),
    )
    per = global_cum(
        per,
        [F.col("cents")],
        F.col("cents"),
        F.col("t_v"),
        inclusive=False,
        out="cumlt",
    ).withColumn("cumlt", F.coalesce(F.col("cumlt"), F.lit(0)))
    # per-row doubled tie-average rank 2r + t - 1 = 2*cumlt + t_v + 1
    sums = per.agg(
        F.sum(F.col("n1_v") * (2 * F.col("cumlt") + F.col("t_v") + 1))
        .cast("long")
        .alias("r1_doubled"),
        F.sum("n1_v").cast("long").alias("n1"),
        F.sum(F.col("t_v") - F.col("n1_v")).cast("long").alias("n2"),
    )
    return sums.select(
        "n1",
        "n2",
        F.expr("CAST((r1_doubled - n1 * (n1 + 1)) AS BIGINT)").alias(
            "u1_doubled"
        ),
        F.expr(
            "(CAST(r1_doubled - n1 * (n1 + 1) AS DOUBLE) / 2.0"
            " - CAST(n1 * n2 AS DOUBLE) / 2.0)"
            " / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
            " * CAST(n1 + n2 + 1 AS DOUBLE) / 12.0)"
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# population-stability drift between time halves (PSI)
# ---------------------------------------------------------------------------

# Corpus-refresh drift monitoring: split events at the midpoint of the
# observed time range and compare the event-type mix of the two halves
# with the Population Stability Index, PSI = sum (p-q) * ln(p/q).
# Shares use Laplace smoothing (+1 / +k) so ln never sees zero. All
# counts are exact integers; each per-type PSI term is a fixed tree of
# IEEE double ops quantized to integer nanos (floor(term*1e9 + 0.5))
# before the cross-type total, so the sum is fold-order-free (the same
# quantize-then-sum discipline as the chi-square test above).
_PSI_ORACLE = """
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS us FROM events
),
bounds AS (
  SELECT MIN(us) AS lo, MAX(us) AS hi FROM ev
),
tagged AS (
  SELECT event_type,
         CASE WHEN us > lo + (hi - lo) // 2 THEN 1 ELSE 0 END AS late
  FROM ev, bounds
),
counts AS (
  SELECT event_type,
         CAST(SUM(1 - late) AS BIGINT) AS n_early,
         CAST(SUM(late) AS BIGINT) AS n_late
  FROM tagged GROUP BY event_type
),
shares AS (
  SELECT event_type, n_early, n_late,
         CAST(n_early + 1 AS DOUBLE)
           / (SUM(n_early) OVER () + COUNT(*) OVER ()) AS p_early,
         CAST(n_late + 1 AS DOUBLE)
           / (SUM(n_late) OVER () + COUNT(*) OVER ()) AS p_late
  FROM counts
),
terms AS (
  SELECT event_type, n_early, n_late, p_early, p_late,
         CAST(floor((p_early - p_late) * ln(p_early / p_late) * 1000000000
                    + 0.5) AS BIGINT) AS psi_term_nano
  FROM shares
)
SELECT event_type, n_early, n_late, p_early, p_late, psi_term_nano,
       CAST(SUM(psi_term_nano) OVER () AS BIGINT) AS psi_total_nano
FROM terms
"""


@query("stat_psi_drift", oracle=_PSI_ORACLE, tags=("stats", "drift"))
def stat_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift of the event-type mix between the first and second half
    of the time range — the pre-ship gate a corpus refresh runs ("did
    the source mix move?"). One scan + one tiny aggregate per half;
    the scalar time bounds ride a 1-row broadcast (the same
    constant-size combine the graph operators use), so nothing about
    the shape changes at 100 TB."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("us")
    )
    bounds = ev.agg(F.min("us").alias("lo"), F.max("us").alias("hi"))
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(
            F.col("us") > F.col("lo") + F.expr("(hi - lo) DIV 2"), 1
        ).otherwise(0).alias("late"),
    )
    counts = tagged.groupBy("event_type").agg(
        F.sum(1 - F.col("late")).cast("long").alias("n_early"),
        F.sum("late").cast("long").alias("n_late"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    p_early = (F.col("n_early") + 1).cast("double") / (
        F.sum("n_early").over(w) + F.count(F.lit(1)).over(w)
    )
    p_late = (F.col("n_late") + 1).cast("double") / (
        F.sum("n_late").over(w) + F.count(F.lit(1)).over(w)
    )
    shares = counts.select(
        "event_type",
        "n_early",
        "n_late",
        p_early.alias("p_early"),
        p_late.alias("p_late"),
    )
    term_nano = F.floor(
        (F.col("p_early") - F.col("p_late"))
        * F.log(F.col("p_early") / F.col("p_late"))
        * 1000000000
        + 0.5
    ).cast("long")
    terms = shares.withColumn("psi_term_nano", term_nano)
    return terms.withColumn(
        "psi_total_nano", F.sum("psi_term_nano").over(w).cast("long")
    )


# ---------------------------------------------------------------------------
# deterministic bootstrap confidence interval
# ---------------------------------------------------------------------------

# Bootstrap the mean order price with B=50 replicates. Replicate weights
# are a deterministic Poisson(1) surrogate: a Knuth multiplicative hash
# of (orderkey, replicate) mapped through the exact integer thresholds
# of the Poisson(1) inverse CDF (the classic "Poisson bootstrap" that
# makes resampling-with-replacement embarrassingly parallel — each row
# decides its own replicate multiplicities, no global sampling state).
# Weighted sums are exact BIGINT (weight 0-5 x cents); each replicate
# mean is one double divide; the CI is rank-selection over the 50
# replicate means (no float accumulation anywhere).
_BOOT_THRESHOLDS = (790015083, 1580030167, 1975037709, 2106706890, 2139624185)
_BOOT_B = 50

_BOOT_CASE = (
    "CASE WHEN h < 790015083 THEN 0 WHEN h < 1580030167 THEN 1 "
    "WHEN h < 1975037709 THEN 2 WHEN h < 2106706890 THEN 3 "
    "WHEN h < 2139624185 THEN 4 ELSE 5 END"
)

_BOOT_ORACLE = f"""
WITH cents AS (
  SELECT o_orderkey AS k,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
hashed AS (
  SELECT b.range AS b, c,
         (k * 2654435761 + b.range * 40503 + 7919) % 2147483647 AS h
  FROM cents CROSS JOIN range({_BOOT_B}) b
),
weighted AS (
  SELECT b, c, {_BOOT_CASE} AS w FROM hashed
),
reps AS (
  SELECT b,
         CAST(SUM(w) AS BIGINT) AS n_eff,
         CAST(SUM(w * c) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mean_cents
  FROM weighted GROUP BY b
),
ranked AS (
  SELECT b, n_eff, mean_cents,
         row_number() OVER (ORDER BY mean_cents, b) AS rk
  FROM reps
)
SELECT CASE rk WHEN 3 THEN 'p05' WHEN 25 THEN 'p50' WHEN 48 THEN 'p95' END
         AS stat,
       mean_cents, CAST(b AS BIGINT) AS replicate, n_eff
FROM ranked WHERE rk IN (3, 25, 48)
"""


@query("stat_bootstrap_ci", oracle=_BOOT_ORACLE, tags=("stats",))
def stat_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 90% CI for the mean order price (p05/p50/p95 of
    50 replicate means). The replicate fan-out is a map-side explode
    (x50 rows, no shuffle until the per-replicate aggregate, which
    map-side-combines down to 50 partials per partition); weights are
    per-row deterministic hashes, so the whole resample is one pass and
    reproducible anywhere. At 100 TB the same plan holds — the only
    growth is the x B explode, which partial aggregation absorbs."""
    cents = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    hashed = cents.select(
        "k", "c", F.explode(F.expr(f"sequence(0, {_BOOT_B - 1})")).alias("b")
    ).withColumn(
        "h", F.expr("(k * 2654435761 + b * 40503 + 7919) % 2147483647")
    )
    weighted = hashed.withColumn("w", F.expr(_BOOT_CASE))
    reps = weighted.groupBy("b").agg(
        F.sum("w").cast("long").alias("n_eff"),
        (
            F.sum(F.col("w") * F.col("c")).cast("double")
            / F.sum("w").cast("double")
        ).alias("mean_cents"),
    )
    from pyspark.sql import Window

    rk = F.row_number().over(Window.orderBy("mean_cents", "b"))
    ranked = reps.withColumn("rk", rk).filter(F.col("rk").isin(3, 25, 48))
    return ranked.select(
        F.when(F.col("rk") == 3, "p05")
        .when(F.col("rk") == 25, "p50")
        .otherwise("p95")
        .alias("stat"),
        "mean_cents",
        F.col("b").cast("long").alias("replicate"),
        "n_eff",
    )


# ---------------------------------------------------------------------------
# difference-in-differences estimator
# ---------------------------------------------------------------------------

# The standard quasi-experimental readout: treated vs control cohorts,
# pre vs post periods, DiD = (T_post − T_pre) − (C_post − C_pre). Cohort
# and period are derived deterministically (even/odd user_id; calendar
# split at the corpus midpoint timestamp), spend is exact integer cents,
# and every mean is a single double division of two exact BIGINTs — the
# same shared-text IEEE-exact discipline as the t-test above.
_DID_SQL = """
WITH bounds AS (
  SELECT CAST(MIN(epoch_us(ts)) AS BIGINT) AS lo,
         CAST(MAX(epoch_us(ts)) AS BIGINT) AS hi
  FROM events
),
labeled AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'treated' ELSE 'control' END
           AS cohort,
         CASE WHEN CAST(epoch_us(ts) AS BIGINT) * 2 < lo + hi
              THEN 'pre' ELSE 'post' END AS period,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events, bounds
),
cells AS (
  SELECT cohort, period,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s,
         CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mean_cents
  FROM labeled GROUP BY cohort, period
)
SELECT t_post.mean_cents - t_pre.mean_cents AS treated_delta,
       c_post.mean_cents - c_pre.mean_cents AS control_delta,
       (t_post.mean_cents - t_pre.mean_cents)
         - (c_post.mean_cents - c_pre.mean_cents) AS did_cents,
       t_pre.n AS n_treated_pre, t_post.n AS n_treated_post,
       c_pre.n AS n_control_pre, c_post.n AS n_control_post
FROM cells t_pre, cells t_post, cells c_pre, cells c_post
WHERE t_pre.cohort = 'treated' AND t_pre.period = 'pre'
  AND t_post.cohort = 'treated' AND t_post.period = 'post'
  AND c_pre.cohort = 'control' AND c_pre.period = 'pre'
  AND c_post.cohort = 'control' AND c_post.period = 'post'
"""

_DID_SPARK = _DID_SQL.replace("epoch_us(ts)", "unix_micros(ts)")


@query("stat_did_estimator", oracle=_DID_SQL, tags=("stats", "causal"))
def stat_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: treated (even user_id) vs control,
    pre vs post the corpus midpoint, on mean spend cents. One grouped
    aggregate produces the four cells; the estimator is a fixed tree of
    IEEE double ops over exact integer moments, so both engines agree
    bitwise. The midpoint test uses ``2·ts < lo+hi`` — integer-exact,
    no division.

    Scale shape: bounds are one min/max aggregate (broadcast scalar);
    the cell aggregate is partial+final over 4 groups; the final pivot
    is a 4-row cross join. Nothing driver-side, nothing quadratic."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_DID_SPARK)


# ---------------------------------------------------------------------------
# mutual information (event type × cohort)
# ---------------------------------------------------------------------------

# MI(X;Y) = Σ_ij (n_ij/N) · ln(n_ij·N / (n_i·n_j)) — the
# feature-selection companion to the chi-square test above, over the
# same contingency table. The ln argument is a ratio of exact BIGINT
# products (ln is evaluated on the identical double in both engines),
# each cell contribution is quantized to nano-nats BEFORE the sum, and
# the sum is therefore an exact BIGINT — the chi2 operator's
# quantize-then-sum discipline verbatim. n_ij ≥ 1 for present cells, so
# the log argument is always positive.
_MI_SQL = """
WITH cells AS (
  SELECT event_type, CAST(user_id % 2 AS BIGINT) AS cohort,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM events
  GROUP BY event_type, user_id % 2
),
tot AS (
  SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells
),
margins AS (
  SELECT c.event_type, c.cohort, c.obs,
         CAST(SUM(c.obs) OVER (PARTITION BY c.event_type) AS BIGINT) AS row_tot,
         CAST(SUM(c.obs) OVER (PARTITION BY c.cohort) AS BIGINT) AS col_tot
  FROM cells c
),
contrib AS (
  SELECT m.event_type, m.cohort,
         CAST(floor(
           CAST(m.obs AS DOUBLE) / t.n
           * ln(CAST(m.obs AS DOUBLE) * t.n
                / (CAST(m.row_tot AS DOUBLE) * m.col_tot))
           * 1000000000) AS BIGINT) AS q_nano
  FROM margins m CROSS JOIN tot t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(q_nano) AS BIGINT) AS mi_nano_nats
FROM contrib
"""


@query("stat_mutual_information", oracle=_MI_SQL, tags=("stats",))
def stat_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and user-id-parity cohort
    in nano-nats — near zero when the A/B hash split is healthy, which
    makes it the continuous companion to ``stat_chi2_independence``'s
    yes/no verdict (and the ranking criterion feature selection uses).
    Same contingency shape, same quantize-then-sum exactness argument;
    shared SQL text on both engines."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_MI_SQL)


# ---------------------------------------------------------------------------
# higher-moment sketch: skewness / kurtosis from mergeable power sums
# ---------------------------------------------------------------------------

# The moment sketch: per group keep (n, Σx, Σx², Σx³, Σx⁴) — five exact
# integers, associative + commutative, so Spark evaluates them as
# partial+final hash aggregates with constant per-group state (the same
# mergeability story as the HLL/KMV sketches, but for distribution
# SHAPE). cents⁴ ≈ 5.8e18 per row exceeds int64 once summed, so the two
# high power sums ride a wide integer lane: DECIMAL(38,0) in Spark,
# HUGEINT in DuckDB — both exact, both cast-to-double *once* at the end,
# so every derived double is the result of the identical IEEE op tree.
# Headroom: Σcents⁴ at 1e12 rows ≈ 5.8e30 ≪ 1e38 — the lane survives
# 100 TB with ~7 orders of magnitude to spare.


def _moments_sql(wide_cast: str) -> str:
    # central moments from raw power sums (m ≡ mean):
    # m2 = S2/n − m²; m3 = S3/n − 3m·S2/n + 2m³;
    # m4 = S4/n − 4m·S3/n + 6m²·S2/n − 3m⁴
    return f"""
WITH vals AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
sums AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2,
         CAST(CAST(SUM(CAST(c AS {wide_cast}) * c * c) AS DOUBLE) AS DOUBLE) AS s3,
         CAST(CAST(SUM(CAST(c AS {wide_cast}) * c * c * c) AS DOUBLE) AS DOUBLE) AS s4
  FROM vals
  GROUP BY event_type
),
cm AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n AS m,
         CAST(s2 AS DOUBLE) / n
           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2,
         s3 / n
           - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
           + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s1 AS DOUBLE) / n) AS m3,
         s4 / n
           - 4.0 * (CAST(s1 AS DOUBLE) / n) * (s3 / n)
           + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s2 AS DOUBLE) / n)
           - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m4
  FROM sums
)
SELECT event_type, n,
       CAST(floor(m * 1000) AS BIGINT) AS mean_millicents,
       CAST(floor(sqrt(m2) * 1000) AS BIGINT) AS stddev_millicents,
       CAST(floor(m3 / (m2 * sqrt(m2)) * 1000000) AS BIGINT) AS skew_ppm,
       CAST(floor((m4 / (m2 * m2) - 3.0) * 1000000) AS BIGINT)
         AS excess_kurtosis_ppm
FROM cm
"""


@query(
    "stat_skew_kurtosis",
    oracle=_moments_sql("HUGEINT"),
    tags=("stats", "sketch"),
)
def stat_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shape profile per event type: skewness g1 and excess
    kurtosis g2 from the mergeable moment sketch (n, Σx … Σx⁴) — how a
    100 TB pipeline detects heavy tails / bimodality in a metric without
    a second pass or any quantile state. One hash aggregate with
    map-side combine; per-group state is five wide integers.

    Determinism: power sums are exact (BIGINT lanes for Σx, Σx²; a
    DECIMAL(38,0)↔HUGEINT lane for Σx³, Σx⁴), cast to DOUBLE once; the
    central-moment formulas are the same literal IEEE op tree in both
    engines, and outputs land as floor-scaled BIGINTs."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_moments_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# Spearman rank correlation: monotone-association profile per group
# ---------------------------------------------------------------------------

# Ranks use RANK() (min-rank on ties) over the bare value — no tie-break
# columns needed, because tied values receive the SAME rank in both
# engines by definition; Pearson-on-ranks is then a pure function of the
# multiset of (rx, ry) pairs. Headroom: with per-group n rows, rank
# sums obey Σr ≤ n², Σr² and Σrx·ry ≤ n³ — int64 died at sf10 (24M
# rows/group → Σr² ≈ 1.4e22; found by the round-10 third-decade oracle
# replay, ARITHMETIC_OVERFLOW under Spark 4's ANSI default), so ALL
# five rank-sum lanes run in the DECIMAL(38,0)↔HUGEINT wide pair like
# ``stat_skew_kurtosis``: n³ ≤ 1e36 < 1e38 even at 1e12 rows per
# group. The closed form runs on doubles cast once from those exact
# integers (identical IEEE op tree both engines) and lands as a
# floor-scaled ppm BIGINT — values unchanged wherever int64 sufficed.


def _spearman_sql(wide: str) -> str:
    return f"""
WITH ranked AS (
  SELECT l_returnflag AS flag,
         CAST(RANK() OVER (PARTITION BY l_returnflag
                           ORDER BY l_quantity) AS BIGINT) AS rx,
         CAST(RANK() OVER (PARTITION BY l_returnflag
                           ORDER BY l_extendedprice) AS BIGINT) AS ry
  FROM lineitem
),
sums AS (
  SELECT flag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(rx AS {wide})) AS {wide}) AS sx,
         CAST(SUM(CAST(ry AS {wide})) AS {wide}) AS sy,
         CAST(SUM(CAST(rx AS {wide}) * ry) AS {wide}) AS sxy,
         CAST(SUM(CAST(rx AS {wide}) * rx) AS {wide}) AS sx2,
         CAST(SUM(CAST(ry AS {wide}) * ry) AS {wide}) AS sy2
  FROM ranked
  GROUP BY flag
)
SELECT flag, n,
       CAST(floor(
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * sqrt(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         * 1000000) AS BIGINT) AS spearman_ppm
FROM sums
"""


@query("stat_spearman", oracle=_spearman_sql("HUGEINT"), tags=("stats", "window"))
def stat_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and extended price per
    return flag — the robust (monotone, outlier-insensitive) companion
    to ``agg_corr_stddev``'s Pearson. Drift monitors prefer it because a
    single corrupted extreme row cannot move a rank more than one slot.

    Scale shape: two ranking windows partitioned by the group key (one
    shuffle on l_returnflag; within-partition sorts are Tungsten
    spillable), then one partial+final hash aggregate down to one row
    per group. At 100 TB the windows dominate — they parallelize per
    group, so skewed group sizes are the thing to watch (salt-rank via
    two-level aggregation if one flag carries most rows).

    Determinism: min-rank ties, exact int64 rank sums, one cast to
    DOUBLE, identical closed-form op tree both engines (see lane
    headroom note above)."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_spearman_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# Zipf exponent fit: log-log OLS over the token rank-frequency curve
# ---------------------------------------------------------------------------

_ZIPF_FIT_K = 256  # head ranks to fit over

# Quantize each ln() term to integer micro-units BEFORE summing
# (stat_chi2/token_entropy discipline): the per-term floor makes the
# 256-term sums fold-order-exact; the OLS closed form then runs on
# doubles cast from those exact integers. Headroom: |xq| ≤ ln(256)·1e6
# ≈ 5.5e6, |yq| ≤ ln(1e12)·1e6 ≈ 2.8e7, so Σxq·yq ≤ 256·1.6e14 ≈ 4e16
# — inside int64 with ~200× headroom.


def _zipf_fit_sql(split_toks: str) -> str:
    return f"""
WITH toks AS (
  SELECT t AS tok FROM {split_toks}
  WHERE t <> ''
),
freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok
),
ranked AS (
  SELECT tok, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rk
  FROM freq
),
head AS (
  SELECT CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000000) AS BIGINT) AS xq,
         CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS yq
  FROM ranked WHERE rk <= {_ZIPF_FIT_K}
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(xq) AS BIGINT) AS sx,
         CAST(SUM(yq) AS BIGINT) AS sy,
         CAST(SUM(xq * yq) AS BIGINT) AS sxy,
         CAST(SUM(xq * xq) AS BIGINT) AS sxx
  FROM head
)
SELECT m AS n_ranks,
       CAST(floor(
         -(CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * 1000000
       ) AS BIGINT) AS alpha_ppm,
       CAST(floor(
         CAST(sy AS DOUBLE) / m
         - (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
           * (CAST(sx AS DOUBLE) / m)
       ) AS BIGINT) AS ln_c_micro
FROM sums
"""


_ZIPF_FIT_ORACLE = _zipf_fit_sql(
    r"documents, unnest(regexp_split_to_array(lower(text), '\s+')) AS u(t)"
)


@query("stat_zipf_alpha", oracle=_ZIPF_FIT_ORACLE, tags=("stats", "text"))
def stat_zipf_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent fit: OLS of ln(freq) on ln(rank) over the top-256
    token ranks — the one-number language-health check (natural text
    sits near α ≈ 1; α drifting low flags boilerplate/templated
    contamination; cf. the raw head profile in ``text_zipf_ranks``).

    Scale shape: token counting is the vocabulary-width partial+final
    aggregate; rank selection is a global top-k; the fit itself runs on
    a CONSTANT 256-row frame with exact integer-quantized log terms, so
    both the sums and the closed-form α are bit-identical cross-engine.
    """
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        _zipf_fit_sql(
            r"(SELECT explode(split(lower(text), '\\s+')) AS t FROM documents)"
        )
    )


# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR correction over per-group mean-shift tests
# ---------------------------------------------------------------------------

# Per event type: Welch z of that type's value mean vs the REST of the
# stream (leave-one-out, from exact power sums — no second pass), a
# logistic approximation of the two-sided normal p-value (Bowling 2009:
# Phi(z) ~ 1/(1+exp(-1.702 z)), max abs error ~0.01 — an explicitly
# documented approximation, the SAME closed form in both engines), then
# the BH step-up rule at alpha = 0.05 entirely in integer arithmetic:
# reject ranks 1..max{ i : p_i * m <= i * alpha }.
_BH_ALPHA_MICRO = 50_000  # 0.05 in micro-units

# Σc² lane wide (DECIMAL(38,0)↔HUGEINT): ≈1e20 at the 1e12-row target.
_BH_TEMPLATE = """
WITH vals AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
grp AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n1,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(CAST(c AS {wide}) * c) AS {wide}) AS q1
  FROM vals GROUP BY event_type
),
tot AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS n_all,
         CAST(SUM(s1) AS BIGINT) AS s_all,
         CAST(SUM(q1) AS {wide}) AS q_all,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM grp
),
welch AS (
  SELECT g.event_type, g.n1, t.m,
         (CAST(g.s1 AS DOUBLE) / g.n1
          - CAST(t.s_all - g.s1 AS DOUBLE) / (t.n_all - g.n1))
         / sqrt(
             (CAST(g.q1 AS DOUBLE)
              - CAST(g.s1 AS DOUBLE) * g.s1 / g.n1) / (g.n1 - 1) / g.n1
             + (CAST(t.q_all - g.q1 AS DOUBLE)
                - CAST(t.s_all - g.s1 AS DOUBLE) * (t.s_all - g.s1)
                  / (t.n_all - g.n1)) / (t.n_all - g.n1 - 1)
               / (t.n_all - g.n1)
           ) AS z
  FROM grp g CROSS JOIN tot t
),
pvals AS (
  SELECT event_type, n1, m,
         CAST(floor(z * 1000) AS BIGINT) AS z_milli,
         CAST(floor(2000000 / (1 + exp(1.702 * abs(z)))) AS BIGINT)
           AS p_micro
  FROM welch
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY p_micro, event_type) AS rk
  FROM pvals
),
cutoff AS (
  SELECT *,
         MAX(CASE WHEN p_micro * m <= rk * {alpha} THEN rk END) OVER ()
           AS max_sig
  FROM ranked
)
SELECT event_type, n1 AS n, z_milli, p_micro,
       CAST(rk AS INT) AS p_rank,
       rk <= COALESCE(max_sig, 0) AS significant
FROM cutoff
"""


def _bh_sql(wide: str) -> str:
    return _BH_TEMPLATE.format(alpha=_BH_ALPHA_MICRO, wide=wide)


@query("stat_benjamini_hochberg", oracle=_bh_sql("HUGEINT"), tags=("stats",))
def stat_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BH false-discovery-rate correction over the family of per-type
    mean-shift tests — what an experimentation/drift platform runs when
    it tests MANY segments at once and raw p < 0.05 would drown it in
    false positives. One corpus-sized moment aggregate; everything
    after runs on |types| rows (window over a broadcast-scale frame).

    Determinism: exact int64 power sums cast to DOUBLE once; the Welch
    z, the documented logistic Phi approximation, and the floor
    quantizations are the same literal op tree in both engines; the BH
    step-up comparison is pure integer arithmetic."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_bh_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# median-of-means: the mergeable robust mean estimator
# ---------------------------------------------------------------------------

# Rows hash into K buckets (Knuth mix on event_id — engine-neutral);
# each bucket keeps (sum, count) — constant mergeable state, exactly
# like a distributed aggregate shard — and the estimator is the median
# of the K bucket means. One adversarial/heavy-tailed shard moves ONE
# bucket, not the estimate: the streaming-robust alternative to the
# plain mean, at K integers of state per group.
_MOM_K = 16

_MOM_SQL = f"""
WITH vals AS (
  SELECT event_type,
         (event_id * 2654435761) % {_MOM_K} AS b,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
buckets AS (
  SELECT event_type, b,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM vals GROUP BY event_type, b
),
means AS (
  SELECT event_type, CAST(s AS DOUBLE) / n AS m, s, n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(s AS DOUBLE) / n, b) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS nb
  FROM buckets
)
SELECT event_type,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(MAX(nb) AS BIGINT) AS n_buckets,
       CAST(floor((MAX(CASE WHEN rk = floor((nb + 1) / 2) THEN m END)
                   + MAX(CASE WHEN rk = floor((nb + 2) / 2) THEN m END))
                  / 2 * 1000) AS BIGINT) AS mom_millicents,
       CAST(floor(CAST(SUM(s) AS DOUBLE) / SUM(n) * 1000) AS BIGINT)
         AS mean_millicents
FROM means
GROUP BY event_type
"""


@query("agg_median_of_means", oracle=_MOM_SQL, tags=("agg", "stats", "sketch"))
def agg_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means per event type next to the plain mean — the
    mergeable robust location estimator (K=16 hash buckets of
    (sum, count) state; the estimate is the median bucket mean). The
    state is K pairs of integers per group: it merges map-side exactly
    like any partial aggregate, which is what makes it deployable at
    100 TB where a true median would need a sort or a sketch.

    Determinism: Knuth-mix bucketing (no engine RNG), exact integer
    (sum, count) lanes, bucket means as one double division each, and
    the doubled-rank median with a b tie-break."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_MOM_SQL)


# ---------------------------------------------------------------------------
# CUPED: variance-reduced experiment readout from pre-period covariates
# ---------------------------------------------------------------------------

# theta = cov(x, y) / var(x) over ALL users (pre-period spend x predicts
# experiment-period spend y); the adjusted variant means come from the
# CLOSED FORM mean(y_v) - theta*(mean(x_v) - mean(x)) — aggregates only,
# no per-user adjusted column ever materializes. Sums are exact int64
# (headroom: sum(x*y) <= users * (1e6 cents)^2 ≈ 2e15 at sf0.1; widen
# to the DECIMAL(38,0)/HUGEINT lane past ~1e9-row user tables).
_CUPED_SQL = """
WITH per_user AS (
  SELECT user_id,
         user_id % 2 AS variant,
         CAST(SUM(CASE WHEN day(ts) <= 15
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN day(ts) > 15
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events
  GROUP BY user_id
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sx2
  FROM per_user
),
theta AS (
  SELECT (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / (CAST(n AS DOUBLE) * sx2 - CAST(sx AS DOUBLE) * sx) AS th,
         CAST(sx AS DOUBLE) / n AS xbar
  FROM g
),
v AS (
  SELECT variant,
         CAST(COUNT(*) AS BIGINT) AS n_v,
         CAST(SUM(x) AS BIGINT) AS sx_v,
         CAST(SUM(y) AS BIGINT) AS sy_v
  FROM per_user
  GROUP BY variant
)
SELECT CAST(v.variant AS BIGINT) AS variant,
       v.n_v AS n_users,
       CAST(floor(CAST(v.sy_v AS DOUBLE) * 1000 / v.n_v) AS BIGINT)
         AS mean_y_millicents,
       CAST(floor((CAST(v.sy_v AS DOUBLE)
                   - t.th * (CAST(v.sx_v AS DOUBLE) - v.n_v * t.xbar))
                  * 1000 / v.n_v) AS BIGINT) AS mean_y_cuped_millicents,
       CAST(floor(t.th * 1000000) AS BIGINT) AS theta_micro
FROM v CROSS JOIN theta t
"""


@query("evt_cuped", oracle=_CUPED_SQL, tags=("stats", "events"))
def evt_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the hash-split experiment readout:
    pre-period spend (days 1-15) is the covariate, experiment-period
    spend (days 16-30) the metric; theta comes from pooled exact moment
    sums and the adjusted variant means from the closed form — the
    standard way an experimentation platform doubles its effective
    sample size without waiting longer. Pairs with
    ``stat_did_estimator`` (parallel-trends counterfactual) and
    ``stat_welch_ttest`` (the unadjusted test).

    Scale shape: one user-keyed aggregate, then scalar/2-row frames;
    nothing after the first aggregate grows with data. Determinism:
    exact int64 sums cast to DOUBLE once, identical closed-form tree,
    floor-scaled outputs."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_CUPED_SQL)


# ---------------------------------------------------------------------------
# power analysis: minimum detectable effect at current sample size
# ---------------------------------------------------------------------------

# MDE (two-sample, alpha=.05 two-sided, power=.80):
# (z_{a/2} + z_b) * sqrt(2 * var / n) / mean — the literals 1.959964
# and 0.841621 are spelled identically in both engines, so the whole
# readout is one shared closed-form tree over exact moment sums.
# Σc² lane wide (DECIMAL(38,0)↔HUGEINT): ≈1e20 at the 1e12-row target.


def _mde_sql(wide: str) -> str:
    return f"""
WITH vals AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
sums AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(CAST(c AS {wide}) * c) AS {wide}) AS s2
  FROM vals GROUP BY event_type
)
SELECT event_type, n,
       CAST(floor(CAST(s1 AS DOUBLE) * 1000 / n) AS BIGINT)
         AS mean_millicents,
       CAST(floor(
         (1.959964 + 0.841621)
         * sqrt(2.0 * ((CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) / n)
         / (CAST(s1 AS DOUBLE) / n) * 1000000) AS BIGINT) AS mde_ppm
FROM sums
"""


@query("stat_power_mde", oracle=_mde_sql("HUGEINT"), tags=("stats",))
def stat_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect per event type at the CURRENT sample
    size (alpha=0.05 two-sided, power=0.80) — the "is this experiment
    even worth running" readout an experimentation platform shows
    before assignment, and the design-side companion of ``evt_cuped``
    (which shrinks the variance that drives this number).

    One corpus-sized moment aggregate; the closed form runs on
    |types| rows. Exact int64 sums, one cast to DOUBLE, identical
    literal z constants in both engines, floor-scaled ppm output."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_mde_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# Kendall's tau: concordance between two hourly series
# ---------------------------------------------------------------------------

# tau-a over the calendar-bounded hourly bucket table (the ts_theil_sen
# pair-space argument): concordant/discordant pair counting is EXACT
# integer sign arithmetic — no ranks, no doubles until the final ppm.
_KENDALL_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(SUM(CASE WHEN event_type = 'click'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'view'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events
  WHERE event_type IN ('click', 'view')
  GROUP BY date_trunc('hour', ts)
),
pairs AS (
  SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS conc,
         CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS disc
  FROM hourly a JOIN hourly b ON a.h < b.h
)
SELECT CAST((SELECT COUNT(*) FROM hourly) AS BIGINT) AS n_hours,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(conc) AS BIGINT) AS concordant,
       CAST(SUM(disc) AS BIGINT) AS discordant,
       CAST(floor((CAST(SUM(conc) AS DOUBLE) - SUM(disc)) / COUNT(*)
                  * 1000000) AS BIGINT) AS tau_ppm
FROM pairs
"""


@query("stat_kendall_tau", oracle=_KENDALL_SQL, tags=("stats", "join"))
def stat_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-a between the hourly click and view revenue
    series — the concordance-based association measure that completes
    the correlation trio (``agg_corr_stddev`` Pearson,
    ``stat_spearman`` ranks): tau counts ORDER agreements, so a single
    wild hour moves it by at most 1/n_pairs.

    Scale shape: the pair join runs over the calendar-bounded hourly
    table (the ``ts_theil_sen`` argument — 720 rows/month regardless
    of corpus size); the only corpus-sized stage is the bucket
    aggregate. Sign products are exact int64; one double division at
    the end."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_KENDALL_SQL)


# ---------------------------------------------------------------------------
# multiple OLS: hourly revenue on (hour-of-day, day-of-month)
# ---------------------------------------------------------------------------

# Normal equations solved in closed form (Cramer over the 3x3 moment
# matrix) — every determinant is the same literal double expression in
# both engines, fed by exact integer sums over the calendar-bounded
# hourly table. The multivariate sibling of stat_ols_regression.
# The y-product lanes (s1y, s2y, syy) are quadratic in the hourly
# revenue total: at sf100 Σy² ≈ 2160·(4.6e8)² ≈ 4.6e20 overflows
# int64 (and at 1e12 rows the per-row y² already does), so they run
# in the DECIMAL(38,0)↔HUGEINT wide pair; x-only lanes are calendar-
# bounded (x1 ≤ 23, x2 ≤ 31) and stay int64.


def _ols2_sql(wide: str) -> str:
    return f"""
WITH hourly AS (
  SELECT CAST(hour(date_trunc('hour', ts)) AS BIGINT) AS x1,
         CAST(day(date_trunc('hour', ts)) AS BIGINT) AS x2,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
  FROM events
  GROUP BY date_trunc('hour', ts)
),
mo AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         CAST(SUM(x1 * x1) AS BIGINT) AS s11,
         CAST(SUM(x1 * x2) AS BIGINT) AS s12,
         CAST(SUM(x2 * x2) AS BIGINT) AS s22,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x1 * CAST(y AS {wide})) AS {wide}) AS s1y,
         CAST(SUM(x2 * CAST(y AS {wide})) AS {wide}) AS s2y,
         CAST(SUM(CAST(y AS {wide}) * y) AS {wide}) AS syy
  FROM hourly
),
d AS (
  SELECT n, sy, syy, s1, s2,
         CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22
                              - CAST(s12 AS DOUBLE) * s12)
         - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22
                                 - CAST(s12 AS DOUBLE) * s2)
         + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12
                                 - CAST(s11 AS DOUBLE) * s2) AS det,
         CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22
                               - CAST(s12 AS DOUBLE) * s12)
         - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s22
                                 - CAST(s12 AS DOUBLE) * s2y)
         + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s12
                                 - CAST(s11 AS DOUBLE) * s2y) AS det0,
         CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * s22
                              - CAST(s12 AS DOUBLE) * s2y)
         - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22
                                 - CAST(s12 AS DOUBLE) * s2)
         + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y
                                 - CAST(s1y AS DOUBLE) * s2) AS det1,
         CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s2y
                              - CAST(s1y AS DOUBLE) * s12)
         - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y
                                 - CAST(s1y AS DOUBLE) * s2)
         + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12
                                 - CAST(s11 AS DOUBLE) * s2) AS det2
  FROM mo
),
beta AS (
  SELECT n, sy, syy, s1, s2,
         det0 / det AS b0, det1 / det AS b1, det2 / det AS b2
  FROM d
)
SELECT n AS n_hours,
       CAST(floor(b0 * 1000) AS BIGINT) AS intercept_millicents,
       CAST(floor(b1 * 1000) AS BIGINT) AS beta_hour_millicents,
       CAST(floor(b2 * 1000) AS BIGINT) AS beta_dom_millicents,
       CAST(floor(
         (1.0 - (CAST(syy AS DOUBLE)
                 - b0 * sy - b1 * (SELECT CAST(s1y AS DOUBLE) FROM mo)
                 - b2 * (SELECT CAST(s2y AS DOUBLE) FROM mo))
                / (CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * sy / n)) * 1000000)
         AS BIGINT) AS r2_ppm
FROM beta
"""


@query("stat_ols_multiple", oracle=_ols2_sql("HUGEINT"), tags=("stats",))
def stat_ols_multiple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS of hourly revenue on (hour-of-day,
    day-of-month) via the closed-form normal equations — the
    multivariate sibling of ``stat_ols_regression``, solved by Cramer
    determinants over the 3x3 moment matrix so no iterative solver and
    no per-engine linear-algebra library is involved. R² comes from
    the residual identity SSE = Syy - b·X'y.

    Scale shape: one corpus-sized hourly aggregate, then a constant
    fold — the same moments-then-closed-form pattern as
    ``stat_skew_kurtosis``/``evt_cuped``. Exact integer moment lanes
    (y-product lanes wide — int64 Σy² dies at sf100), doubles cast
    once, identical literal determinant trees in both engines."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_ols2_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# delta-method CI for a ratio metric (revenue per event)
# ---------------------------------------------------------------------------

# Ratio metrics (revenue/session, clicks/user) need the delta method:
# var(x̄/ȳ) ≈ (var_x - 2r·cov + r²·var_y) / (n·ȳ²). All moments are
# exact integer sums over per-user (x=cents, y=events) pairs; the
# closed form and the ±1.959964·se band are one shared double tree.
# Σx² lanes wide (DECIMAL(38,0)↔HUGEINT): per-user spend² ≈ 1e12 at
# ~1e10 users ⇒ Σx² ≈ 1e22 past int64 (round-10 overflow audit).


def _ratio_ci_sql(wide: str) -> str:
    return f"""
WITH per_user AS (
  SELECT user_id,
         user_id % 2 AS variant,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events
  GROUP BY user_id
),
mo AS (
  SELECT variant,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS {wide}) * x) AS {wide}) AS sxx,
         CAST(SUM(CAST(x AS {wide}) * y) AS {wide}) AS sxy,
         CAST(SUM(CAST(y AS {wide}) * y) AS {wide}) AS syy
  FROM per_user GROUP BY variant
),
calc AS (
  SELECT variant, n,
         CAST(sx AS DOUBLE) / sy AS r,
         ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)
          - 2.0 * (CAST(sx AS DOUBLE) / sy)
                * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                   / (n - 1))
          + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
                * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
                   / (n - 1)))
         / (n * (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
           AS var_r
  FROM mo
)
SELECT CAST(variant AS BIGINT) AS variant, n AS n_users,
       CAST(floor(r * 1000) AS BIGINT) AS ratio_millicents_per_event,
       CAST(floor((r - 1.959964 * sqrt(var_r)) * 1000) AS BIGINT)
         AS ci_lo_millicents,
       CAST(floor((r + 1.959964 * sqrt(var_r)) * 1000) AS BIGINT)
         AS ci_hi_millicents
FROM calc
"""


@query("stat_ratio_delta_ci", oracle=_ratio_ci_sql("HUGEINT"), tags=("stats",))
def stat_ratio_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method 95% confidence interval for the ratio metric
    revenue-per-event, per experiment variant — the correct interval
    for ratio metrics, whose naive per-event variance ignores that the
    denominator is ALSO random per user (the unit of randomization).
    Completes the experimentation kit: ``stat_welch_ttest`` (means),
    ``evt_cuped`` (variance reduction), ``stat_power_mde`` (design),
    this (ratio readout).

    One user-keyed aggregate, then |variants| rows of closed form —
    exact integer moments, doubles cast once, shared literal z."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_ratio_ci_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# QQ table: observed deciles vs normal quantiles
# ---------------------------------------------------------------------------

# Expected N(0,1) decile quantiles as shared milli-unit literals (no
# inverse-CDF function needed in either engine).
_QQ_EXPECTED_MILLI = {
    1: -1282, 2: -842, 3: -524, 4: -253, 5: 0,
    6: 253, 7: 524, 8: 842, 9: 1282,
}


def _qq_case() -> str:
    whens = " ".join(
        f"WHEN {k} THEN {v}" for k, v in sorted(_QQ_EXPECTED_MILLI.items())
    )
    return f"CASE k {whens} END"


# Σc² lane wide (DECIMAL(38,0)↔HUGEINT): ≈1e20 at the 1e12-row target.
def _qq_sql(wide: str) -> str:
    return f"""
WITH vals AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
mo AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(CAST(c AS {wide}) * c) AS {wide}) AS s2
  FROM vals GROUP BY event_type
),
ranked AS (
  SELECT event_type, c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS rn
  FROM vals
),
deciles AS (
  SELECT r.event_type, k.k,
         MAX(CASE WHEN r.rn = floor((k.k * m.n + 9) / 10) THEN r.c END)
           AS qv
  FROM ranked r
  JOIN mo m ON m.event_type = r.event_type
  CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS k) k
  WHERE r.rn = floor((k.k * m.n + 9) / 10)
  GROUP BY r.event_type, k.k
)
SELECT d.event_type, CAST(d.k AS INT) AS decile,
       CAST(floor(
         (d.qv - CAST(m.s1 AS DOUBLE) / m.n)
         / sqrt((CAST(m.s2 AS DOUBLE)
                 - CAST(m.s1 AS DOUBLE) * m.s1 / m.n) / (m.n - 1))
         * 1000) AS BIGINT) AS z_observed_milli,
       CAST({_qq_case().replace("k ", "d.k ")} AS BIGINT) AS z_expected_milli
FROM deciles d JOIN mo m ON m.event_type = d.event_type
"""


@query("stat_qq_normal", oracle=_qq_sql("HUGEINT"), tags=("stats", "window"))
def stat_qq_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QQ table per event type: the standardized observed decile
    boundaries next to the N(0,1) decile quantiles (shared milli-unit
    literals — no inverse CDF in either engine). Reading the two
    columns against each other IS the normality diagnostic that decides
    whether z-score methods (``evt_anomaly_zscore``,
    ``stat_welch_ttest``) are trustworthy on this metric, and the
    heavy-tail evidence pairs with ``stat_skew_kurtosis``.

    Scale shape: one ranking window per type + one moment aggregate;
    decile ranks are exact ceil(k n/10) positions via floor
    arithmetic on positive operands."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        _qq_sql("DECIMAL(38,0)").replace(
            "CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS k) k",
            "CROSS JOIN (SELECT explode(array(1, 2, 3, 4, 5, 6, 7, 8, 9))"
            " AS k) k",
        )
    )


# ---------------------------------------------------------------------------
# one-way ANOVA: does mean value differ across event types?
# ---------------------------------------------------------------------------

# Exact integer moments (n, Σcents, Σcents²) per group; the between/
# within sums of squares are per-group double expressions over those
# exact sums, quantized to integer cents² with FLOOR before the final
# exact integer sum — the same fold-order-exact discipline as
# stat_chi2_independence. F and eta² are then fixed scalar expressions
# over exact integers, bit-identical across engines and partitionings.
# Headroom: cents ≤ ~5e4 ⇒ Σcents ≤ ~5e8/group, (Σcents)² ≈ 2.5e17
# computed in double (same IEEE product both engines), per-group
# contributions ≤ ~1e13 cents² — far inside BIGINT.
_ANOVA_SQL = """
WITH g AS (
  SELECT event_type AS grp,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  * CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS q
  FROM events
  WHERE value IS NOT NULL
  GROUP BY event_type
),
quant AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n_tot,
         CAST(SUM(s) AS BIGINT) AS s_tot,
         CAST(SUM(q) AS BIGINT) AS q_tot,
         CAST(SUM(CAST(FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                       AS BIGINT)) AS BIGINT) AS sum_s2_over_n
  FROM g
),
ss AS (
  SELECT k, n_tot,
         sum_s2_over_n
           - CAST(FLOOR(CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE) / n_tot)
                  AS BIGINT) AS ssb_cents2,
         q_tot - sum_s2_over_n AS ssw_cents2,
         q_tot
           - CAST(FLOOR(CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE) / n_tot)
                  AS BIGINT) AS sst_cents2
  FROM quant
)
SELECT k AS k_groups,
       n_tot,
       ssb_cents2,
       ssw_cents2,
       CAST(FLOOR(
         (CAST(ssb_cents2 AS DOUBLE) / (k - 1))
         / (CAST(ssw_cents2 AS DOUBLE) / (n_tot - k)) * 1000
       ) AS BIGINT) AS f_milli,
       CAST(FLOOR(CAST(ssb_cents2 AS DOUBLE) * 1000000.0 / sst_cents2)
            AS BIGINT) AS eta2_micro
FROM ss
"""


@query("stat_anova_oneway", oracle=_ANOVA_SQL, tags=("stats",))
def stat_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types: between/within
    sums of squares from exact per-group integer moments, the F
    statistic (milli-units) and effect size eta² (micro-units) — the
    k-group generalization of ``stat_welch_ttest``'s two-sample
    question, and the gate for "does this metric differ by segment at
    all" before pairwise tests multiply.

    Scale shape: one hash aggregate over the fact computes all group
    moments (map-side combinable); everything after operates on
    k ≈ group-count rows. The only data-sized cost is the single scan."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_ANOVA_SQL)


# ---------------------------------------------------------------------------
# experiment hygiene: sample-ratio mismatch + two-proportion z-test
# ---------------------------------------------------------------------------

# Deterministic 50/50 arm assignment both engines compute identically:
# multiplicative hash mod an odd prime, then parity. (A bare
# ``user_id % 2`` would alias any id-parity artifact straight into the
# arm split — the hash decorrelates assignment from id structure.)
_ARM_EXPR = "((user_id * 2654435761 + 987654321) % 97) % 2"

# chi2(1dof) critical value at p=0.05, in micro-units for the exact
# integer cross-multiplied comparison (no float in the flag).
_CHI2_CRIT_MICRO = 3841459

_SRM_SQL = f"""
WITH assign AS (
  SELECT DISTINCT user_id, CAST({_ARM_EXPR} AS BIGINT) AS arm
  FROM events
),
counts AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM assign
)
SELECT n_a, n_b, n,
       CAST(FLOOR((n_a - n_b) * (n_a - n_b) * 1000000.0 / n) AS BIGINT)
         AS chi2_micro,
       (n_a - n_b) * (n_a - n_b) * 1000000 > {_CHI2_CRIT_MICRO} * n
         AS srm_detected
FROM counts
"""


@query("stat_srm_check", oracle=_SRM_SQL, tags=("stats", "experiment"))
def stat_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for a 50/50 experiment assignment:
    chi-square(1) on the two arm sizes against the expected even
    split — the first gate every A/B readout must pass (an SRM means
    the assignment or logging pipeline is biased and all downstream
    deltas are untrustworthy). The significance flag is an exact
    integer cross-multiplied comparison — no float enters the verdict.

    Scale shape: one DISTINCT on (user, arm) — a hash aggregate keyed
    by user — then a 1-row conditional sum. Headroom: |n_a-n_b|² · 1e6
    stays in BIGINT up to ~3e6 users per experiment; beyond, drop the
    micro scaling."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_SRM_SQL)


_PROP_ZTEST_SQL = f"""
WITH assign AS (
  SELECT user_id,
         CAST({_ARM_EXPR} AS BIGINT) AS arm,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS converted
  FROM events
  GROUP BY user_id
),
counts AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
           AS conv_a,
         CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
           AS conv_b
  FROM assign
)
SELECT n_a, n_b, conv_a, conv_b,
       CAST(FLOOR(conv_a * 1000000.0 / n_a) AS BIGINT) AS rate_a_ppm,
       CAST(FLOOR(conv_b * 1000000.0 / n_b) AS BIGINT) AS rate_b_ppm,
       -- degenerate pooled rate (0% or 100% overall) => zero variance,
       -- z undefined: report 0 / not significant instead of dividing
       CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
            THEN CAST(0 AS BIGINT)
            ELSE CAST(FLOOR(
              (CAST((conv_a * n_b - conv_b * n_a) AS DOUBLE)
               * (conv_a * n_b - conv_b * n_a) * (n_a + n_b))
              / (CAST((conv_a + conv_b) AS DOUBLE)
                 * (n_a + n_b - conv_a - conv_b) * n_a * n_b)
              * 1000
            ) AS BIGINT) END AS z2_milli,
       CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
            THEN FALSE
            ELSE (CAST((conv_a * n_b - conv_b * n_a) AS DOUBLE)
                  * (conv_a * n_b - conv_b * n_a) * (n_a + n_b))
                 / (CAST((conv_a + conv_b) AS DOUBLE)
                    * (n_a + n_b - conv_a - conv_b) * n_a * n_b)
                 > 3.841459 END AS significant_p05
FROM counts
"""


@query("stat_proportion_ztest", oracle=_PROP_ZTEST_SQL, tags=("stats", "experiment"))
def stat_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test of user conversion (any 'purchase' event)
    between the hash-assigned experiment arms: pooled z² in
    cross-multiplied rational form — every product is an exact int64
    before the one double division, so both engines evaluate the same
    IEEE sequence bit-for-bit. The mean-metric companion is
    ``stat_welch_ttest``; the assignment-health gate is
    ``stat_srm_check``.

    Scale shape: one hash aggregate per user (conversion flag), one
    1-row rollup. Headroom: the int64 products hold to ~2e4 users per
    arm; past that the counts remain exact and the z² products move to
    double (document the switch, don't let it wrap)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_PROP_ZTEST_SQL)


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test: is the daily metric's direction random?
# ---------------------------------------------------------------------------

# Signs of day-over-day change in daily event counts; R = number of
# sign runs. Under randomness R ~ N(1 + 2·n₊n₋/N, 2n₊n₋(2n₊n₋−N)/(N²(N−1))).
# All counts are exact integers; z is one double expression over them.
_RUNS_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
deltas AS (
  SELECT day, n - LAG(n) OVER (ORDER BY day) AS d FROM daily
),
signs AS (
  SELECT day, CASE WHEN d > 0 THEN 1 ELSE -1 END AS sg
  FROM deltas WHERE d IS NOT NULL AND d <> 0
),
runs AS (
  SELECT sg,
         CASE WHEN sg <> LAG(sg) OVER (ORDER BY day) THEN 1 ELSE 0 END
           AS boundary
  FROM signs
),
counts AS (
  SELECT CAST(SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
         CAST(SUM(boundary) + 1 AS BIGINT) AS n_runs
  FROM runs
)
SELECT n_pos, n_neg, n_runs,
       CAST(FLOOR(
         (n_runs - (1.0 + 2.0 * n_pos * n_neg / (n_pos + n_neg)))
         / SQRT(
             (2.0 * n_pos * n_neg) * (2.0 * n_pos * n_neg - n_pos - n_neg)
             / (CAST((n_pos + n_neg) AS DOUBLE) * (n_pos + n_neg)
                * (n_pos + n_neg - 1))
           ) * 1000
       ) AS BIGINT) AS z_milli,
       ABS(
         (n_runs - (1.0 + 2.0 * n_pos * n_neg / (n_pos + n_neg)))
         / SQRT(
             (2.0 * n_pos * n_neg) * (2.0 * n_pos * n_neg - n_pos - n_neg)
             / (CAST((n_pos + n_neg) AS DOUBLE) * (n_pos + n_neg)
                * (n_pos + n_neg - 1))
           )
       ) <= 1.96 AS looks_random
FROM counts
"""


@query("stat_runs_test", oracle=_RUNS_SQL, tags=("stats",))
def stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the direction of day-over-day change
    in daily event volume: too FEW runs means momentum/trend, too MANY
    means oscillation — either way the series isn't i.i.d. and naive
    day-level confidence intervals (bootstrap, t-tests) understate
    error. The randomness gate to run before trusting
    ``stat_bootstrap_ci`` on daily aggregates.

    Scale shape: daily rollup (map-side combinable) then two lag
    windows over a calendar-sized series; the raw-event pass is the
    single rollup scan. Zero-delta days are dropped (standard
    treatment). One double z expression over exact integer counts."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_RUNS_SQL)


# ---------------------------------------------------------------------------
# Cohen's kappa: inter-annotator agreement beyond chance
# ---------------------------------------------------------------------------

# Two simulated annotators label documents good/bad: both start from the
# same underlying signal (n_chars parity band) and each flips ~1/8 of
# its labels on an independent md5 digit — so agreement is high but
# imperfect, and kappa must separate real agreement from the chance
# floor. md5 is the engine-shared hash (cf. curate_hash_split).
_KAPPA_SQL = """
WITH labels AS (
  SELECT doc_id,
         (n_chars % 10) < 5 AS truth,
         substr(md5(CAST(doc_id AS STRING)), 3, 1) < '2' AS flip_a,
         substr(md5(CAST(doc_id AS STRING)), 4, 1) < '2' AS flip_b
  FROM documents
),
ann AS (
  SELECT doc_id,
         (truth <> flip_a) AS ann_a,
         (truth <> flip_b) AS ann_b
  FROM labels
),
cells AS (
  SELECT CAST(SUM(CASE WHEN ann_a AND ann_b THEN 1 ELSE 0 END) AS BIGINT)
           AS n11,
         CAST(SUM(CASE WHEN ann_a AND NOT ann_b THEN 1 ELSE 0 END) AS BIGINT)
           AS n10,
         CAST(SUM(CASE WHEN NOT ann_a AND ann_b THEN 1 ELSE 0 END) AS BIGINT)
           AS n01,
         CAST(SUM(CASE WHEN NOT ann_a AND NOT ann_b THEN 1 ELSE 0 END)
              AS BIGINT) AS n00,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ann
)
SELECT n11, n10, n01, n00,
       CAST(FLOOR((n11 + n00) * 1000000.0 / n) AS BIGINT)
         AS observed_agree_ppm,
       CAST(FLOOR(
         ( (CAST(n11 + n00 AS DOUBLE) / n)
           - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
              + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / (CAST(n AS DOUBLE) * n) )
         / (1.0
            - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
               + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / (CAST(n AS DOUBLE) * n))
         * 1000
       ) AS BIGINT) AS kappa_milli
FROM cells
"""


@query("stat_cohen_kappa", oracle=_KAPPA_SQL, tags=("stats", "quality"))
def stat_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two annotators over the document corpus:
    raw agreement corrected for the agreement expected by chance from
    each annotator's marginal rates — the label-quality number every
    human-annotation or LLM-judge pipeline reports before its labels
    feed training. All four contingency cells are exact integer sums;
    kappa is one double expression over them.

    Scale shape: a single map-side-combinable aggregate over the
    corpus; output is one row."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_KAPPA_SQL)


# ---------------------------------------------------------------------------
# capture–recapture: estimate corpus size from two hash samples
# ---------------------------------------------------------------------------

# Lincoln–Petersen: sample twice with independent deterministic gates
# (two different md5 hex digits), count the overlap, estimate
# N ≈ n1·n2/m. The same estimator teams use to size an unknown
# duplicate population or a crawl frontier from cheap samples.
_CAPTURE_SQL = """
WITH marks AS (
  SELECT doc_id,
         substr(md5(CAST(doc_id AS STRING)), 1, 1) < '5' AS in_s1,
         substr(md5(CAST(doc_id AS STRING)), 2, 1) < '5' AS in_s2
  FROM documents
),
counts AS (
  SELECT CAST(SUM(CASE WHEN in_s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN in_s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN in_s1 AND in_s2 THEN 1 ELSE 0 END) AS BIGINT)
           AS m_overlap,
         CAST(COUNT(*) AS BIGINT) AS n_true
  FROM marks
)
SELECT n1, n2, m_overlap, n_true,
       CASE WHEN m_overlap = 0 THEN CAST(NULL AS BIGINT)
            ELSE CAST(FLOOR(n1 * 1.0 * n2 / m_overlap) AS BIGINT) END
         AS n_estimated,
       CASE WHEN m_overlap = 0 THEN CAST(NULL AS BIGINT)
            ELSE CAST(FLOOR(
              ABS(FLOOR(n1 * 1.0 * n2 / m_overlap) - n_true)
              * 1000000.0 / n_true) AS BIGINT) END
         AS abs_err_ppm
FROM counts
"""


@query("stat_capture_recapture", oracle=_CAPTURE_SQL, tags=("stats",))
def stat_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln–Petersen capture–recapture estimate of corpus size from
    two ~31% deterministic hash samples (independent md5 digits):
    N̂ = n1·n2/overlap, reported next to the true count and the
    relative error — the sampling estimator for sizing an unknown
    population (duplicate pairs, crawl frontier, join hit-rate) without
    scanning it twice in full.

    Scale shape: one aggregate pass; in production the two \"samples\"
    are cheap independent probes and n_true is the unknown this
    estimator replaces."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_CAPTURE_SQL)


# ---------------------------------------------------------------------------
# Mann–Kendall trend test (the significance gate for ts_theil_sen)
# ---------------------------------------------------------------------------

# S = Σ_{i<j} sign(x_j − x_i) over the daily-count series; Var(S) with
# the tie correction; z with the ±1 continuity correction. S and the
# tie table are exact integers; z is one double expression.
_MK_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
pairs AS (
  SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
                       WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM daily a JOIN daily b ON b.day > a.day
),
n_row AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
ties AS (
  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
           AS tie_term
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY x) AS tt
  WHERE t > 1
),
stat AS (
  SELECT p.s, n.n,
         (n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_term) / 18.0 AS var_s
  FROM pairs p CROSS JOIN n_row n CROSS JOIN ties t
)
SELECT n, s AS s_stat,
       CAST(FLOOR(var_s * 1000) AS BIGINT) AS var_milli,
       CAST(FLOOR(
         CASE WHEN s > 0 THEN (s - 1) / SQRT(var_s)
              WHEN s < 0 THEN (s + 1) / SQRT(var_s)
              ELSE 0.0 END * 1000
       ) AS BIGINT) AS z_milli,
       CASE WHEN s > 0 AND (s - 1) / SQRT(var_s) > 1.96 THEN 'increasing'
            WHEN s < 0 AND (s + 1) / SQRT(var_s) < -1.96 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM stat
"""


@query("stat_mann_kendall", oracle=_MK_SQL, tags=("stats", "timeseries"))
def stat_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test on daily event volume: the
    non-parametric significance gate that says whether
    ``ts_theil_sen``'s slope estimate is distinguishable from noise —
    rank-based, so outliers and non-normality don't fake a trend.
    Includes the tie-corrected variance and ±1 continuity correction.

    Scale shape: the pair sum is a self-join over the DAILY series
    (calendar-sized — 10 years is ~3.7k rows, ~7M pairs, trivial);
    only the daily rollup ever scans raw events. For century-scale
    series switch to the O(n log n) inversion-count formulation."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_MK_SQL)


# ---------------------------------------------------------------------------
# sequential probability ratio test: always-valid daily monitoring
# ---------------------------------------------------------------------------

# H0: daily purchase share = 0.20 vs H1: = 0.25, α = β = 0.05. Each
# day's log-likelihood-ratio increment is conv·ln(p1/p0) +
# (n−conv)·ln((1−p1)/(1−p0)) — quantized to exact integer micro-nats
# per day, then integer-cumsummed in day order, so the walk is
# fold-order exact. Boundaries: ±ln(19) ≈ ±2.944439 nats.
_SPRT_BOUND_MICRO = 2944439

_SPRT_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS conv,
         CAST(COUNT(*) AS BIGINT) AS trials
  FROM events GROUP BY 1
),
scored AS (
  SELECT day, conv, trials,
         CAST(FLOOR(conv * LN(0.25 / 0.20) * 1000000
                    + (trials - conv) * LN(0.75 / 0.80) * 1000000)
              AS BIGINT) AS llr_micro
  FROM daily
),
walk AS (
  SELECT day, conv, trials,
         CAST(SUM(llr_micro) OVER (ORDER BY day) AS BIGINT) AS cum_llr_micro
  FROM scored
)
SELECT day, conv, trials, cum_llr_micro,
       CASE WHEN cum_llr_micro >= {_SPRT_BOUND_MICRO} THEN 'accept_h1'
            WHEN cum_llr_micro <= -{_SPRT_BOUND_MICRO} THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM walk
"""


@query("stat_sequential_sprt", oracle=_SPRT_SQL, tags=("stats", "experiment"))
def stat_sequential_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test monitoring the daily
    purchase share (H0 20% vs H1 25%, α = β = 5%): the cumulative
    log-likelihood walk with early-stop boundaries — the always-valid
    alternative to peeking at ``stat_proportion_ztest`` daily (which
    inflates false positives). Per-day increments are quantized to
    exact integer micro-nats before the cumulative sum, so the walk is
    identical on any partitioning.

    Scale shape: one daily rollup over events, one cumulative window
    over the calendar-sized series."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_SPRT_SQL)


# ---------------------------------------------------------------------------
# extreme-value tail: peaks-over-threshold GPD moment fit
# ---------------------------------------------------------------------------

# Exceedances y = cents − u over a fixed threshold follow (EVT) a
# generalized Pareto; the method-of-moments fit is
#   xi = (1 − m²/s²)/2,  beta = m·(m²/s² + 1)/2
# from the exceedance mean/variance — both exact-integer-moment
# derived. The p99.9 return level is u + beta/xi·((N·0.001/n_u)^(−xi)−1).
_POT_THRESHOLD_CENTS = 20000

_POT_SQL = f"""
WITH cents AS (
  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c FROM events
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN c > {_POT_THRESHOLD_CENTS} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_exceed,
         CAST(SUM(CASE WHEN c > {_POT_THRESHOLD_CENTS}
                       THEN c - {_POT_THRESHOLD_CENTS} ELSE 0 END)
              AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN c > {_POT_THRESHOLD_CENTS}
                       THEN (c - {_POT_THRESHOLD_CENTS})
                            * (c - {_POT_THRESHOLD_CENTS}) ELSE 0 END)
              AS BIGINT) AS s2
  FROM cents
),
fit AS (
  SELECT n_total, n_exceed, s1, s2,
         CAST(s1 AS DOUBLE) / n_exceed AS m,
         (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_exceed)
           / (n_exceed - 1) AS v
  FROM agg
)
SELECT n_total, n_exceed, s1 AS sum_exceed_cents,
       CAST(FLOOR((1.0 - m * m / v) / 2 * 1000) AS BIGINT) AS xi_milli,
       CAST(FLOOR(m * (m * m / v + 1) / 2) AS BIGINT) AS beta_cents,
       CAST(FLOOR(
         {_POT_THRESHOLD_CENTS}
         + (m * (m * m / v + 1) / 2) / ((1.0 - m * m / v) / 2)
           * (POW(CAST(n_total AS DOUBLE) * 0.001 / n_exceed,
                  -((1.0 - m * m / v) / 2)) - 1)
       ) AS BIGINT) AS p999_return_level_cents
FROM fit
"""


@query("stat_evt_pot", oracle=_POT_SQL, tags=("stats",))
def stat_evt_pot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value tail fit (peaks-over-threshold, generalized
    Pareto by method of moments): shape xi and scale beta from the
    exceedance moments over a fixed threshold, plus the extrapolated
    p99.9 return level — the SRE/risk estimate of 'how bad is the
    value we have NOT seen yet', which empirical percentiles cannot
    answer beyond the sample. Exceedance moments are exact integers;
    the fit is one double expression chain.

    Scale shape: a single map-side-combinable aggregate; the tail fit
    reads one row. At 100 TB the threshold itself comes from
    ``agg_percentiles`` in a prior pass."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_POT_SQL)


# ---------------------------------------------------------------------------
# Granger-lite: does yesterday's view count predict today's purchases?
# ---------------------------------------------------------------------------

# Restricted model  y_t ~ a + b·y_{t−1}; unrestricted adds c·x_{t−1}.
# Both fit by centered normal equations from exact integer daily
# counts; F = (RSS_r − RSS_u)/(RSS_u/(n−3)) with 1 numerator dof. The
# descriptive companion is ts_cross_correlation; this one is the
# inferential gate.
# Daily-count product lanes wide (DECIMAL(38,0)↔HUGEINT): at the
# 1e12-row target a single day's count is ~1.1e10, so the PER-ROW
# product y·y ≈ 1.2e20 already exceeds int64 (round-10 overflow
# audit); the centering products sy·sy follow.
def _granger_sql(wide: str) -> str:
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY 1
),
lagged AS (
  SELECT day, y,
         LAG(y) OVER (ORDER BY day) AS yl,
         LAG(x) OVER (ORDER BY day) AS xl
  FROM daily
),
obs AS (
  SELECT y, yl, xl FROM lagged WHERE yl IS NOT NULL
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(yl) AS BIGINT) AS sa,
         CAST(SUM(xl) AS BIGINT) AS sb,
         CAST(SUM(CAST(y AS {wide}) * y) AS {wide}) AS syy,
         CAST(SUM(CAST(yl AS {wide}) * yl) AS {wide}) AS saa,
         CAST(SUM(CAST(xl AS {wide}) * xl) AS {wide}) AS sbb,
         CAST(SUM(CAST(y AS {wide}) * yl) AS {wide}) AS sya,
         CAST(SUM(CAST(y AS {wide}) * xl) AS {wide}) AS syb,
         CAST(SUM(CAST(yl AS {wide}) * xl) AS {wide}) AS sab
  FROM obs
),
cent AS (
  SELECT n,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS cyy,
         CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n AS caa,
         CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / n AS cbb,
         CAST(sya AS DOUBLE) - CAST(sy AS DOUBLE) * sa / n AS cya,
         CAST(syb AS DOUBLE) - CAST(sy AS DOUBLE) * sb / n AS cyb,
         CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * sb / n AS cab
  FROM m
),
fits AS (
  SELECT n, cyy,
         cyy - cya * cya / caa AS rss_r,
         cyy - ( cya * (cbb * cya - cab * cyb)
               + cyb * (caa * cyb - cab * cya) )
               / (caa * cbb - cab * cab) AS rss_u
  FROM cent
)
SELECT n AS n_obs,
       CAST(FLOOR(rss_r * 1000) AS BIGINT) AS rss_restricted_milli,
       CAST(FLOOR(rss_u * 1000) AS BIGINT) AS rss_unrestricted_milli,
       CAST(FLOOR((rss_r - rss_u) / (rss_u / (n - 3)) * 1000) AS BIGINT)
         AS f_milli,
       (rss_r - rss_u) / (rss_u / (n - 3)) > 4.17
         AS x_granger_causes_y_p05
FROM fits
"""


@query(
    "stat_granger_lite",
    oracle=_granger_sql("HUGEINT"),
    tags=("stats", "timeseries"),
)
def stat_granger_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-causality F-test (one lag): does adding yesterday's
    VIEW count to an autoregression of today's PURCHASE count reduce
    the residual sum of squares more than chance (F₁,ₙ₋₃, ~4.17 at
    p=0.05 for a month of days)? The inferential upgrade of
    ``ts_cross_correlation``'s descriptive lead-lag scan. Both model
    fits are closed-form centered normal equations over exact integer
    daily moments.

    Scale shape: one daily rollup scans events; everything after is a
    lag window plus one moment aggregate on the calendar-sized
    series."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_granger_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# paired t-test: same users, before vs after the split
# ---------------------------------------------------------------------------

# Pairing removes between-user variance — the reason a paired test on
# the same users is far more sensitive than stat_welch_ttest on two
# independent groups. Differences are exact integer cents; t is one
# double expression over their moments.
_PAIRED_SPLIT = "2024-01-16 00:00:00"


# Σd² lane wide (DECIMAL(38,0)↔HUGEINT): per-user diff² ≈ 1e12 at
# ~1e10 users ⇒ Σd² ≈ 1e22 past int64 (round-10 overflow audit).
def _paired_sql(wide: str) -> str:
    return f"""
WITH halves AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{_PAIRED_SPLIT}'
                       THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS before_cents,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_PAIRED_SPLIT}'
                       THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS after_cents,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{_PAIRED_SPLIT}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_before,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_PAIRED_SPLIT}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_after
  FROM events GROUP BY user_id
),
pairs AS (
  SELECT after_cents - before_cents AS d
  FROM halves WHERE n_before > 0 AND n_after > 0
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS s,
         CAST(SUM(CAST(d AS {wide}) * d) AS {wide}) AS q
  FROM pairs
)
SELECT n AS n_pairs,
       CAST(FLOOR(CAST(s AS DOUBLE) * 1000 / n) AS BIGINT)
         AS mean_diff_millicents,
       CAST(FLOOR(
         (CAST(s AS DOUBLE) / n)
         / SQRT(((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))
                / n) * 1000
       ) AS BIGINT) AS t_milli,
       ABS((CAST(s AS DOUBLE) / n)
           / SQRT(((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))
                  / n)) > 1.976 AS significant_p05
FROM m
"""


@query(
    "stat_paired_ttest", oracle=_paired_sql("HUGEINT"), tags=("stats", "experiment")
)
def stat_paired_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t-test of per-user spend before vs after the mid-month
    split — each user is their own control, so between-user variance
    cancels and the test detects shifts ``stat_welch_ttest`` (two
    independent groups) would drown in noise. Only users active in
    both halves pair; differences are exact integer cents.

    Scale shape: one user-keyed aggregate, one 1-row moment rollup."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_paired_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# Simpson's paradox detector: group trends that contradict the pooled trend
# ---------------------------------------------------------------------------

# Per-row values are tiny (x ≤ 10, y ≤ 50) so the Σ lanes fit int64
# to ~1e15 rows, but the CENTERING products n·sxy and sx·sy are
# O(n²·x̄·ȳ): at sf100 (200M rows/group) n·sxy ≈ 2e19 already exceeds
# int64 (round-10 overflow audit) — those products run in the
# DECIMAL(38,0)↔HUGEINT wide pair, exact, cast to DOUBLE once.
def _simpson_sql(wide: str) -> str:
    return f"""
WITH pts AS (
  SELECT l_returnflag AS grp,
         CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(l_quantity) AS BIGINT) AS y
  FROM lineitem
),
gm AS (
  SELECT grp,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pts GROUP BY grp
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(sx) AS BIGINT) AS sx, CAST(SUM(sy) AS BIGINT) AS sy,
         CAST(SUM(sxy) AS BIGINT) AS sxy,
         CAST(SUM(sxx) AS BIGINT) AS sxx,
         CAST(SUM(syy) AS BIGINT) AS syy
  FROM gm
),
corr AS (
  SELECT g.grp, g.n,
         CAST(CAST(g.n AS {wide}) * g.sxy
              - CAST(g.sx AS {wide}) * g.sy AS DOUBLE)
           / SQRT(CAST(CAST(g.n AS {wide}) * g.sxx
                       - CAST(g.sx AS {wide}) * g.sx AS DOUBLE)
                  * CAST(CAST(g.n AS {wide}) * g.syy
                         - CAST(g.sy AS {wide}) * g.sy AS DOUBLE)) AS r_grp,
         CAST(CAST(t.n AS {wide}) * t.sxy
              - CAST(t.sx AS {wide}) * t.sy AS DOUBLE)
           / SQRT(CAST(CAST(t.n AS {wide}) * t.sxx
                       - CAST(t.sx AS {wide}) * t.sx AS DOUBLE)
                  * CAST(CAST(t.n AS {wide}) * t.syy
                         - CAST(t.sy AS {wide}) * t.sy AS DOUBLE)) AS r_pool
  FROM gm g CROSS JOIN tot t
)
SELECT grp, n,
       CAST(FLOOR(r_grp * 1000000) AS BIGINT) AS corr_group_micro,
       CAST(FLOOR(r_pool * 1000000) AS BIGINT) AS corr_pooled_micro,
       (r_grp > 0.01 AND r_pool < -0.01)
         OR (r_grp < -0.01 AND r_pool > 0.01) AS sign_reversed
FROM corr
"""


@query(
    "stat_simpson_detector",
    oracle=_simpson_sql("HUGEINT"),
    tags=("stats", "quality"),
)
def stat_simpson_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox detector: the discount↔quantity correlation
    within every return-flag stratum next to the pooled correlation,
    flagging strata whose trend direction CONTRADICTS the pooled one
    (beyond a ±0.01 dead zone) — the aggregation-bias audit that says
    whether a corpus-level trend is real or an artifact of mixing
    strata. All moments are exact integers; two fixed correlation
    expressions.

    Scale shape: one grouped moment aggregate; the pooled row is the
    SUM of group moments (no second scan), broadcast back."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_simpson_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# fixed-effect meta-analysis: pool per-source effects, test heterogeneity
# ---------------------------------------------------------------------------

# Effect per source = mean document length difference vs the corpus
# mean; weight = inverse variance n_i/s²_i (delta-method on exact
# integer moments). Pooled effect = Σwᵢdᵢ/Σwᵢ; Cochran's
# Q = Σwᵢ(dᵢ−pooled)² with I² = max(0, (Q−df)/Q). Per-source
# contributions are quantized to exact integers before the final sums
# (the chi2 discipline), so pooling is fold-order exact.
# Quadratic lanes run in the DECIMAL(38,0)↔HUGEINT wide pair: at the
# 1e12-row target Σchars² ≈ 1e20 exceeds int64 (same bound as the
# widened ttest Σlen²), and w_micro ≈ 1e6·n/σ² ≈ 1e18 makes the
# w_micro·d_milli pooling product overflow too.


def _meta_sql(wide: str) -> str:
    return f"""
WITH src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS s,
         CAST(SUM(CAST(n_chars AS {wide}) * n_chars) AS {wide}) AS q
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s
  FROM src
),
eff AS (
  SELECT src.source, src.n,
         CAST(src.s AS DOUBLE) / src.n - CAST(tot.s AS DOUBLE) / tot.n AS d,
         (CAST(src.q AS DOUBLE) - CAST(src.s AS DOUBLE) * src.s / src.n)
           / (src.n - 1) / src.n AS var_d
  FROM src CROSS JOIN tot
),
quant AS (
  SELECT source, n,
         CAST(FLOOR(d * 1000) AS BIGINT) AS d_milli,
         CAST(FLOOR(1000000.0 / var_d) AS BIGINT) AS w_micro
  FROM eff
),
pool AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(w_micro) AS BIGINT) AS sw,
         CAST(SUM(CAST(w_micro AS {wide}) * d_milli) AS {wide}) AS swd
  FROM quant
),
qstat AS (
  SELECT p.k, p.sw, p.swd,
         CAST(SUM(CAST(FLOOR(
           CAST(q.w_micro AS DOUBLE)
           * (q.d_milli - CAST(p.swd AS DOUBLE) / p.sw)
           * (q.d_milli - CAST(p.swd AS DOUBLE) / p.sw)
           / 1000000000.0) AS BIGINT)) AS BIGINT) AS q_milli
  FROM quant q CROSS JOIN pool p
  GROUP BY p.k, p.sw, p.swd
)
SELECT k AS n_sources,
       CAST(FLOOR(CAST(swd AS DOUBLE) / sw * 1000) AS BIGINT)
         AS pooled_effect_microchars,
       q_milli AS cochran_q_milli,
       CASE WHEN q_milli > (k - 1) * 1000
            THEN CAST(FLOOR((q_milli - (k - 1) * 1000) * 1000.0 / q_milli)
                      AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS i2_milli,
       q_milli > (k - 1) * 1000 + 2 * CAST(FLOOR(SQRT(2.0 * (k - 1))
                                                 * 1000) AS BIGINT)
         AS heterogeneous
FROM qstat
"""


@query("stat_meta_analysis", oracle=_meta_sql("HUGEINT"), tags=("stats",))
def stat_meta_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-effect meta-analysis of per-source document-length
    effects: inverse-variance pooling of each source's deviation from
    the corpus mean, with Cochran's Q and I² heterogeneity — the
    machinery for combining an effect measured independently across
    sources/sites/segments, and the I² answer to 'is one pooled
    number even meaningful here?' (the ~2σ Q gate flags
    heterogeneity). Per-source d/w quantize to exact integers before
    pooling, so every sum is fold-order exact.

    Scale shape: one grouped moment aggregate over the corpus;
    everything downstream is source-count-sized."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_meta_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# Cronbach's alpha: do the engagement signals measure one construct?
# ---------------------------------------------------------------------------

# Items = per-user counts of each event type; alpha = k/(k−1) ·
# (1 − Σ itemvar / totalvar). All variances come from exact integer
# per-user counts; per-item variance contributions quantize to milli
# before the cross-item sum.
# The Σ-of-squares lanes (q1..q5, qt) run in the DECIMAL(38,0)↔HUGEINT
# wide pair: a hot user with ~1e9 events puts a single i² ≈ 1e18 within
# 10× of int64, and the per-user totals square to 25× that.


def _cronbach_sql(wide: str) -> str:
    return f"""
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS i1,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS i2,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS i3,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              AS BIGINT) AS i4,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS i5
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(i1) AS BIGINT) AS s1,
         CAST(SUM(CAST(i1 AS {wide}) * i1) AS {wide}) AS q1,
         CAST(SUM(i2) AS BIGINT) AS s2,
         CAST(SUM(CAST(i2 AS {wide}) * i2) AS {wide}) AS q2,
         CAST(SUM(i3) AS BIGINT) AS s3,
         CAST(SUM(CAST(i3 AS {wide}) * i3) AS {wide}) AS q3,
         CAST(SUM(i4) AS BIGINT) AS s4,
         CAST(SUM(CAST(i4 AS {wide}) * i4) AS {wide}) AS q4,
         CAST(SUM(i5) AS BIGINT) AS s5,
         CAST(SUM(CAST(i5 AS {wide}) * i5) AS {wide}) AS q5,
         CAST(SUM(i1 + i2 + i3 + i4 + i5) AS BIGINT) AS st,
         CAST(SUM(CAST(i1 + i2 + i3 + i4 + i5 AS {wide})
                  * (i1 + i2 + i3 + i4 + i5)) AS {wide}) AS qt
  FROM per_user
),
vars_t AS (
  SELECT n,
         (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
         + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n)
         + (CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE) * s3 / n)
         + (CAST(q4 AS DOUBLE) - CAST(s4 AS DOUBLE) * s4 / n)
         + (CAST(q5 AS DOUBLE) - CAST(s5 AS DOUBLE) * s5 / n) AS sum_item_ss,
         CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * st / n AS total_ss
  FROM m
)
SELECT n AS n_users, CAST(5 AS BIGINT) AS k_items,
       CAST(FLOOR(sum_item_ss * 1000 / n) AS BIGINT) AS sum_item_var_milli,
       CAST(FLOOR(total_ss * 1000 / n) AS BIGINT) AS total_var_milli,
       CAST(FLOOR(5.0 / 4.0 * (1.0 - sum_item_ss / total_ss) * 1000)
            AS BIGINT) AS alpha_milli,
       5.0 / 4.0 * (1.0 - sum_item_ss / total_ss) >= 0.7 AS internally_consistent
FROM vars_t
"""


@query("stat_cronbach_alpha", oracle=_cronbach_sql("HUGEINT"), tags=("stats",))
def stat_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha over the five per-user engagement counts: do
    the individual signals co-vary enough to justify summing them into
    one 'engagement score' (the psychometric internal-consistency
    gate, alpha ≥ 0.7 by convention)? A fixed double expression over
    exact integer item moments; the item sums are evaluated in one
    textual order in both engines.

    Scale shape: one user-keyed conditional aggregate, one 1-row
    moment rollup."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_cronbach_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# calibration / expected calibration error of a score against outcomes
# ---------------------------------------------------------------------------

# A deterministic pseudo-model scores each user's conversion propensity
# (hash noise + a true-label lift, so the score is informative but
# imperfectly calibrated — exactly what the diagnostic must expose).
# Reliability table: per decile bin, mean score vs observed rate; ECE =
# Σ (n_bin/N)·|gap|, quantized per bin before the exact integer sum.
_CALIB_SQL = """
WITH scored AS (
  SELECT user_id,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS label,
         CAST(((user_id * 2654435761 + 42) % 500000)
              + MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                * 300000 + 100000 AS BIGINT) AS score_ppm
  FROM events GROUP BY user_id
),
binned AS (
  SELECT CAST(FLOOR(score_ppm / 100000.0) AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(score_ppm) AS BIGINT) AS s_score,
         CAST(SUM(label) AS BIGINT) AS s_label
  FROM scored GROUP BY 1
),
gaps AS (
  SELECT bin, n,
         CAST(FLOOR(CAST(s_score AS DOUBLE) / n) AS BIGINT) AS mean_score_ppm,
         CAST(FLOOR(s_label * 1000000.0 / n) AS BIGINT) AS obs_rate_ppm,
         CAST(ABS(CAST(FLOOR(CAST(s_score AS DOUBLE) / n) AS BIGINT)
                  - CAST(FLOOR(s_label * 1000000.0 / n) AS BIGINT))
              AS BIGINT) AS gap_ppm
  FROM binned
)
SELECT bin, n, mean_score_ppm, obs_rate_ppm, gap_ppm,
       CAST(FLOOR(CAST(SUM(n * gap_ppm) OVER () AS DOUBLE)
                  / SUM(n) OVER ()) AS BIGINT) AS ece_ppm
FROM gaps
"""


@query("stat_calibration_ece", oracle=_CALIB_SQL, tags=("stats", "eval"))
def stat_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table + expected calibration error for a propensity
    score against realized conversions: per score decile, predicted
    vs observed rate and the gap, with the n-weighted ECE the whole
    table rolls up to — the diagnostic that says whether a model's
    probabilities can be TRUSTED as probabilities (ranking metrics
    like the transition-model accuracy can't). Gap quantizes per bin
    before the exact weighted sum.

    Scale shape: one user rollup, one decile-keyed aggregate — the
    reliability table is always 10 rows no matter the corpus."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_CALIB_SQL)


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank: nonparametric paired before/after test
# ---------------------------------------------------------------------------

# Pairs: each user's event count in the first vs second half of the
# observed span (split at the median epoch day — percentile_disc is
# exact in both engines). Zero differences drop (standard Wilcoxon);
# tied |d| get AVERAGE ranks, carried exactly as rank×2 integers
# (2·RANK + ties − 1). W⁺, W⁻ are exact integer x2 lanes; the normal
# approximation z (with tie correction) is quantized to milli.
_WILCOXON_TEMPLATE = """
WITH d0 AS (
  SELECT user_id, {EPOCH_DAY} AS day_n FROM events
),
med AS (
  SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY day_n)
              AS BIGINT) AS md
  FROM d0
),
pairs AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN day_n <= md THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN day_n >  md THEN 1 ELSE 0 END)
              AS BIGINT) AS n2
  FROM d0 CROSS JOIN med GROUP BY user_id, md
),
d AS (
  SELECT user_id, n2 - n1 AS diff, abs(n2 - n1) AS absd
  FROM pairs WHERE n2 <> n1
),
ranked AS (
  SELECT user_id, diff, absd,
         CAST(2 * RANK() OVER (ORDER BY absd)
              + COUNT(*) OVER (PARTITION BY absd) - 1 AS BIGINT) AS ar_x2,
         CAST(COUNT(*) OVER (PARTITION BY absd) AS BIGINT) AS tie_n
  FROM d
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN diff > 0 THEN ar_x2 ELSE 0 END) AS BIGINT)
           AS w_plus_x2,
         CAST(SUM(CASE WHEN diff < 0 THEN ar_x2 ELSE 0 END) AS BIGINT)
           AS w_minus_x2
  FROM ranked
),
ties AS (
  SELECT CAST(COALESCE(SUM(CAST(t AS {WIDE}) * t * t - t), 0) AS {WIDE})
           AS tie_term
  FROM (SELECT absd, CAST(COUNT(*) AS BIGINT) AS t
        FROM d GROUP BY absd) g
  WHERE t > 1
)
SELECT a.n AS n_pairs, a.w_plus_x2, a.w_minus_x2,
       CAST(FLOOR(
         (CAST(a.w_plus_x2 AS DOUBLE) / 2 - CAST(a.n AS DOUBLE) * (a.n + 1) / 4)
         / SQRT(CAST(a.n AS DOUBLE) * (a.n + 1) * (2 * a.n + 1) / 24
                - CAST(t.tie_term AS DOUBLE) / 48)
         * 1000) AS BIGINT) AS z_milli
FROM agg a CROSS JOIN ties t
"""

# Tie-term lane wide: t³ over tie-group sizes t ≈ n/|distinct absd|
# kills int64 at ~1e8 nonzero-diff users — a decade and a half BEFORE
# the documented ×2-rank-sum OUTPUT cliff (w_plus_x2 ≈ n² > int64 at
# ~3e9 users, a loud reporting-width cast both engines share).
_WILCOXON_ORACLE = _WILCOXON_TEMPLATE.format(
    EPOCH_DAY="CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))"
    " AS BIGINT)",
    WIDE="HUGEINT",
)
_WILCOXON_SPARK = _WILCOXON_TEMPLATE.format(
    EPOCH_DAY="CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)",
    WIDE="DECIMAL(38,0)",
)


@query("stat_wilcoxon_signed_rank", oracle=_WILCOXON_ORACLE, tags=("stats",))
def stat_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on paired per-user activity (first vs
    second half of the observed span): the NONPARAMETRIC complement to
    ``stat_paired_ttest`` — rank-based, so one whale user changing by
    10,000 events cannot swamp the verdict the way it swamps a mean.
    Zero diffs drop, tied |d| take exact average ranks (integer ×2
    lanes), and the tie-corrected normal z is milli-quantized.

    Scale shape: one user-keyed aggregate (partial+final); the
    tie-average ranks never materialize per row — 2·RANK + ties − 1 is
    a function of each distinct |d| (2·cumlt + t + 1), so a per-value
    aggregate + the two-phase exact prefix sum
    (``operators.ordinal.global_cum``, exclusive) replace the oracle's
    user-sized global rank window. The median-day split is a 1-row
    scalar broadcast."""
    register_views(spark, sf_dir, ("events",))
    # shared CTE text through the diff table d; ranks via the ordinal
    front = _WILCOXON_SPARK.split("ranked AS")[0].rstrip().rstrip(",")
    d = spark.sql(front + "\nSELECT user_id, diff, absd FROM d")
    per = d.groupBy("absd").agg(
        F.count(F.lit(1)).cast("long").alias("t_v"),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0))
        .cast("long")
        .alias("pos_v"),
        F.sum(F.when(F.col("diff") < 0, 1).otherwise(0))
        .cast("long")
        .alias("neg_v"),
    )
    per = global_cum(
        per,
        [F.col("absd")],
        F.col("absd"),
        F.col("t_v"),
        inclusive=False,
        out="cumlt",
    ).withColumn("cumlt", F.coalesce(F.col("cumlt"), F.lit(0)))
    ar_x2 = 2 * F.col("cumlt") + F.col("t_v") + 1  # = 2·RANK + ties − 1
    sums = per.agg(
        F.coalesce(F.sum("t_v"), F.lit(0)).cast("long").alias("n"),
        F.sum(F.col("pos_v") * ar_x2).cast("long").alias("w_plus_x2"),
        F.sum(F.col("neg_v") * ar_x2).cast("long").alias("w_minus_x2"),
        # wide lane (cf. the template's {WIDE} tie_term): t³ over
        # tie-group sizes dies in int64 at ~1e8 nonzero-diff users
        F.coalesce(
            F.sum(
                F.when(
                    F.col("t_v") > 1,
                    F.col("t_v").cast("decimal(38,0)")
                    * F.col("t_v")
                    * F.col("t_v")
                    - F.col("t_v"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("tie_term"),
    )
    return sums.select(
        F.col("n").alias("n_pairs"),
        "w_plus_x2",
        "w_minus_x2",
        F.expr(
            "CAST(FLOOR("
            "(CAST(w_plus_x2 AS DOUBLE) / 2 - CAST(n AS DOUBLE) * (n + 1) / 4)"
            " / SQRT(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24"
            "        - CAST(tie_term AS DOUBLE) / 48)"
            " * 1000) AS BIGINT)"
        ).alias("z_milli"),
    )


# ---------------------------------------------------------------------------
# Brown–Forsythe: robust homogeneity-of-variance across groups
# ---------------------------------------------------------------------------

# z_ij = |cents_ij − group-median cents| (exact integers: percentile_disc
# on integer cents); the F statistic folds from exact integer moments
# (Σz, Σz², n per group) in IEEE-exact double expressions, milli-quantized.
# The Σz² lane runs in the DECIMAL(38,0)↔HUGEINT wide pair: zv ≤ ~1e5
# cents so zv² ≤ 1e10, and 1e12 rows per group put Σzv² ≈ 1e22 past
# int64 (the same bound that widened _mde/_bh/_qq in round 10).


def _levene_sql(wide: str) -> str:
    return f"""
WITH v AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
gm AS (
  SELECT event_type,
         CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT)
           AS med
  FROM v GROUP BY event_type
),
z AS (
  SELECT v.event_type, abs(v.cents - gm.med) AS zv
  FROM v JOIN gm ON gm.event_type = v.event_type
),
g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(zv) AS BIGINT) AS s,
         CAST(SUM(CAST(zv AS {wide}) * zv) AS {wide}) AS q
  FROM z GROUP BY event_type
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(s) AS BIGINT) AS ss
  FROM g
),
parts AS (
  SELECT t.k, t.nn,
         SUM(CAST(g.n AS DOUBLE)
             * (CAST(g.s AS DOUBLE) / g.n - CAST(t.ss AS DOUBLE) / t.nn)
             * (CAST(g.s AS DOUBLE) / g.n - CAST(t.ss AS DOUBLE) / t.nn))
           AS between_ss,
         SUM(CAST(g.q AS DOUBLE)
             - CAST(g.s AS DOUBLE) * g.s / g.n) AS within_ss
  FROM g CROSS JOIN tot t GROUP BY t.k, t.nn
)
SELECT k AS n_groups, nn AS n_total,
       CAST(FLOOR(between_ss / (k - 1) / (within_ss / (nn - k)) * 1000)
            AS BIGINT) AS f_milli,
       between_ss / (k - 1) / (within_ss / (nn - k))
         > 1.0 + 4.0 / SQRT(CAST(nn AS DOUBLE)) AS heteroscedastic
FROM parts
"""


@query("stat_brown_forsythe", oracle=_levene_sql("HUGEINT"), tags=("stats",))
def stat_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test (Levene with MEDIAN centers): are the event
    types' value spreads actually comparable? — the gate before any
    pooled-variance analysis (ANOVA, t-tests) on heterogeneous
    segments, robust to the heavy tails that break classic Levene.
    Deviations are exact integers (|cents − group median|), the F
    statistic folds from exact moments, and the verdict uses a
    rough large-sample gate (F > 1 + 4/√N).

    Scale shape: one grouped exact median (per-group sort at test SFs;
    at 100 TB swap percentile_disc for the t-digest approx — the
    moment fold is unchanged), one grouped moment aggregate, constant
    output."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_levene_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# overdispersion check: are daily counts Poisson, or do they cluster?
# ---------------------------------------------------------------------------

# Dispersion index D = s²/x̄ of per-day event counts for each type;
# under Poisson D ≈ 1 with (n−1)·D ~ χ²(n−1), so the gate is
# D > 1 + 2·sqrt(2/(n−1)) (the ~2σ cut). Counts are exact integers →
# moments exact; one division + one sqrt, milli-quantized.
# The Σy² lane runs in the DECIMAL(38,0)↔HUGEINT wide pair: at the
# 1e12-row target a single day's count y ≈ 1e10 makes y² ≈ 1e20 exceed
# int64 on its own (the bound the round-10 Granger note cited).


def _overdisp_sql(wide: str) -> str:
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS s,
         CAST(SUM(CAST(y AS {wide}) * y) AS {wide}) AS q
  FROM daily GROUP BY event_type
)
SELECT event_type, n AS n_days, s AS n_events,
       CAST(FLOOR(CAST(s AS DOUBLE) / n * 1000) AS BIGINT) AS mean_milli,
       CAST(FLOOR(
         (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)
         / (CAST(s AS DOUBLE) / n) * 1000) AS BIGINT) AS dispersion_milli,
       (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)
         / (CAST(s AS DOUBLE) / n)
         > 1.0 + 2.0 * SQRT(2.0 / (n - 1)) AS overdispersed
FROM m
WHERE n > 1 AND s > 0
"""


@query(
    "stat_overdispersion", oracle=_overdisp_sql("HUGEINT"), tags=("stats",)
)
def stat_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson overdispersion check on daily event counts per type:
    dispersion index D = variance/mean with the ~2σ χ² gate — the
    one-number answer to 'can I model these counts as Poisson, or do
    they burst?' (overdispersed ⇒ negative-binomial / quasi-likelihood
    models, and wider alert thresholds in ``evt_anomaly_zscore``-style
    monitors; the per-user twin of this verdict is
    ``evt_burstiness_fano``'s Fano factor).

    Scale shape: one daily rollup + one per-type moment fold — both
    map-side combinable; output is type-count rows."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_overdisp_sql("DECIMAL(38,0)"))
