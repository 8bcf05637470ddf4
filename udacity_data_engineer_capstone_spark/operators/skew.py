"""Skew-mitigation join variants (SURVEY §7 M4).

AQE's skew-join splitting handles most skew automatically (on in
session.py); this module provides the *manual* salting pattern for the
pathological cases AQE can't split (e.g. a single key holding >50% of a
100 TB fact table, or skew under a non-shuffle join constraint).

The salted join is semantically identical to the plain join — which is
exactly what its oracle asserts (the oracle is the *unsalted* SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table
from udacity_data_engineer_capstone_spark.registry import query

SALT_BUCKETS = 8


def salted_equijoin(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_expr,
    buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """The manual salting pattern as a reusable operator: the fact side
    gets a deterministic salt in [0, buckets); the dim side is
    replicated buckets× with every salt value; the join key becomes
    (key, salt), so each hot key's rows spread over ``buckets`` shuffle
    partitions instead of landing on one straggler. Row-identical to
    the plain equi-join (the dim replication matches exactly one salt
    per fact row). ``salt_expr`` must be deterministic per row for
    reproducible plans; distribution quality is what matters.

    The salt is folded into [0, buckets) with ``pmod`` *inside* the
    helper: Spark's ``%`` and ``hash()`` are signed, so a caller passing
    the natural production salt (``F.hash(...) % buckets``) would
    otherwise produce negative salts with no matching dim replica and
    silently drop fact rows."""
    f = fact.withColumn("salt", F.pmod(salt_expr.cast("int"), F.lit(buckets)))
    d = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return f.join(
        d, (f[fact_key] == d[dim_key]) & (f["salt"] == d["salt"])
    ).drop("salt")


_SALTED_ORACLE = """
SELECT l.l_orderkey, l.l_linenumber, o.o_totalprice,
       l.l_extendedprice * (1 - l.l_discount) AS net_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


@query("join_salted_skew", oracle=_SALTED_ORACLE, tags=("join", "skew"))
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: the (conceptually skewed) fact side gets a
    deterministic salt in [0, 8); the dim side is replicated 8× with
    every salt value; the join key becomes (key, salt), spreading each
    hot key over 8 shuffle partitions. Output is row-identical to the
    plain join — verified by the unsalted oracle.

    Salt choice: ``l_linenumber % 8`` is deterministic (keeps the oracle
    exact); production salting uses a uniform random or hash salt —
    distribution quality matters, determinism doesn't. Skew ACTIVATION
    (the hot key genuinely spreading over ``SALT_BUCKETS`` shuffle
    partitions on Zipf data, and AQE's skew-split engaging on the
    unsalted plan) is pinned in tests/test_skew.py."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        salted_equijoin(
            li,
            orders,
            "l_orderkey",
            "o_orderkey",
            F.col("l_linenumber") % SALT_BUCKETS,
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_totalprice",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


# ---------------------------------------------------------------------------
# bloom-filter semi-join reduction
# ---------------------------------------------------------------------------

# Rich customers: the selective dim-side predicate the bloom filter
# carries over to the fact scan.
_BLOOM_ACCTBAL = 9000

_BLOOM_ORACLE = f"""
SELECT o.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_price_cents
FROM orders o
WHERE o.o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_acctbal > {_BLOOM_ACCTBAL})
GROUP BY o.o_orderstatus
"""


_BLOOM_BITS = 1 << 20  # 1 Mbit filter = 16 K longs ≈ 128 KB broadcast


def _bloom_pos(col: str):
    """Bit position of a key in the filter: xxhash64 folded into the bit
    space (pmod handles the signed hash)."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(_BLOOM_BITS))


@query("join_bloom_prefilter", oracle=_BLOOM_ORACLE, tags=("join", "skew"))
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join with an explicit bloom-filter runtime pre-filter — the
    pattern behind Spark's InjectRuntimeFilter (whose
    ``bloom_filter_agg`` is internal-only), hand-rolled from DataFrame
    ops so the mechanics are visible and testable.

    Build: the selective dim side hashes each key to a bit position;
    ``BIT_OR`` over shifted masks assembles a 1 Mbit filter as a 16 K-row
    (word, mask) table — a pure distributed aggregate, ~128 KB total,
    broadcast. Probe: the fact side computes the same (word, bit),
    broadcast-joins the word table, and keeps rows whose bit is set —
    all *before* the join shuffle, so only matches + false positives
    ever cross the wire. The exact left-semi join then removes the
    false positives, making the result row-identical to the plain
    semi-join — which is precisely what the oracle asserts. At 100 TB
    this is the difference between shuffling the whole fact table and
    shuffling ~the matching fraction."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > _BLOOM_ACCTBAL)
        .select("c_custkey")
    )
    words = (
        cust.select(_bloom_pos("c_custkey").alias("bp"))
        .select(
            F.expr("bp DIV 64").alias("widx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bp % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("widx")
        .agg(F.bit_or("mask").alias("word"))
    )
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "bp", _bloom_pos("o_custkey")
    )
    prefiltered = (
        orders.withColumn("widx", F.expr("bp DIV 64"))
        .join(F.broadcast(words), "widx")  # absent word ⇒ no key hashed there
        .filter(
            F.expr(
                "(word & shiftleft(CAST(1 AS BIGINT), CAST(bp % 64 AS INT))) != 0"
            )
        )
        .drop("bp", "widx", "word")
    )
    return (
        prefiltered.join(
            cust, prefiltered["o_custkey"] == cust["c_custkey"], "left_semi"
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            # exact BIGINT integer cents — no DECIMAL in the output
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("sum_price_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf skew stress (VERDICT r5 directive #4): the mitigation as a
# TRACKED BENCH NUMBER, not only a property test
# ---------------------------------------------------------------------------
#
# A deterministic Zipf-shaped key derived from lineitem: every even
# orderkey collapses onto hot key 1 (~50% of the fact table), odd keys
# spread over 2..101. The dim side is customer keyed by c_custkey, so
# the hot key always exists at every SF. The join is merge-hinted —
# without the hint the ~100-row dim broadcasts and no shuffle (hence no
# skew) ever happens; the POINT is to pay the skewed shuffle and show
# the mitigation's cost. Both variants share one unsalted oracle, so
# the driver verifies row-equivalence while bench.py tracks the wall.

_ZIPF_KEY = (
    "CASE WHEN l_orderkey % 2 = 0 THEN 1 "
    "ELSE CAST(l_orderkey % 100 + 2 AS BIGINT) END"
)

_ZIPF_ORACLE = f"""
SELECT f.k, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(f.l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_cents,
       MIN(c.c_name) AS dim_name
FROM (SELECT {_ZIPF_KEY} AS k, l_extendedprice FROM lineitem) f
JOIN customer c ON c.c_custkey = f.k
GROUP BY f.k
"""


def _zipf_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        F.expr(_ZIPF_KEY).alias("k"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("cents"),
    )


def _zipf_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), "c_name"
    )


def _zipf_rollup(joined: DataFrame) -> DataFrame:
    return joined.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.min("c_name").alias("dim_name"),
    )


@query("skew_zipf_salted", oracle=_ZIPF_ORACLE, tags=("join", "skew", "bench"))
def skew_zipf_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual salting under REAL skew: ~50% of lineitem lands on one
    key, the dim is merge-hinted (no broadcast escape), and the salted
    equi-join spreads the hot key over SALT_BUCKETS shuffle partitions
    using the production-style signed-hash salt (pmod-folded inside the
    helper). The oracle is the plain unsalted join — equivalence and
    cost are both on the record every round."""
    fact = _zipf_fact(spark, sf_dir)
    dim = _zipf_dim(spark, sf_dir).hint("merge")
    joined = salted_equijoin(
        fact, dim, "k", "ck", F.hash("cents", "k")
    )
    return _zipf_rollup(joined)


@query("skew_zipf_aqe", oracle=_ZIPF_ORACLE, tags=("join", "skew", "bench"))
def skew_zipf_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same Zipf join WITHOUT manual salting: a plain merge-hinted
    shuffle join, leaving the hot partition to AQE's skew-join splitting
    (enabled in the session; activation on Zipf data pinned in
    tests/test_skew.py). Benchmarked against ``skew_zipf_salted`` every
    round: the two mitigations' costs stay directly comparable on
    identical data, and either regressing shows up as a tracked
    number."""
    fact = _zipf_fact(spark, sf_dir)
    dim = _zipf_dim(spark, sf_dir).hint("merge")
    joined = fact.join(dim, fact["k"] == dim["ck"])
    return _zipf_rollup(joined)
