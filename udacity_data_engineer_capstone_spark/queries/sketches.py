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
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table, register_views
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


# ---------------------------------------------------------------------------
# hand-rolled count-min sketch (bit-identical in both engines)
# ---------------------------------------------------------------------------

_CM_D = 3  # hash rows
_CM_W = 256  # buckets per row

# Portable hex digit -> value: instr/strpos are 1-based in both engines.
# bucket_i(key) = (hexval(h1)*16 + hexval(h2)) of md5('cm<i>:' || key),
# i.e. the first byte of the digest — 0..255, identical text both sides.


def _bucket_sql(i: int, key: str) -> str:
    h = f"md5(concat('cm{i}:', CAST({key} AS STRING)))"
    return (
        f"(instr('0123456789abcdef', substring({h}, 1, 1)) - 1) * 16"
        f" + (instr('0123456789abcdef', substring({h}, 2, 1)) - 1)"
    )


def _bucket_duck(i: int, key: str) -> str:
    h = f"md5('cm{i}:' || CAST({key} AS VARCHAR))"
    return (
        f"(strpos('0123456789abcdef', substring({h}, 1, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substring({h}, 2, 1)) - 1)"
    )


def _cm_oracle() -> str:
    probes = "\nUNION ALL\n".join(
        f"SELECT cust_key, exact_cnt, {d} AS d, "
        f"{_bucket_duck(d, 'cust_key')} AS bucket FROM keys"
        for d in range(_CM_D)
    )
    rows = "\nUNION ALL\n".join(
        f"SELECT {d} AS d, {_bucket_duck(d, 'cust_key')} AS bucket, "
        f"exact_cnt FROM keys"
        for d in range(_CM_D)
    )
    return f"""
WITH keys AS (
  SELECT o_custkey AS cust_key, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM orders GROUP BY o_custkey
),
sketch AS (
  SELECT d, bucket, CAST(SUM(exact_cnt) AS BIGINT) AS cnt
  FROM ({rows}) GROUP BY d, bucket
),
est AS (
  SELECT p.cust_key, p.exact_cnt, CAST(MIN(s.cnt) AS BIGINT) AS est_cnt
  FROM ({probes}) p JOIN sketch s ON s.d = p.d AND s.bucket = p.bucket
  GROUP BY p.cust_key, p.exact_cnt
)
SELECT cust_key, exact_cnt, est_cnt,
       CAST(est_cnt - exact_cnt AS BIGINT) AS overcount
FROM est
"""


@query("agg_count_min", oracle=_cm_oracle(), tags=("agg", "sketch"))
def agg_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation, hand-rolled from DataFrame
    ops so the mechanics are visible and the result is bit-identical in
    both engines (md5-derived buckets — no engine-private hash). Build:
    per-key counts fold into a d×w integer grid (d=3 rows, w=256
    buckets) — a fixed ~768-cell aggregate regardless of corpus size,
    the mergeable map-side structure that makes CMS the streaming
    heavy-hitter sketch. Probe: each key reads its d cells and takes the
    min. CMS guarantees est ≥ exact (``overcount`` is provably ≥ 0 —
    a structural property the oracle verifies exactly, not a tolerance
    band).

    Scale shape: the only full-width shuffle is the initial per-key
    count; the sketch itself is w·d cells and the probe joins against it
    broadcast-size. At 100 TB the grid widens (w ∝ 1/ε) but stays KBs."""
    orders = load_table(spark, sf_dir, "orders")
    keys = (
        orders.groupBy(F.col("o_custkey").alias("cust_key"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .localCheckpoint(eager=False)  # reused: build + probe
    )
    rows = None
    for d in range(_CM_D):
        part = keys.select(
            F.lit(d).alias("d"),
            F.expr(_bucket_sql(d, "cust_key")).alias("bucket"),
            "exact_cnt",
        )
        rows = part if rows is None else rows.union(part)
    sketch = rows.groupBy("d", "bucket").agg(
        F.sum("exact_cnt").cast("long").alias("cnt")
    )
    probes = None
    for d in range(_CM_D):
        part = keys.select(
            "cust_key",
            "exact_cnt",
            F.lit(d).alias("d"),
            F.expr(_bucket_sql(d, "cust_key")).alias("bucket"),
        )
        probes = part if probes is None else probes.union(part)
    est = (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("cust_key", "exact_cnt")
        .agg(F.min("cnt").cast("long").alias("est_cnt"))
    )
    return est.select(
        "cust_key",
        "exact_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("exact_cnt")).cast("long").alias("overcount"),
    )


# ---------------------------------------------------------------------------
# exact distinct via bitmap aggregates (Spark 3.5+ bitmap functions)
# ---------------------------------------------------------------------------

_BITMAP_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
GROUP BY o_orderstatus
"""


@query("agg_bitmap_distinct", oracle=_BITMAP_ORACLE, tags=("agg", "sketch"))
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting via Spark's bitmap aggregate family:
    keys fold into 32 KB roaring-style bitmap segments per
    (group, bucket) — ``bitmap_construct_agg(bitmap_bit_position(k))``
    — then ``bitmap_count`` sums bits per group. Unlike HLL this is
    EXACT, so the oracle is a plain COUNT(DISTINCT); unlike
    COUNT(DISTINCT) the shuffle carries fixed-size bitmaps instead of
    every distinct value — the warehouse pattern for distinct-heavy
    rollups over high-cardinality keys at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    seg = orders.groupBy(
        "o_orderstatus",
        F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias(
            "bm"
        )
    )
    return seg.groupBy("o_orderstatus").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# k-minimum-values (KMV / theta-style) distinct sketch
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_HEX_DIGITS = 6  # 24-bit hash values: plenty of headroom above k


def _hex_int_sql(h: str, pos_fn: str) -> str:
    """hex-prefix -> integer with identical 1-based ``instr``/``strpos``
    arithmetic in both engines (no ``conv`` in DuckDB, no ``from_hex``
    int in Spark)."""
    terms = [
        f"({pos_fn}('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (_KMV_HEX_DIGITS - 1 - i)}"
        for i in range(_KMV_HEX_DIGITS)
    ]
    return "(" + " + ".join(terms) + ")"


def _kmv_sql(pos_fn: str, div: str) -> str:
    h = "md5(concat('kmv:', CAST(user_id AS STRING)))"
    return f"""
WITH hashed AS (
  SELECT DISTINCT event_type, {_hex_int_sql(h, pos_fn)} AS hv
  FROM events
),
ranked AS (
  SELECT event_type, hv,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rk
  FROM hashed
),
kth AS (
  SELECT event_type, hv AS kth_hv FROM ranked WHERE rk = {_KMV_K}
),
exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       e.exact_distinct,
       CAST(({_KMV_K} - 1) * {16 ** _KMV_HEX_DIGITS} {div} k.kth_hv AS BIGINT)
         AS kmv_estimate,
       CAST(ABS(CAST(({_KMV_K} - 1) * {16 ** _KMV_HEX_DIGITS} {div} k.kth_hv AS BIGINT)
                - e.exact_distinct) <= CAST(0.5 * e.exact_distinct AS BIGINT)
            AS BOOLEAN) AS within_50pct
FROM exact e JOIN kth k ON k.event_type = e.event_type
"""


@query(
    "agg_kmv_distinct",
    oracle=_kmv_sql("strpos", "//"),
    tags=("agg", "sketch"),
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch (the theta-sketch primitive):
    hash every key with md5, keep the k smallest distinct hash values per
    group, and estimate distinct = (k-1) * H / h_(k) where H is the hash
    space size. Because the hash is md5 (not an engine-private function),
    the ESTIMATE ITSELF is bit-identical in both engines — the oracle
    checks the approximate value exactly, plus the exact distinct count
    and a 2-sigma-ish error-band boolean (k=64 -> RSE ~ 1/sqrt(62) ~ 13%).

    Scale shape: the per-group state is k 24-bit integers regardless of
    cardinality — mergeable map-side like HLL but with exact set-ops
    composability (union = merge bottom-k, intersect via inclusion-
    exclusion on theta). The window is over ≤ distinct-hash rows per
    group; the heavy lifting (DISTINCT on (group, hash)) is one
    hash-width shuffle with partial aggregation."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_kmv_sql("instr", "DIV"))


# ---------------------------------------------------------------------------
# log2-bucketed latency histogram (HdrHistogram shape)
# ---------------------------------------------------------------------------

# Bucket index = bit length of the integer cents value — an EXACT
# power-of-two bucketing (no runtime log2, whose last-ulp rounding at
# exact powers of two differs across libm implementations). Spark
# length(conv(x,10,2)) ≡ DuckDB length(bin(x)).
_LATHIST_SQL_DUCK = """
WITH vals AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
  WHERE floor(value * 100 + 0.5) >= 1
),
bucketed AS (
  SELECT event_type, CAST(length(bin(cents)) AS INT) AS bucket, cents
  FROM vals
)
SELECT event_type, bucket,
       CAST(1 << (bucket - 1) AS BIGINT) AS bucket_lo,
       CAST((1 << bucket) - 1 AS BIGINT) AS bucket_hi,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(cents) AS BIGINT) AS min_cents,
       CAST(MAX(cents) AS BIGINT) AS max_cents
FROM bucketed
GROUP BY event_type, bucket
"""


@query("agg_latency_histogram", oracle=_LATHIST_SQL_DUCK, tags=("agg", "sketch"))
def agg_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HdrHistogram-style log2-bucketed value histogram per event type —
    the constant-relative-error latency sketch dashboards aggregate at
    scale. Bucketing is the integer's bit length (exact, no floating
    log2), so the histogram is one hash aggregate with map-side combine
    and merges associatively across any partitioning."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    vals = ev.select("event_type", cents.alias("cents")).where(
        F.col("cents") >= 1
    )
    bucketed = vals.select(
        "event_type",
        F.length(F.conv(F.col("cents"), 10, 2)).cast("int").alias("bucket"),
        "cents",
    )
    return (
        bucketed.groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .select(
            "event_type",
            "bucket",
            F.expr("CAST(shiftleft(1L, bucket - 1) AS BIGINT)").alias("bucket_lo"),
            F.expr("CAST(shiftleft(1L, bucket) - 1 AS BIGINT)").alias("bucket_hi"),
            "n",
            "min_cents",
            "max_cents",
        )
    )


# ---------------------------------------------------------------------------
# theta-sketch set operations (union / intersection estimates)
# ---------------------------------------------------------------------------

# The KMV estimator above answers "how many distinct"; the theta sketch
# extends it to SET ALGEBRA: cut both bottom-k samples at a common
# threshold theta = min(theta_A, theta_B), and any set expression over
# the *samples* estimates the same expression over the *sets*, scaled by
# H/theta. Because the hash is md5 (engine-neutral), the estimates are
# bit-identical in both engines, so the oracle checks them exactly —
# alongside the exact ground truth (the exact/approximate contrast
# mirrors `evt_audience_overlap`, the exact version of this question).

_THETA_K = 256
_THETA_HEX = 6  # 24-bit hash space, same lanes as the KMV sketch
_THETA_H = 16**_THETA_HEX


def _theta_hex_int(h: str, pos_fn: str) -> str:
    terms = [
        f"({pos_fn}('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (_THETA_HEX - 1 - i)}"
        for i in range(_THETA_HEX)
    ]
    return "(" + " + ".join(terms) + ")"


def _theta_sql(pos_fn: str, div: str) -> str:
    h = _theta_hex_int("md5(concat('th:', CAST(k AS STRING)))", pos_fn)
    return f"""
WITH keys_a AS (
  SELECT DISTINCT user_id * 100 + day(ts) AS k
  FROM events WHERE event_type = 'click'
),
keys_b AS (
  SELECT DISTINCT user_id * 100 + day(ts) AS k
  FROM events WHERE event_type = 'view'
),
hv_a AS (SELECT DISTINCT {h} AS hv FROM keys_a),
hv_b AS (SELECT DISTINCT {h} AS hv FROM keys_b),
th_a AS (
  SELECT CASE WHEN MAX(cnt) >= {_THETA_K}
              THEN MAX(CASE WHEN rk = {_THETA_K} THEN hv END)
              ELSE {_THETA_H} END AS th
  FROM (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rk,
               COUNT(*) OVER () AS cnt FROM hv_a)
),
th_b AS (
  SELECT CASE WHEN MAX(cnt) >= {_THETA_K}
              THEN MAX(CASE WHEN rk = {_THETA_K} THEN hv END)
              ELSE {_THETA_H} END AS th
  FROM (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rk,
               COUNT(*) OVER () AS cnt FROM hv_b)
),
theta AS (SELECT LEAST(a.th, b.th) AS th FROM th_a a CROSS JOIN th_b b),
u_cnt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT hv FROM hv_a UNION SELECT hv FROM hv_b) u CROSS JOIN theta t
  WHERE u.hv < t.th
),
i_cnt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT hv FROM hv_a INTERSECT SELECT hv FROM hv_b) i CROSS JOIN theta t
  WHERE i.hv < t.th
),
exact AS (
  SELECT
    CAST((SELECT COUNT(*) FROM keys_a) AS BIGINT) AS n_a,
    CAST((SELECT COUNT(*) FROM keys_b) AS BIGINT) AS n_b,
    CAST((SELECT COUNT(*) FROM
           (SELECT k FROM keys_a UNION SELECT k FROM keys_b)) AS BIGINT)
      AS n_union,
    CAST((SELECT COUNT(*) FROM
           (SELECT k FROM keys_a INTERSECT SELECT k FROM keys_b)) AS BIGINT)
      AS n_inter
)
SELECT e.n_a, e.n_b, e.n_union, e.n_inter,
       CAST(u.c * {_THETA_H} {div} t.th AS BIGINT) AS est_union,
       CAST(i.c * {_THETA_H} {div} t.th AS BIGINT) AS est_inter,
       CAST(CASE WHEN u.c = 0 THEN 0
                 ELSE i.c * 1000000 {div} u.c END AS BIGINT)
         AS jaccard_ppm_est,
       CAST(ABS(CAST(u.c * {_THETA_H} {div} t.th AS BIGINT) - e.n_union)
              <= CAST(0.25 * e.n_union AS BIGINT) AS BOOLEAN) AS union_ok,
       CAST(ABS(CAST(i.c * {_THETA_H} {div} t.th AS BIGINT) - e.n_inter)
              <= CAST(0.25 * e.n_inter + 8 AS BIGINT) AS BOOLEAN) AS inter_ok
FROM exact e
CROSS JOIN theta t CROSS JOIN u_cnt u CROSS JOIN i_cnt i
"""


@query(
    "agg_theta_sketch_setops",
    oracle=_theta_sql("strpos", "//"),
    tags=("agg", "sketch"),
)
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra: estimate |A∪B|, |A∩B| and Jaccard of
    two audience key sets (distinct (user, day) pairs for 'click' vs
    'view') from bottom-k md5 sketches cut at a common threshold
    theta = min(theta_A, theta_B) — the Apache DataSketches pattern for
    composable audience overlap without ever shuffling raw keys.

    Because the hash is md5, the ESTIMATES are bit-identical across
    engines and the oracle checks them exactly, next to the exact
    ground-truth counts and error-band booleans (k=256 → RSE ≈ 6%; the
    intersection band carries a +8 absolute floor because resampling
    error is relative to the *union*, not the intersection).

    Scale shape: production keeps the per-set state at k 24-bit values
    via per-partition bottom-k + merge (mergeable like HLL, but closed
    under ∪/∩/∖). The Spark side finds each threshold with a bottom-k
    ``ORDER BY hv LIMIT k`` (TakeOrderedAndProject: per-partition
    top-k + k-width merge — never the oracle's rank window over the
    full distinct-hash set); the corpus-sized work is the DISTINCT,
    one hash-width shuffle with map-side partials. The exact
    ground-truth twins are ONE aggregation pass over that same
    checkpointed frame (per-key side flags → four sums), and the
    sketch set-ops run over samples CUT AT THETA first (≤ k rows per
    side) — the round-8 smoke's 3.0× row was these stages re-deduping
    the full key space per subquery. Because the SQL
    text references each side's key set from several CTEs (thresholds,
    union/intersect counts, exact truth) and Spark inlines CTEs, the
    distinct key set is materialized ONCE via localCheckpoint — one
    events scan total instead of ~8 (bench: 5.3 s → well under 2 s at
    sf0.1; DuckDB gets the same effect from its MATERIALIZED
    default)."""
    register_views(spark, sf_dir, ("events",))
    keys = spark.sql(
        "SELECT DISTINCT event_type, user_id * 100 + day(ts) AS k "
        "FROM events WHERE event_type IN ('click', 'view')"
    ).localCheckpoint()
    keys.createOrReplaceTempView("theta_keys_m")
    sql = (
        _theta_sql("instr", "DIV")
        .replace(
            "SELECT DISTINCT user_id * 100 + day(ts) AS k\n"
            "  FROM events WHERE event_type = 'click'",
            "SELECT k FROM theta_keys_m WHERE event_type = 'click'",
        )
        .replace(
            "SELECT DISTINCT user_id * 100 + day(ts) AS k\n"
            "  FROM events WHERE event_type = 'view'",
            "SELECT k FROM theta_keys_m WHERE event_type = 'view'",
        )
    )
    # the k-th-smallest hash via bottom-k LIMIT (TakeOrderedAndProject)
    # instead of the oracle's rank window over the full hash set
    for s in ("a", "b"):
        old = f"""th_{s} AS (
  SELECT CASE WHEN MAX(cnt) >= {_THETA_K}
              THEN MAX(CASE WHEN rk = {_THETA_K} THEN hv END)
              ELSE {_THETA_H} END AS th
  FROM (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rk,
               COUNT(*) OVER () AS cnt FROM hv_{s})
)"""
        new = f"""th_{s} AS (
  SELECT CASE WHEN COUNT(*) >= {_THETA_K} THEN MAX(hv)
              ELSE {_THETA_H} END AS th
  FROM (SELECT hv FROM hv_{s} ORDER BY hv LIMIT {_THETA_K})
)"""
        assert old in sql, f"theta template drifted for side {s}"
        sql = sql.replace(old, new)
    # exact ground-truth twins from ONE pass over the checkpointed
    # distinct-key frame (round-8 smoke: the 4 separate COUNT/UNION/
    # INTERSECT subqueries re-deduped the full key space and scaled
    # 3.0x at 10x keys): per-key side flags, then four sums — a single
    # shuffle over rows that are already distinct per (side, k)
    old_exact = """exact AS (
  SELECT
    CAST((SELECT COUNT(*) FROM keys_a) AS BIGINT) AS n_a,
    CAST((SELECT COUNT(*) FROM keys_b) AS BIGINT) AS n_b,
    CAST((SELECT COUNT(*) FROM
           (SELECT k FROM keys_a UNION SELECT k FROM keys_b)) AS BIGINT)
      AS n_union,
    CAST((SELECT COUNT(*) FROM
           (SELECT k FROM keys_a INTERSECT SELECT k FROM keys_b)) AS BIGINT)
      AS n_inter
)"""
    new_exact = """exact AS (
  SELECT CAST(SUM(has_a) AS BIGINT) AS n_a,
         CAST(SUM(has_b) AS BIGINT) AS n_b,
         CAST(COUNT(*) AS BIGINT) AS n_union,
         CAST(SUM(has_a * has_b) AS BIGINT) AS n_inter
  FROM (SELECT k,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_a,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_b
        FROM theta_keys_m GROUP BY k)
)"""
    assert old_exact in sql, "theta template drifted (exact CTE)"
    sql = sql.replace(old_exact, new_exact)
    # cut BOTH samples at theta BEFORE the set ops (the DataSketches
    # shape: set algebra over <= k-row samples, not over the full
    # distinct-hash sets) — the filter commutes with UNION/INTERSECT
    # element-wise, so the counts are identical and the union-distinct
    # shuffle drops from |hv_a|+|hv_b| rows to <= 2k
    old_cnt = """u_cnt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT hv FROM hv_a UNION SELECT hv FROM hv_b) u CROSS JOIN theta t
  WHERE u.hv < t.th
),
i_cnt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT hv FROM hv_a INTERSECT SELECT hv FROM hv_b) i CROSS JOIN theta t
  WHERE i.hv < t.th
),"""
    new_cnt = f"""sample_a AS (
  SELECT hv FROM hv_a CROSS JOIN theta t WHERE hv < t.th
),
sample_b AS (
  SELECT hv FROM hv_b CROSS JOIN theta t WHERE hv < t.th
),
u_cnt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT hv FROM sample_a UNION SELECT hv FROM sample_b) u
),
i_cnt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT hv FROM sample_a INTERSECT SELECT hv FROM sample_b) i
),"""
    assert old_cnt in sql, "theta template drifted (sample counts)"
    sql = sql.replace(old_cnt, new_cnt)
    assert "FROM events WHERE event_type = " not in sql
    assert "ROW_NUMBER" not in sql
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# percentile read-out from the log2 histogram sketch
# ---------------------------------------------------------------------------

# The query side of agg_latency_histogram's write side: reconstruct
# p50/p90/p99 from bucket counts alone. Each answer is the upper edge
# (2^b − 1 cents) of the first bucket whose cumulative count reaches
# ceil(q·total) — a guaranteed upper bound with the sketch's
# 2× relative resolution, computed in pure integers.
_HIST_PCT_SQL = """
WITH cents AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
buckets AS (
  SELECT event_type,
         CAST(FLOOR(LOG2(c)) + 1 AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cents WHERE c >= 1
  GROUP BY 1, 2
),
cum AS (
  SELECT event_type, b, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY b)
              AS BIGINT) AS running,
         CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total
  FROM buckets
)
SELECT event_type, MAX(total) AS n_values,
       CAST(MIN(CASE WHEN running * 2 >= total THEN b END) AS BIGINT)
         AS p50_bucket,
       CAST(MIN(CASE WHEN running * 10 >= total * 9 THEN b END) AS BIGINT)
         AS p90_bucket,
       CAST(MIN(CASE WHEN running * 100 >= total * 99 THEN b END) AS BIGINT)
         AS p99_bucket
FROM cum
GROUP BY event_type
"""


@query(
    "agg_histogram_percentiles",
    oracle=_HIST_PCT_SQL,
    tags=("agg", "sketch"),
)
def agg_histogram_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile read-out from the mergeable log2 histogram — the
    dashboard query that turns ``agg_latency_histogram``'s bucket
    counts into p50/p90/p99 bucket answers without ever revisiting
    raw values. Quantile thresholds use integer cross-multiplication
    (running·k ≥ total·q), so no division enters the verdict.

    Scale shape: sketch-sized everything — the only corpus pass is
    the bucket build, and merged histograms from many partitions
    answer the same query unchanged (the sketch property)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_HIST_PCT_SQL)


# ---------------------------------------------------------------------------
# quantile serving from the mergeable log2 histogram
# ---------------------------------------------------------------------------

# The read side of ``agg_latency_histogram``: p50/p95/p99 BRACKETS from
# cumulative bucket counts — rank thresholds via integer
# cross-multiplication (cum·100 ≥ p·total), no division anywhere, so
# the answer is exact given the histogram (value-exactness is bounded
# by the bucket's log2 width, the HdrHistogram contract).
_HISTQ_TEMPLATE = """
WITH v AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
  WHERE floor(value * 100 + 0.5) >= 1
),
b AS (
  SELECT event_type, CAST(length({BITLEN}) AS BIGINT) AS bucket FROM v
),
h AS (
  SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n
  FROM b GROUP BY event_type, bucket
),
c AS (
  SELECT event_type, bucket, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY bucket
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS tot
  FROM h
),
q AS (
  SELECT event_type, CAST(tot AS BIGINT) AS n,
         CAST(MIN(CASE WHEN cum * 100 >= 50 * tot THEN bucket END)
              AS BIGINT) AS p50_b,
         CAST(MIN(CASE WHEN cum * 100 >= 95 * tot THEN bucket END)
              AS BIGINT) AS p95_b,
         CAST(MIN(CASE WHEN cum * 100 >= 99 * tot THEN bucket END)
              AS BIGINT) AS p99_b
  FROM c GROUP BY event_type, tot
)
SELECT event_type, n,
       CAST(1 AS BIGINT) << CAST(p50_b - 1 AS INT) AS p50_lo_cents,
       (CAST(1 AS BIGINT) << CAST(p50_b AS INT)) - 1 AS p50_hi_cents,
       CAST(1 AS BIGINT) << CAST(p95_b - 1 AS INT) AS p95_lo_cents,
       (CAST(1 AS BIGINT) << CAST(p95_b AS INT)) - 1 AS p95_hi_cents,
       CAST(1 AS BIGINT) << CAST(p99_b - 1 AS INT) AS p99_lo_cents,
       (CAST(1 AS BIGINT) << CAST(p99_b AS INT)) - 1 AS p99_hi_cents
FROM q
"""


@query(
    "agg_histogram_quantile_serve",
    oracle=_HISTQ_TEMPLATE.format(BITLEN="bin(cents)"),
    tags=("agg", "sketch"),
)
def agg_histogram_quantile_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile SERVING from the mergeable log2 histogram — the read
    path that makes ``agg_latency_histogram`` a complete latency-SLO
    stack: p50/p95/p99 brackets recovered from cumulative bucket
    counts with integer cross-multiplied rank thresholds (cum·100 ≥
    p·n — no division, no float). The bracket width is the log2 bucket
    (constant RELATIVE error), which is precisely what HdrHistogram
    promises and what an SLO check needs ('p99 under 2.56 s' is a
    bucket boundary question).

    Scale shape: identical to the histogram (one hash aggregate with
    map-side combine) plus bucket-count-sized windows — the sketch
    merges associatively across shards/days and this read costs
    nothing more."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_HISTQ_TEMPLATE.format(BITLEN="conv(cents, 10, 2)"))
