"""Two-phase exact global ordinal — the pattern that replaces the
single-partition global-window trap.

``row_number().over(Window.orderBy(...))`` with no partition columns
forces Spark to funnel the ENTIRE frame through one task (the plan
shows ``Exchange SinglePartition`` feeding the Window).  Fine for a
bounded frame; a scale-killer for a corpus- or user-sized one.  This
module provides the exact replacement, extracted from
``curate_shuffle_epoch`` (operators/curation.py), generalized to any
deterministic total order:

1. **Bucket** every row by a *monotone* function of its sort key
   (range buckets from an approximate-quantile histogram — the same
   device as external sorting's histogram pass).  Monotone means: if
   row a sorts before row b, bucket(a) <= bucket(b).  The bucket
   boundaries come from ``percentile_approx``; their QUALITY only
   affects bucket balance, never correctness, because phase 2 is exact
   within each bucket and the offsets are exact counts.
2. **Count** rows per bucket (one hash aggregate, output bounded by
   the constant bucket count), cumulative-sum the counts on the driver
   (a loop over <= ``n_buckets`` rows), and broadcast the offsets back.
3. **Rank within bucket** with ``row_number`` over
   ``Window.partitionBy(bucket).orderBy(exact keys)`` — corpus-sized
   work at bucket-level parallelism — and add the bucket's offset.

The result is the IDENTICAL rank a global window would produce for a
deterministic tie-broken ordering, so DuckDB oracle hashes are
preserved byte-for-byte, while the plan has no SinglePartition
exchange under any Window.

Sizing (the mm_phash lesson — constants must be derived, not frozen):
``n_buckets`` defaults to the session's ``spark.sql.shuffle.partitions``
clamped to [64, 1024].  The bucket count needs to be >= cluster
parallelism for the phase-3 window to use every core; bucket
assignment is a BALANCED binary-search expression tree over the
boundary literals (O(log n_buckets) comparisons per row — 10 at the
1024 cap), so widening the cap at 100 TB (65k buckets = a 65k-row
driver loop and 16 comparisons per row) changes nothing else.

Ties: the bucket key is a function of the sort key, so rows that tie
on it land in the SAME bucket and the within-bucket sort breaks the
tie exactly.  A heavily-tied key (few distinct values) therefore
degrades toward one task per distinct value — still |distinct|-way
parallel, vastly better than the 1-way global window, and the caller
can fold a high-cardinality tiebreak INTO the bucket key (see
``composite_bucket_key``) to restore full parallelism.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_MIN_BUCKETS = 64
_MAX_BUCKETS = 1024


def _bucket_expr(bounds: list[float], col: Column) -> Column:
    """Bucket id = number of (strictly sorted) boundaries <= ``col``,
    as a BALANCED binary-search tree of nested ``when`` expressions —
    O(log n_buckets) comparisons per row instead of the O(n_buckets)
    linear fold (10 comparisons at the 1024-bucket cap vs 1023), and
    no higher-order function for Catalyst to trip over."""

    def build(lo: int, hi: int) -> Column:
        if lo >= hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(
            col >= F.lit(float(bounds[mid])), build(mid + 1, hi)
        ).otherwise(build(lo, mid))

    return build(0, len(bounds))


def composite_bucket_key(
    key_asc: Column, tiebreak: Column, tiebreak_scale: float = 1e-12
) -> Column:
    """Fold a high-cardinality ascending tiebreak into the bucket key.

    ``key + tiebreak * scale`` is monotone along the (key, tiebreak)
    lexicographic order as long as ``tiebreak * scale`` stays below the
    smallest gap between distinct key values (integer keys: gap >= 1,
    so any ``tiebreak * scale < 1`` works).  Floating-point rounding
    can only COLLAPSE neighbors (same bucket), never reorder them, so
    exactness is preserved; the payoff is that ties on ``key`` spread
    across buckets instead of piling into one.
    """
    return key_asc.cast("double") + tiebreak.cast("double") * F.lit(
        tiebreak_scale
    )


def default_n_buckets(spark) -> int:
    """shuffle.partitions clamped to [64, 1024] — see module docstring."""
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(_MIN_BUCKETS, min(_MAX_BUCKETS, parts))


def global_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    bucket_key: Column,
    *,
    out: str = "rk",
    n_buckets: int | None = None,
    checkpoint: bool = True,
) -> tuple[DataFrame, int]:
    """Attach an exact 1-based global ``row_number`` (column ``out``,
    long) ordered by ``order_by``, without a single-partition window.

    ``order_by``: the exact, deterministic total order (already
    oriented — pass ``F.col("score").desc(), F.col("id")``).  Must be
    a total order (include a unique tiebreak) for the result to be
    well-defined; keys must be non-null.

    ``bucket_key``: a numeric column ASCENDING-monotone along that
    order (for a descending score, pass ``-score``; to spread heavy
    ties, use :func:`composite_bucket_key`).  Only monotonicity
    matters — any monotone function yields identical ranks.

    ``checkpoint``: lazily ``localCheckpoint`` the input so the three
    passes (boundary histogram, bucket counts, final rank) scan the
    upstream lineage once — the histogram pass materializes it.  Pass a PRUNED frame (ids + keys, not
    payloads); at cluster scale the checkpoint is executor-local
    disk-backed storage sized by the pruned frame, far below the
    corpus it ranks.

    Returns ``(df_with_rank, total_rows)`` — the exact total row count
    falls out of the histogram pass for free, so callers needing
    "rank vs n" cuts (median, tertile, ntile) take it as a driver
    literal instead of a second single-partition ``COUNT(*) OVER ()``.
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = default_n_buckets(spark)
    kdf = df.withColumn("__obk", bucket_key.cast("double"))
    if checkpoint:
        # lazy: the histogram pass below materializes it (one job does
        # both), and every later pass reuses the checkpointed blocks
        kdf = kdf.localCheckpoint(eager=False)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    hist = kdf.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("__obk", probs, 10_000).alias("bounds"),
    ).first()
    total = int(hist["n"] or 0)
    if total == 0:
        return kdf.drop("__obk").withColumn(out, F.lit(None).cast("long")), 0
    # dedupe: equal boundaries produce empty buckets, not wrong ranks —
    # dropping them just keeps the search tree short
    bounds = sorted(set(hist["bounds"] or []))
    bucket = _bucket_expr(bounds, F.col("__obk")) if bounds else F.lit(0)
    # lazy checkpoint: the counts pass below materializes the bucketed
    # frame once and the final rank pass reuses it (instead of
    # re-running the search tree), and the lineage truncation keeps the
    # bucket expression out of downstream constraint propagation
    kdf = kdf.withColumn("__bkt", bucket).localCheckpoint(eager=False)
    counts = kdf.groupBy("__bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    # offsets attach as a DENSE driver-built literal array indexed by
    # bucket id (bounded by the constant bucket count) — a pure
    # projection, no join, no broadcast
    by_bkt = {int(r["__bkt"]): int(r["n"]) for r in counts}
    off, dense = 0, []
    for b in range(len(bounds) + 1):
        dense.append(off)
        off += by_bkt.get(b, 0)
    off_col = F.get(
        F.array(*[F.lit(o).cast("long") for o in dense]), F.col("__bkt")
    )
    w = Window.partitionBy("__bkt").orderBy(*order_by)
    ranked = kdf.withColumn(
        out, (off_col + F.row_number().over(w)).cast("long")
    ).drop("__obk", "__bkt")
    return ranked, total


def global_row_numbers(
    df: DataFrame,
    specs: Sequence[tuple[Sequence[Column], Column, str]],
    *,
    n_buckets: int | None = None,
    checkpoint: bool = True,
) -> tuple[DataFrame, int]:
    """Several exact global row_numbers over the SAME frame in one
    machinery pass — the RFM shape (3 independent ntile orders over one
    per-user table), where calling :func:`global_row_number` k times
    pays k histogram jobs + k count jobs. Here: ONE aggregate computes
    the row count and every spec's boundary histogram, ONE
    grouping-sets pass counts every spec's buckets, and the k
    within-bucket windows ride a single final job.

    ``specs``: (order_by, bucket_key, out) per rank — same contracts as
    :func:`global_row_number`. Returns (frame with all out columns,
    exact row count).
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = default_n_buckets(spark)
    k = len(specs)
    kdf = df
    for i, (_, bk, _) in enumerate(specs):
        kdf = kdf.withColumn(f"__obk{i}", bk.cast("double"))
    if checkpoint:
        kdf = kdf.localCheckpoint(eager=False)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    hist = kdf.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.percentile_approx(f"__obk{i}", probs, 10_000).alias(f"b{i}")
            for i in range(k)
        ],
    ).first()
    total = int(hist["n"] or 0)
    if total == 0:
        out_df = kdf.drop(*[f"__obk{i}" for i in range(k)])
        for _, _, out in specs:
            out_df = out_df.withColumn(out, F.lit(None).cast("long"))
        return out_df, 0
    bounds_all: list[list[float]] = []
    for i in range(k):
        bounds = sorted(set(hist[f"b{i}"] or []))
        bounds_all.append(bounds)
        bucket = (
            _bucket_expr(bounds, F.col(f"__obk{i}")) if bounds else F.lit(0)
        )
        kdf = kdf.withColumn(f"__bkt{i}", bucket)
    kdf = kdf.localCheckpoint(eager=False)  # see global_row_number
    gcols = [f"__bkt{i}" for i in range(k)]
    rows = (
        kdf.groupingSets([[c] for c in gcols], *gcols)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # in a grouping-set row, exactly one __bkt{i} is non-NULL
    per_spec: list[dict[int, int]] = [dict() for _ in range(k)]
    for r in rows:
        for i, c in enumerate(gcols):
            if r[c] is not None:
                per_spec[i][int(r[c])] = int(r["n"])
                break
    result = kdf
    for i, (order_by, _, out) in enumerate(specs):
        off, dense = 0, []
        for b in range(len(bounds_all[i]) + 1):
            dense.append(off)
            off += per_spec[i].get(b, 0)
        off_col = F.get(
            F.array(*[F.lit(o).cast("long") for o in dense]),
            F.col(f"__bkt{i}"),
        )
        w = Window.partitionBy(f"__bkt{i}").orderBy(*order_by)
        result = result.withColumn(
            out, (off_col + F.row_number().over(w)).cast("long")
        )
    return result.drop(
        *[f"__obk{i}" for i in range(k)], *gcols
    ), total


def global_cum(
    df: DataFrame,
    order_by: Sequence[Column],
    bucket_key: Column,
    value: Column,
    *,
    agg: str = "sum",
    out: str = "cum",
    inclusive: bool = True,
    n_buckets: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Exact global running SUM/MAX of ``value`` along ``order_by``,
    without a single-partition window — the cumulative companion of
    :func:`global_row_number` (same histogram-bucket skeleton: range
    buckets, per-bucket totals, driver prefix-combine over <=
    ``n_buckets`` rows, within-bucket window + bucket base).

    ``inclusive=False`` gives the ``ROWS BETWEEN UNBOUNDED PRECEDING
    AND 1 PRECEDING`` frame (NULL on an empty prefix, matching SQL).
    The order key must be UNIQUE per row (callers run this on
    distinct-value frames), so ROWS and RANGE frames coincide and the
    result is engine-exact. ``value`` must be integral (LONG) — the
    driver-side prefix combine is exact Python int arithmetic.
    """
    if agg not in ("sum", "max"):
        raise ValueError(f"agg must be 'sum' or 'max', got {agg!r}")
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = default_n_buckets(spark)
    kdf = df.withColumn("__obk", bucket_key.cast("double")).withColumn(
        "__val", value.cast("long")
    )
    if checkpoint:
        # lazy: the histogram pass below materializes it (one job does
        # both), and every later pass reuses the checkpointed blocks
        kdf = kdf.localCheckpoint(eager=False)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    hist = kdf.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("__obk", probs, 10_000).alias("bounds"),
    ).first()
    if int(hist["n"] or 0) == 0:
        return kdf.drop("__obk", "__val").withColumn(
            out, F.lit(None).cast("long")
        )
    bounds = sorted(set(hist["bounds"] or []))
    bucket = _bucket_expr(bounds, F.col("__obk")) if bounds else F.lit(0)
    # lazy checkpoint + dense literal bases — see global_row_number
    kdf = kdf.withColumn("__bkt", bucket).localCheckpoint(eager=False)
    fold = F.sum if agg == "sum" else F.max
    totals = (
        kdf.groupBy("__bkt").agg(fold("__val").alias("t")).collect()
    )
    # exclusive prefix-combine of bucket totals on the driver (exact
    # Python ints; None base = no prior rows exist), dense by bucket id
    by_bkt = {int(r["__bkt"]): int(r["t"]) for r in totals}
    base: int | None = None
    dense: list[int | None] = []
    for b in range(len(bounds) + 1):
        dense.append(base)
        if b in by_bkt:
            t = by_bkt[b]
            if base is None:
                base = t
            else:
                base = base + t if agg == "sum" else max(base, t)
    base_col = F.get(
        F.array(*[F.lit(v).cast("long") for v in dense]), F.col("__bkt")
    )
    end = 0 if inclusive else -1
    w = (
        Window.partitionBy("__bkt")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    within = fold("__val").over(w)
    if agg == "sum":
        combined = F.when(base_col.isNull(), within).otherwise(
            F.coalesce(within, F.lit(0)) + base_col
        )
    else:
        combined = F.greatest(within, base_col)
    return (
        kdf.withColumn(out, combined.cast("long"))
        .drop("__obk", "__val", "__bkt")
    )


def global_lag(
    df: DataFrame,
    order_col: Column,
    bucket_key: Column,
    *,
    out: str = "prev",
    n_buckets: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Exact global ``LAG(order_col) OVER (ORDER BY order_col)``
    without a single-partition window: within-bucket lag + the
    previous nonempty bucket's MAX as the lag of each bucket's first
    row (driver-computed over <= ``n_buckets`` rows). The global first
    row keeps NULL, matching SQL. ``order_col`` must be a unique LONG
    per row (the sequence-audit shape: lag over a distinct key set).
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = default_n_buckets(spark)
    kdf = df.withColumn("__ok", order_col.cast("long")).withColumn(
        "__obk", bucket_key.cast("double")
    )
    if checkpoint:
        # lazy: the histogram pass below materializes it (one job does
        # both), and every later pass reuses the checkpointed blocks
        kdf = kdf.localCheckpoint(eager=False)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    hist = kdf.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("__obk", probs, 10_000).alias("bounds"),
    ).first()
    if int(hist["n"] or 0) == 0:
        return kdf.drop("__ok", "__obk").withColumn(
            out, F.lit(None).cast("long")
        )
    bounds = sorted(set(hist["bounds"] or []))
    bucket = _bucket_expr(bounds, F.col("__obk")) if bounds else F.lit(0)
    # lazy checkpoint + dense literal bases — see global_row_number
    kdf = kdf.withColumn("__bkt", bucket).localCheckpoint(eager=False)
    maxima = kdf.groupBy("__bkt").agg(F.max("__ok").alias("m")).collect()
    by_bkt = {int(r["__bkt"]): int(r["m"]) for r in maxima}
    prev_max: int | None = None
    dense: list[int | None] = []
    for b in range(len(bounds) + 1):
        dense.append(prev_max)
        if b in by_bkt:
            prev_max = by_bkt[b]
    base_col = F.get(
        F.array(*[F.lit(v).cast("long") for v in dense]), F.col("__bkt")
    )
    w = Window.partitionBy("__bkt").orderBy("__ok")
    return (
        kdf.withColumn(
            out, F.coalesce(F.lag("__ok").over(w), base_col).cast("long")
        )
        .drop("__ok", "__obk", "__bkt")
    )


def ntile_from_rank(rk: Column, n: int, k: int) -> Column:
    """Exact ``NTILE(k)`` derived from a 1-based global rank and the
    driver-known row count — standard SQL semantics (the first
    ``n % k`` tiles get ``n // k + 1`` rows), as a pure column
    expression, so the ntile inherits :func:`global_row_number`'s
    scale shape instead of needing its own global window."""
    q, r = divmod(n, k)
    if q == 0:
        # fewer rows than tiles: tile i gets row i
        return rk.cast("int")
    big = r * (q + 1)
    in_big = F.floor((rk - F.lit(1)) / F.lit(q + 1))
    in_small = F.lit(r) + F.floor((rk - F.lit(1) - F.lit(big)) / F.lit(q))
    return (
        F.when(rk <= F.lit(big), in_big).otherwise(in_small) + F.lit(1)
    ).cast("int")
