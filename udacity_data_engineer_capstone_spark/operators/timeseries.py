"""Time-series operators over the ``events`` table: OHLC resampling,
exponential smoothing, and inter-arrival statistics.

The reference (``/root/reference/etl.py``) has no time-series stage at
all — its only temporal work is decoding SAS day-counts to dates
(``etl.py:136-141``). These are north-star extensions: the standard
resample / smooth / cadence primitives a metrics warehouse or a
training-data telemetry pipeline needs.

Determinism at the hash gate (same discipline as :mod:`.graph`): every
aggregate here is either pure min/max/count (no arithmetic), exact
integer arithmetic (cents, microseconds), or an exact power-of-two
division performed once at the end — so Spark and DuckDB agree bitwise
at any parallelism and any fold order.

Scale shape: everything is a single window-function pass partitioned by
a high-cardinality key (event_type×hour buckets, or user_id) followed by
a partial+final hash aggregate — no driver collects, no cross-partition
sequential dependency. At 100 TB the sort inside each window partition
is the only super-linear cost, and it is bounded by per-user/per-bucket
row counts, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table, register_views
from udacity_data_engineer_capstone_spark.registry import query

# --- OHLC resample ---------------------------------------------------------

_OHLC_ORACLE = """
WITH ranked AS (
  SELECT date_trunc('hour', ts) AS bucket,
         event_type,
         value,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT bucket,
       event_type,
       MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM ranked
GROUP BY bucket, event_type
"""


@query("ts_resample_ohlc", oracle=_OHLC_ORACLE, tags=("timeseries", "window", "agg"))
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the event stream into hourly OHLC bars per event type.

    Open/close are picked by ``row_number`` over a total order
    ``(ts, event_id)`` — deterministic under timestamp ties — and
    high/low/volume are plain min/max/count, so no floating arithmetic
    happens at all; the value sum is exact integer cents.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    w_asc = Window.partitionBy(bucket, "event_type").orderBy("ts", "event_id")
    w_desc = Window.partitionBy(bucket, "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            bucket.alias("bucket"),
            "event_type",
            "value",
            F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
            F.row_number().over(w_asc).alias("rn_a"),
            F.row_number().over(w_desc).alias("rn_d"),
        )
        .groupBy("bucket", "event_type")
        .agg(
            F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.min(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
    )


# --- finite-window EWMA ----------------------------------------------------

# Weights 2^-(k+1) for lags k = 0..7, scaled by 256 to integers
# 128, 64, ..., 1.  The weighted sum is pure int64 arithmetic; dividing
# once by 256.0 at the end is exact in IEEE double (power-of-two scale of
# an integer far below 2^53), so both engines emit identical doubles.
_EWMA_TAPS = 8
_EWMA_WEIGHTS = [2 ** (_EWMA_TAPS - 1 - k) for k in range(_EWMA_TAPS)]  # lag k

_EWMA_ORACLE = f"""
WITH cents AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), lagged AS (
  SELECT user_id, ts, event_id, cents,
         {", ".join(
             f"COALESCE(lag(cents, {k}) OVER "
             f"(PARTITION BY user_id ORDER BY ts, event_id), 0) AS l{k}"
             for k in range(1, _EWMA_TAPS)
         )}
  FROM cents
)
SELECT user_id, ts, event_id, cents,
       (cents * {_EWMA_WEIGHTS[0]}
        + {" + ".join(f"l{k} * {_EWMA_WEIGHTS[k]}" for k in range(1, _EWMA_TAPS))}
       ) / 256.0 AS ewma
FROM lagged
"""


@query("ts_ewma", oracle=_EWMA_ORACLE, tags=("timeseries", "window"))
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event values
    (8-tap finite window, alpha = 1/2, zero-padded history).

    All eight tap products and their sum are int64; the single final
    division by 256 is exact, so the double output is engine-invariant.
    At scale this is one window pass per user partition — the taps are
    ``lag`` reads inside the same sorted run, not extra shuffles.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    df = ev.select("user_id", "ts", "event_id", cents.alias("cents"))
    acc = F.col("cents") * F.lit(_EWMA_WEIGHTS[0])
    for k in range(1, _EWMA_TAPS):
        acc = acc + F.coalesce(F.lag("cents", k).over(w), F.lit(0)) * F.lit(
            _EWMA_WEIGHTS[k]
        )
    return df.withColumn("ewma", acc / F.lit(256.0))


# --- inter-arrival statistics ----------------------------------------------

_INTERARRIVAL_ORACLE = """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id,
       CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       median(gap_us) AS median_gap_us
FROM gaps
WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


@query(
    "ts_interarrival", oracle=_INTERARRIVAL_ORACLE, tags=("timeseries", "agg")
)
def ts_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival cadence: count, min, max, and exact median
    of the microsecond gaps between consecutive events.

    Gaps are exact int64 microseconds; the only non-integer output is the
    median, whose even-count interpolation ``(a+b)/2`` over int64 is
    exact in double on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.expr("percentile(gap_us, 0.5)").alias("median_gap_us"),
    )


# --- Holt linear-trend smoothing -------------------------------------------
#
# Double exponential smoothing (Holt 1957): level + trend state folded
# sequentially over each user's hourly series —
#   l_t = α·x_t + (1-α)(l_{t-1} + b_{t-1})
#   b_t = β(l_t - l_{t-1}) + (1-β)·b_{t-1}
# with the gains as EXACT binary fractions (α=1/2, β=1/4), so each step
# is two integer divisions: l = (x + l' + b') ÷ 2, b = (l - l' + 3b') ÷ 4
# over integer cents. Division truncates toward zero on both engines
# (Spark DIV natively; the oracle sign-splits DuckDB's floor //, the
# same device as the PCA/markov operators) — bit-identical folds.
#
# Scale shape: hourly aggregation is a partial+final hash aggregate;
# the fold itself is a per-user ``aggregate`` higher-order function over
# the sorted hourly array — one shuffle on user_id, JVM-codegen'd, no
# Python, no window re-sort. Per-user state arrays are bounded by the
# TIME RANGE in hours, not corpus size, so memory per group is flat as
# the corpus scales out. A genuinely sequential recurrence cannot be
# parallelized inside a key without changing semantics; keying by user
# is exactly how the work distributes.

_HOLT_ORACLE = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events
  GROUP BY user_id, date_trunc('hour', ts)
),
series AS (
  SELECT user_id,
         list_transform(list(x ORDER BY h), v -> [v, CAST(0 AS BIGINT)])
           AS xs,
         CAST(COUNT(*) AS BIGINT) AS n_points
  FROM hourly
  GROUP BY user_id
),
folded AS (
  SELECT user_id, n_points,
         list_reduce(xs, (acc, e) -> [
           CASE WHEN e[1] + acc[1] + acc[2] >= 0
                THEN (e[1] + acc[1] + acc[2]) // 2
                ELSE -((-(e[1] + acc[1] + acc[2])) // 2) END,
           CASE WHEN (CASE WHEN e[1] + acc[1] + acc[2] >= 0
                           THEN (e[1] + acc[1] + acc[2]) // 2
                           ELSE -((-(e[1] + acc[1] + acc[2])) // 2) END)
                     - acc[1] + 3 * acc[2] >= 0
                THEN ((CASE WHEN e[1] + acc[1] + acc[2] >= 0
                            THEN (e[1] + acc[1] + acc[2]) // 2
                            ELSE -((-(e[1] + acc[1] + acc[2])) // 2) END)
                      - acc[1] + 3 * acc[2]) // 4
                ELSE -((-((CASE WHEN e[1] + acc[1] + acc[2] >= 0
                                THEN (e[1] + acc[1] + acc[2]) // 2
                                ELSE -((-(e[1] + acc[1] + acc[2])) // 2) END)
                          - acc[1] + 3 * acc[2])) // 4) END
         ]) AS st
  FROM series
)
SELECT user_id, n_points,
       st[1] AS level_cents,
       st[2] AS trend_cents,
       CAST(st[1] + st[2] AS BIGINT) AS forecast_next_cents
FROM folded
"""


@query("ts_holt_linear", oracle=_HOLT_ORACLE, tags=("timeseries", "iterative"))
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing per user over hourly spend:
    final level, trend, and one-step-ahead forecast, in exact integer
    cents (see section comment for the binary-fraction gain argument).

    The first hourly observation initializes the state (l₀ = x₀,
    b₀ = 0), matching the oracle's fold whose accumulator starts at the
    first element ``[x₀, 0]``."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("h")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("x")
        )
    )
    series = hourly.groupBy("user_id").agg(
        F.expr("transform(sort_array(collect_list(struct(h, x))), s -> s.x)").alias(
            "xs"
        ),
        F.count(F.lit(1)).cast("long").alias("n_points"),
    )
    # fold: acc = [l, b]; first element seeds [x0, 0]
    fold = F.expr(
        """aggregate(
             slice(xs, 2, size(xs) - 1),
             array(xs[0], 0L),
             (acc, x) -> array(
               (x + acc[0] + acc[1]) DIV 2,
               ((x + acc[0] + acc[1]) DIV 2 - acc[0] + 3 * acc[1]) DIV 4
             )
           )"""
    )
    return series.select(
        "user_id",
        "n_points",
        fold.getItem(0).alias("level_cents"),
        fold.getItem(1).alias("trend_cents"),
        (fold.getItem(0) + fold.getItem(1)).cast("long").alias("forecast_next_cents"),
    )


# --- Theil–Sen robust trend ------------------------------------------------

# Hour index relative to a fixed (data-independent) origin so both
# engines derive identical integers; slopes only use differences, so the
# origin choice is immaterial.
_TS_ORIGIN = "TIMESTAMP '2000-01-01 00:00:00'"

_THEIL_SEN_ORACLE = f"""
WITH buckets AS (
  SELECT event_type,
         CAST(date_diff('hour', {_TS_ORIGIN}, date_trunc('hour', ts)) AS BIGINT)
           AS h,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)
),
pairs AS (
  SELECT a.event_type,
         (CAST(b.sum_cents AS DOUBLE) / b.n - CAST(a.sum_cents AS DOUBLE) / a.n)
           / (b.h - a.h) AS slope
  FROM buckets a
  JOIN buckets b
    ON a.event_type = b.event_type AND a.h < b.h
),
ranked AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS cp
  FROM pairs
)
SELECT event_type,
       CAST(MAX(cp) AS BIGINT) AS n_pairs,
       CAST(floor(
         (MAX(CASE WHEN rk = (cp + 1) // 2 THEN slope END)
          + MAX(CASE WHEN rk = (cp + 2) // 2 THEN slope END)) / 2 * 1000000
       ) AS BIGINT) AS slope_microcents_per_hour
FROM ranked
GROUP BY event_type
"""


@query(
    "ts_theil_sen",
    oracle=_THEIL_SEN_ORACLE,
    tags=("timeseries", "robust", "join"),
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend: the median of all pairwise slopes of the
    hourly mean series, per event type — the 29%-breakdown-point
    alternative to OLS trend (cf. ``stat_ols_regression``), standard for
    drift monitoring because single outlier hours cannot move it.

    Determinism: bucket means are one exact-int division
    ``sum_cents/n``; each slope is two more IEEE ops on those doubles;
    the median reads values at fixed ranks (ties carry equal values, so
    tie order cannot change the result) and the final ``floor(·*1e6)``
    is exact in both engines.

    Scale shape: the pairwise self-join runs over the *hourly-bucketed*
    series, whose length is calendar-bounded (720 rows/month/type), not
    data-bounded — at 100 TB the corpus-sized work is still just the
    one partial+final hash aggregate that builds the buckets; the pair
    join and median window operate on kilobytes per event type. For
    multi-year series, cap the window (trailing N days) or pair-sample
    with an equi-residue gate as in ``emb_cosine_histogram``.
    """
    ev = load_table(spark, sf_dir, "events")
    buckets = (
        ev.groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint")).alias(
                "sum_cents"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            F.expr(f"CAST(timestampdiff(HOUR, {_TS_ORIGIN}, bucket) AS BIGINT)").alias(
                "h"
            ),
            (F.col("sum_cents").cast("double") / F.col("n")).alias("m"),
        )
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.h") < F.col("b.h")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.m") - F.col("a.m")) / (F.col("b.h") - F.col("a.h"))).alias(
            "slope"
        ),
    )
    w = Window.partitionBy("event_type").orderBy("slope")
    wp = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("cp"),
    )
    lo = F.max(F.when(F.col("rk") == F.expr("(cp + 1) DIV 2"), F.col("slope")))
    hi = F.max(F.when(F.col("rk") == F.expr("(cp + 2) DIV 2"), F.col("slope")))
    return ranked.groupBy("event_type").agg(
        F.max("cp").cast("long").alias("n_pairs"),
        F.floor((lo + hi) / 2 * 1000000)
        .cast("long")
        .alias("slope_microcents_per_hour"),
    )


# --- SAX symbolization -----------------------------------------------------

_SAX_FRAME = 6  # hourly buckets per PAA frame (6 h frames, 4 symbols)

# Gaussian breakpoints for a 4-symbol alphabet (a|b|c|d at -0.6745, 0,
# +0.6745 — the N(0,1) quartiles). Literal doubles, identical text in
# both engines.
_SAX_CASE = (
    "CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b' "
    "WHEN z < 0.6745 THEN 'c' ELSE 'd' END"
)

_SAX_ORACLE = f"""
WITH buckets AS (
  SELECT event_type,
         date_trunc('hour', ts) AS bucket,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)
),
idx AS (
  SELECT event_type, sum_cents, n,
         (ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket) - 1)
           // {_SAX_FRAME} AS frame
  FROM buckets
),
stats AS (
  SELECT event_type,
         CAST(SUM(sum_cents) AS BIGINT) AS s,
         CAST(SUM(CAST(CAST(sum_cents AS HUGEINT) * sum_cents // n
                       AS HUGEINT)) AS DOUBLE) AS sq_scaled,
         CAST(SUM(n) AS BIGINT) AS tot_n,
         CAST(COUNT(*) AS BIGINT) AS nb
  FROM idx
  GROUP BY event_type
),
frames AS (
  SELECT event_type, frame,
         CAST(SUM(sum_cents) AS BIGINT) AS fs,
         CAST(SUM(n) AS BIGINT) AS fn
  FROM idx
  GROUP BY event_type, frame
),
z AS (
  SELECT f.event_type, f.frame,
         (CAST(f.fs AS DOUBLE) / f.fn - CAST(s.s AS DOUBLE) / s.tot_n)
           / sqrt(1e-12 + s.sq_scaled / s.nb
                  - (CAST(s.s AS DOUBLE) / s.tot_n)
                    * (CAST(s.s AS DOUBLE) / s.tot_n)) AS z
  FROM frames f
  JOIN stats s ON s.event_type = f.event_type
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       string_agg({_SAX_CASE}, '' ORDER BY frame) AS sax
FROM z
GROUP BY event_type
"""


@query("ts_sax_symbolic", oracle=_SAX_ORACLE, tags=("timeseries", "window"))
def ts_sax_symbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin et al.): z-normalize each event type's
    hourly mean series, average it down with PAA (6-hour frames), and
    map each frame to a 4-letter alphabet at the N(0,1) quartile
    breakpoints — the standard discretization for motif mining and
    similarity search over long telemetry series.

    Determinism: all series statistics are derived from exact BIGINT
    sums (``sum_cents``, ``n``) — every double is the result of the
    same casts/divisions in both engines, and the symbol CASE compares
    against literal breakpoints, so the strings match bit-for-bit.
    *Caveat inherited from the exact-int discipline:* the variance term
    uses per-bucket mean-square ``sum_cents²/n`` (integer div, exact),
    an hour-weighted population variance — documented, deterministic,
    and the z-scores it feeds are scale-normalized either way.
    Headroom: the mean-square lane runs in the DECIMAL(38,0)↔HUGEINT
    wide pair (round-10 overflow audit — the old int64 product died at
    ~3e9 cents per (type, hour) bucket); the per-bucket quotient
    ``sum_cents²/n`` ≈ mean²·n ≈ 4.6e16 at the 1e12-row target still
    fits the LONG lane Spark's ``DIV`` emits.

    Scale shape: one corpus-sized hash aggregate builds the hourly
    buckets; everything after (frame index, stats join, listagg) runs
    on the calendar-bounded bucket table. The ``listagg`` cannot
    partial-aggregate, but it concatenates ≤ buckets/frame_size symbols
    per group — bytes, not data volume.
    """
    ev = load_table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint")).alias("sum_cents"),
        F.count(F.lit(1)).alias("n"),
    )
    idx = buckets.select(
        "event_type",
        "sum_cents",
        "n",
        F.expr(f"(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket) - 1) DIV {_SAX_FRAME}").alias(
            "frame"
        ),
    )
    stats = idx.groupBy("event_type").agg(
        F.sum("sum_cents").alias("s"),
        # wide product + wide re-accumulate: sum_cents² dies in int64 at
        # ~3e9 cents/bucket and the Σ of quotients at ~1e20 (the old
        # docstring's "pre-divide" mitigation, executed as widening);
        # the per-row quotient itself (mean²·n ≈ 4.6e16 at 1e12 rows)
        # still fits the LONG that Spark's DIV returns.
        # KNOWN ASYMMETRY (engine-side-only cliff): Spark's DIV on a
        # DECIMAL(38,0) product emits BIGINT, so a per-row quotient past
        # ~9.2e18 ANSI-aborts HERE while the DuckDB oracle's HUGEINT //
        # keeps int128 and succeeds. That is ~200× above the 1e12-row
        # target (documented headroom), and the failure is loud, not a
        # silent divergence — revisit only if per-bucket cent sums ever
        # exceed ~3e9 at 200× today's target.
        F.sum(
            F.expr(
                "CAST(CAST(sum_cents AS DECIMAL(38,0)) * sum_cents DIV n"
                " AS DECIMAL(38,0))"
            )
        )
        .cast("double")
        .alias("sq_scaled"),
        F.sum("n").alias("tot_n"),
        F.count(F.lit(1)).alias("nb"),
    )
    frames = idx.groupBy("event_type", "frame").agg(
        F.sum("sum_cents").alias("fs"), F.sum("n").alias("fn")
    )
    mean = F.col("s").cast("double") / F.col("tot_n")
    z = (
        frames.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "frame",
            (
                (F.col("fs").cast("double") / F.col("fn") - mean)
                / F.sqrt(
                    F.lit(1e-12)
                    + F.col("sq_scaled") / F.col("nb")
                    - mean * mean
                )
            ).alias("z"),
        )
    )
    return z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.expr(f"listagg({_SAX_CASE}, '') WITHIN GROUP (ORDER BY frame)").alias("sax"),
    )


# --- rolling median smoother ----------------------------------------------

_ROLLMED_ORACLE = """
WITH buckets AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)
),
framed AS (
  SELECT event_type, bucket, sum_cents,
         list_sort(array_agg(sum_cents)
           OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS arr
  FROM buckets
)
SELECT event_type, bucket, sum_cents,
       CAST(arr[(len(arr) + 1) // 2] AS BIGINT) AS rolling_median_cents
FROM framed
"""


@query("ts_rolling_median", oracle=_ROLLMED_ORACLE, tags=("timeseries", "window"))
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-bucket median of the hourly value series per event
    type — the outlier-proof smoother (one wild hour cannot move it,
    unlike the rolling mean) used to de-spike telemetry before
    thresholding. Median = lower-middle element of the sorted frame
    (odd interior frames have a true middle; the truncated edge frames
    take the lower median) — pure integer selection, no averaging, so
    both engines agree exactly.

    Scale shape: one corpus-sized hash aggregate builds the buckets;
    the window then slides over the calendar-bounded bucket table with
    a constant 7-element frame — O(1) state per row, partitioned by
    event_type. The collect-sort of 7 BIGINTs per row is constant work;
    for wide frames swap in a treap/two-heap pandas UDF."""
    ev = load_table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint")).alias(
            "sum_cents"
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-3, 3)
    )
    framed = buckets.select(
        "event_type",
        "bucket",
        "sum_cents",
        F.sort_array(F.collect_list("sum_cents").over(w)).alias("arr"),
    )
    return framed.select(
        "event_type",
        "bucket",
        "sum_cents",
        F.expr("CAST(arr[(size(arr) + 1) DIV 2 - 1] AS BIGINT)").alias(
            "rolling_median_cents"
        ),
    )


# --- STL-style decomposition: trend + seasonal + residual ------------------

_STL_HALF = 12  # centered moving-average half-width (25-hour window)

# All lanes are exact integers until one floor(double) per division;
# divisions go through floor(CAST(x AS DOUBLE) / n) because operands can
# be negative and floor-division is the one semantics both engines spell
# identically (Spark DIV / DuckDB // truncation differs on negatives).
_STL_ORACLE = f"""
WITH buckets AS (
  SELECT event_type,
         CAST(date_diff('hour', {_TS_ORIGIN}, date_trunc('hour', ts)) AS BIGINT)
           AS h,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS v_cents
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)
),
trend AS (
  SELECT event_type, h, v_cents,
         CASE WHEN COUNT(*) OVER w = {2 * _STL_HALF + 1} THEN
           CAST(floor(CAST(SUM(v_cents) OVER w AS DOUBLE) * 1000
                      / {2 * _STL_HALF + 1}) AS BIGINT)
         END AS trend_millicents
  FROM buckets
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN {_STL_HALF} PRECEDING AND {_STL_HALF} FOLLOWING)
),
seasonal AS (
  SELECT event_type, h % 24 AS hod,
         CAST(floor(CAST(SUM(v_cents * 1000 - trend_millicents) AS DOUBLE)
                    / COUNT(*)) AS BIGINT) AS seasonal_millicents
  FROM trend
  WHERE trend_millicents IS NOT NULL
  GROUP BY event_type, h % 24
)
SELECT t.event_type, t.h, t.v_cents, t.trend_millicents,
       s.seasonal_millicents,
       CAST(t.v_cents * 1000 - t.trend_millicents - s.seasonal_millicents
         AS BIGINT) AS residual_millicents
FROM trend t
LEFT JOIN seasonal s
  ON s.event_type = t.event_type AND s.hod = t.h % 24
"""


@query("ts_stl_decompose", oracle=_STL_ORACLE, tags=("timeseries", "window"))
def ts_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive STL-style decomposition of the hourly series per event
    type: trend = centered 25-hour moving average (full windows only),
    seasonal = hour-of-day mean of the detrended series, residual =
    observed - trend - seasonal. The standard pre-processing for
    anomaly detection on seasonal metrics (cf. ``evt_anomaly_zscore``,
    which this refines by removing trend+seasonality first).

    Scale shape: the only corpus-sized stage is the hourly partial+final
    hash aggregate; trend is one ROWS-frame window over the
    calendar-bounded bucket table (720 rows/month/type), seasonal is a
    24-row-per-type aggregate that re-enters via a broadcast equi-join.
    At 100 TB nothing after the first aggregate grows with data volume.

    Determinism: exact integer cent/millicent lanes; each division is a
    single floor(double) on a <2^53 numerator (see comment above)."""
    ev = load_table(spark, sf_dir, "events")
    buckets = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint")).alias(
                "v_cents"
            )
        )
        .select(
            "event_type",
            F.expr(
                f"CAST(timestampdiff(HOUR, {_TS_ORIGIN}, bucket) AS BIGINT)"
            ).alias("h"),
            "v_cents",
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-_STL_HALF, _STL_HALF)
    )
    full = 2 * _STL_HALF + 1
    trend = buckets.select(
        "event_type",
        "h",
        "v_cents",
        F.when(
            F.count(F.lit(1)).over(w) == full,
            F.floor(F.sum("v_cents").over(w).cast("double") * 1000 / full).cast(
                "long"
            ),
        ).alias("trend_millicents"),
    )
    seasonal = (
        trend.filter(F.col("trend_millicents").isNotNull())
        .groupBy("event_type", (F.col("h") % 24).alias("hod"))
        .agg(
            F.floor(
                F.sum(
                    F.col("v_cents") * 1000 - F.col("trend_millicents")
                ).cast("double")
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("seasonal_millicents")
        )
    )
    t = trend.alias("t")
    s = F.broadcast(seasonal).alias("s")
    return t.join(
        s,
        (F.col("s.event_type") == F.col("t.event_type"))
        & (F.col("s.hod") == F.col("t.h") % 24),
        "left",
    ).select(
        F.col("t.event_type").alias("event_type"),
        F.col("t.h").alias("h"),
        F.col("t.v_cents").alias("v_cents"),
        F.col("t.trend_millicents").alias("trend_millicents"),
        F.col("s.seasonal_millicents").alias("seasonal_millicents"),
        (
            F.col("t.v_cents") * 1000
            - F.col("t.trend_millicents")
            - F.col("s.seasonal_millicents")
        )
        .cast("long")
        .alias("residual_millicents"),
    )


# --- linear interpolation over hourly gaps ---------------------------------

# Gap filling by LINEAR INTERPOLATION (vs ``evt_gap_fill``'s zero-fill):
# the segment index trick makes it portable without IGNORE NULLS window
# syntax (which the two engines spell differently): a running count of
# non-null observations maps every grid row to its preceding non-null
# (seg) and following non-null (seg+1) by plain equi-joins.
_INTERP_ORACLE = f"""
WITH obs AS (
  SELECT event_type,
         CAST(date_diff('hour', {_TS_ORIGIN}, date_trunc('hour', ts)) AS BIGINT)
           AS h,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS v_cents
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)
),
bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM obs),
spine AS (
  SELECT t.event_type, u.h
  FROM (SELECT DISTINCT event_type FROM events) t,
       bounds b,
       LATERAL (SELECT unnest(generate_series(b.lo, b.hi)) AS h) u
),
grid AS (
  SELECT s.event_type, s.h, o.v_cents,
         COUNT(o.v_cents) OVER (PARTITION BY s.event_type ORDER BY s.h)
           AS seg
  FROM spine s
  LEFT JOIN obs o ON o.event_type = s.event_type AND o.h = s.h
),
nn AS (
  SELECT event_type, h, v_cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS k
  FROM grid WHERE v_cents IS NOT NULL
)
SELECT g.event_type, g.h, g.v_cents,
       CAST(CASE
         WHEN g.v_cents IS NOT NULL THEN g.v_cents * 1000
         WHEN p.h IS NULL THEN n.v_cents * 1000
         WHEN n.h IS NULL THEN p.v_cents * 1000
         ELSE p.v_cents * 1000
              + CAST(floor(CAST((n.v_cents - p.v_cents) * 1000 AS DOUBLE)
                           * (g.h - p.h) / (n.h - p.h)) AS BIGINT)
       END AS BIGINT) AS interp_millicents,
       g.v_cents IS NULL AS was_gap
FROM grid g
LEFT JOIN nn p ON p.event_type = g.event_type AND p.k = g.seg
LEFT JOIN nn n ON n.event_type = g.event_type AND n.k = g.seg + 1
"""


@query(
    "ts_interpolate_linear", oracle=_INTERP_ORACLE, tags=("timeseries", "window")
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type with LINEAR interpolation
    across gaps (edges clamp to the nearest observation) — the
    materialization a forecasting/anomaly stage wants when zero-filling
    (``evt_gap_fill``) would fabricate drops. ``was_gap`` flags
    fabricated points for downstream weighting.

    Scale shape: the corpus-sized work is one hash aggregate to hourly
    buckets; the spine is calendar-bounded (hours x types), the segment
    index is one window over it, and both neighbor lookups are
    broadcast equi-joins against the bucket-sized non-null table. The
    interpolation itself is a map-only expression.

    Determinism: exact integer lanes; the one division runs as a single
    floor(double) with a <2^53 numerator, identical both engines."""
    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint")).alias(
                "v_cents"
            )
        )
        .select(
            "event_type",
            F.expr(
                f"CAST(timestampdiff(HOUR, {_TS_ORIGIN}, bucket) AS BIGINT)"
            ).alias("h"),
            "v_cents",
        )
    )
    bounds = obs.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.expr("sequence(lo, hi)")).alias("h")
    )
    o = obs.alias("o")
    grid = (
        spine.alias("s")
        .join(
            o,
            (F.col("o.event_type") == F.col("s.event_type"))
            & (F.col("o.h") == F.col("s.h")),
            "left",
        )
        .select(
            F.col("s.event_type").alias("event_type"),
            F.col("s.h").alias("h"),
            F.col("o.v_cents").alias("v_cents"),
        )
        .withColumn(
            "seg",
            F.count("v_cents").over(
                Window.partitionBy("event_type").orderBy("h")
            ),
        )
    )
    nn = (
        grid.filter(F.col("v_cents").isNotNull())
        .select(
            "event_type",
            "h",
            "v_cents",
            F.row_number()
            .over(Window.partitionBy("event_type").orderBy("h"))
            .alias("k"),
        )
    )
    g = grid.alias("g")
    p = F.broadcast(nn).alias("p")
    n = F.broadcast(nn).alias("n")
    lerp = F.col("p.v_cents") * 1000 + F.floor(
        ((F.col("n.v_cents") - F.col("p.v_cents")) * 1000).cast("double")
        * (F.col("g.h") - F.col("p.h"))
        / (F.col("n.h") - F.col("p.h"))
    ).cast("long")
    return (
        g.join(
            p,
            (F.col("p.event_type") == F.col("g.event_type"))
            & (F.col("p.k") == F.col("g.seg")),
            "left",
        )
        .join(
            n,
            (F.col("n.event_type") == F.col("g.event_type"))
            & (F.col("n.k") == F.col("g.seg") + 1),
            "left",
        )
        .select(
            F.col("g.event_type").alias("event_type"),
            F.col("g.h").alias("h"),
            F.col("g.v_cents").alias("v_cents"),
            F.when(F.col("g.v_cents").isNotNull(), F.col("g.v_cents") * 1000)
            .when(F.col("p.h").isNull(), F.col("n.v_cents") * 1000)
            .when(F.col("n.h").isNull(), F.col("p.v_cents") * 1000)
            .otherwise(lerp)
            .cast("long")
            .alias("interp_millicents"),
            F.col("g.v_cents").isNull().alias("was_gap"),
        )
    )


# --- seasonal-naive forecast backtest --------------------------------------

_SNAIVE_LAG_H = 24  # forecast = observation 24 hours earlier

_SNAIVE_ORACLE = f"""
WITH obs AS (
  SELECT event_type,
         CAST(date_diff('hour', {_TS_ORIGIN}, date_trunc('hour', ts)) AS BIGINT)
           AS h,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS v_cents
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)
),
backtest AS (
  SELECT cur.event_type,
         cur.v_cents - prev.v_cents AS err_cents
  FROM obs cur
  JOIN obs prev
    ON prev.event_type = cur.event_type AND prev.h = cur.h - {_SNAIVE_LAG_H}
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_backtest,
       CAST(floor(CAST(SUM(abs(err_cents)) AS DOUBLE) * 1000 / COUNT(*))
         AS BIGINT) AS mae_millicents,
       CAST(floor(CAST(SUM(err_cents) AS DOUBLE) * 1000 / COUNT(*))
         AS BIGINT) AS bias_millicents
FROM backtest
GROUP BY event_type
"""


@query("ts_forecast_snaive", oracle=_SNAIVE_ORACLE, tags=("timeseries",))
def ts_forecast_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest: forecast every hour with the value 24
    hours earlier and report MAE and signed bias per event type — the
    no-skill baseline every real forecaster (``ts_holt_linear``,
    ``ts_stl_decompose``-based models) must beat before it earns
    cluster time.

    Scale shape: one corpus-sized hourly aggregate, then a self
    equi-join on (type, h-24) over the calendar-bounded bucket table
    and a per-type fold. Exact integer error lanes; the two mean
    divisions are single floor(double)s (signed operands)."""
    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint")).alias(
                "v_cents"
            )
        )
        .select(
            "event_type",
            F.expr(
                f"CAST(timestampdiff(HOUR, {_TS_ORIGIN}, bucket) AS BIGINT)"
            ).alias("h"),
            "v_cents",
        )
    )
    cur = obs.alias("cur")
    prev = obs.alias("prev")
    backtest = cur.join(
        prev,
        (F.col("prev.event_type") == F.col("cur.event_type"))
        & (F.col("prev.h") == F.col("cur.h") - _SNAIVE_LAG_H),
    ).select(
        F.col("cur.event_type").alias("event_type"),
        (F.col("cur.v_cents") - F.col("prev.v_cents")).alias("err_cents"),
    )
    return backtest.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_backtest"),
        F.floor(
            F.sum(F.abs(F.col("err_cents"))).cast("double")
            * 1000
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("mae_millicents"),
        F.floor(
            F.sum("err_cents").cast("double") * 1000 / F.count(F.lit(1))
        )
        .cast("long")
        .alias("bias_millicents"),
    )


# --- STL-residual anomaly flags (robust z on the decomposed residual) ------

# Reuses the exact STL chain as a CTE (one shared template, hour-diff
# dialect slot) and flags hours whose residual deviates from the
# per-type residual median by more than 3 robust standard deviations
# (MAD-scaled). Medians ride doubled/quadrupled integer units (the
# stat_mann_whitney trick) so no division ever happens: the 3-sigma
# test is 1349 * dev2 > 3000 * mad4 in exact int64.


def _stl_chain_sql(hour_diff: str) -> str:
    return f"""
buckets AS (
  SELECT event_type, {hour_diff} AS h,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS v_cents
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)
),
trend AS (
  SELECT event_type, h, v_cents,
         CASE WHEN COUNT(*) OVER w = {2 * _STL_HALF + 1} THEN
           CAST(floor(CAST(SUM(v_cents) OVER w AS DOUBLE) * 1000
                      / {2 * _STL_HALF + 1}) AS BIGINT)
         END AS trend_millicents
  FROM buckets
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN {_STL_HALF} PRECEDING AND {_STL_HALF} FOLLOWING)
),
seasonal AS (
  SELECT event_type, h % 24 AS hod,
         CAST(floor(CAST(SUM(v_cents * 1000 - trend_millicents) AS DOUBLE)
                    / COUNT(*)) AS BIGINT) AS seasonal_millicents
  FROM trend
  WHERE trend_millicents IS NOT NULL
  GROUP BY event_type, h % 24
),
resid AS (
  SELECT t.event_type, t.h,
         CAST(t.v_cents * 1000 - t.trend_millicents - s.seasonal_millicents
           AS BIGINT) AS r
  FROM trend t
  JOIN seasonal s ON s.event_type = t.event_type AND s.hod = t.h % 24
  WHERE t.trend_millicents IS NOT NULL
)
"""


def _stl_anomaly_sql(hour_diff: str) -> str:
    return f"""
WITH {_stl_chain_sql(hour_diff)},
med AS (
  SELECT event_type,
         CAST(MAX(CASE WHEN rn = floor((cnt + 1) / 2) THEN r END)
              + MAX(CASE WHEN rn = floor((cnt + 2) / 2) THEN r END) AS BIGINT)
           AS med2
  FROM (SELECT event_type, r,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r, h)
                 AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM resid) x
  WHERE rn IN (floor((cnt + 1) / 2), floor((cnt + 2) / 2))
  GROUP BY event_type
),
dev AS (
  SELECT r.event_type, r.h, r.r, abs(2 * r.r - m.med2) AS dev2
  FROM resid r JOIN med m ON m.event_type = r.event_type
),
mad AS (
  SELECT event_type,
         CAST(MAX(CASE WHEN rn = floor((cnt + 1) / 2) THEN dev2 END)
              + MAX(CASE WHEN rn = floor((cnt + 2) / 2) THEN dev2 END) AS BIGINT)
           AS mad4
  FROM (SELECT event_type, dev2,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY dev2, h) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM dev) x
  WHERE rn IN (floor((cnt + 1) / 2), floor((cnt + 2) / 2))
  GROUP BY event_type
)
SELECT d.event_type, d.h, d.r AS residual_millicents,
       CAST(d.dev2 AS BIGINT) AS dev2,
       1349 * d.dev2 > 3000 * m.mad4 AS is_anomaly
FROM dev d JOIN mad m ON m.event_type = d.event_type
"""


_STL_ANOM_DUCK_H = (
    f"CAST(date_diff('hour', {_TS_ORIGIN}, date_trunc('hour', ts)) AS BIGINT)"
)
_STL_ANOM_SPARK_H = (
    f"CAST(timestampdiff(HOUR, {_TS_ORIGIN}, date_trunc('hour', ts)) AS BIGINT)"
)


@query(
    "ts_stl_anomaly",
    oracle=_stl_anomaly_sql(_STL_ANOM_DUCK_H),
    tags=("timeseries", "stats"),
)
def ts_stl_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly flags: hours whose STL residual sits
    more than 3 robust (MAD-scaled) standard deviations from the
    per-type residual median — the refinement ``evt_anomaly_zscore``
    can't make (a 9am spike is only anomalous relative to 9am's
    seasonal norm, which the STL chain removed). Integer millicent
    lanes end-to-end; the median/MAD pair rides doubled/quadrupled
    units so the 3-sigma decision is exact int64 (headroom: |dev2| <=
    ~1e9 x 1349 ≪ 2^63).

    Scale shape: the STL chain's one corpus-sized aggregate, then
    windows and joins over calendar-bounded frames. Middle ranks use
    floor((cnt+k)/2) because bare `/` is float division in BOTH SQL
    dialects — a bare (cnt+1)/2 would silently skip the even-count
    median ranks."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_stl_anomaly_sql(_STL_ANOM_SPARK_H))


# --- seasonality strength (Hyndman F_s) on the STL decomposition -----------

_SEAS_STRENGTH_TEMPLATE = """
WITH {chain},
dd AS (
  SELECT event_type, h,
         CAST(v_cents * 1000 - trend_millicents AS BIGINT) AS d
  FROM trend WHERE trend_millicents IS NOT NULL
),
paired AS (
  SELECT dd.event_type, dd.d, r.r
  FROM dd JOIN resid r ON r.event_type = dd.event_type AND r.h = dd.h
),
mo AS (
  -- quadratic lanes wide (DECIMAL(38,0), same literal both engines):
  -- detrended hourly millicents reach ~4.6e15 at the 1e12-row target,
  -- so d·d ≈ 2e31 overflows int64 PER ROW (round-10 overflow audit)
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS sd,
         CAST(SUM(CAST(d AS DECIMAL(38,0)) * d) AS DECIMAL(38,0)) AS sd2,
         CAST(SUM(r) AS BIGINT) AS sr,
         CAST(SUM(CAST(r AS DECIMAL(38,0)) * r) AS DECIMAL(38,0)) AS sr2
  FROM paired GROUP BY event_type
)
SELECT event_type, n AS n_hours,
       CAST(floor(greatest(0.0,
         1.0 - (CAST(sr2 AS DOUBLE) - CAST(sr AS DOUBLE) * sr / n)
               / (CAST(sd2 AS DOUBLE) - CAST(sd AS DOUBLE) * sd / n))
         * 1000000) AS BIGINT) AS seasonal_strength_ppm
FROM mo
"""


@query(
    "ts_seasonal_strength",
    oracle=_SEAS_STRENGTH_TEMPLATE.format(chain=_stl_chain_sql(_STL_ANOM_DUCK_H)),
    tags=("timeseries", "stats"),
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman's seasonality-strength F_s per event type: 1 minus the
    ratio of residual variance to detrended variance on the STL
    decomposition — near 1e6 ppm means the hour-of-day cycle explains
    the series; near 0 means ``ts_stl_decompose``'s seasonal term is
    noise and a forecaster should drop it. The routing statistic for
    choosing between ``ts_forecast_snaive`` and trend-only models.

    Scale shape: the STL chain's single corpus aggregate; variances
    come from exact int64 moment sums over the calendar-bounded bucket
    table, cast to DOUBLE once in the shared closed form."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        _SEAS_STRENGTH_TEMPLATE.format(chain=_stl_chain_sql(_STL_ANOM_SPARK_H))
    )


# --- week-over-week growth -------------------------------------------------

_WOW_ORACLE = f"""
WITH weekly AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
           AS BIGINT) AS week_idx,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events
  GROUP BY event_type,
           date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
)
SELECT cur.event_type, cur.week_idx, cur.cents,
       prev.cents AS prev_cents,
       CAST(floor((CAST(cur.cents AS DOUBLE) - prev.cents) * 1000000
                  / prev.cents) AS BIGINT) AS wow_growth_ppm
FROM weekly cur
JOIN weekly prev
  ON prev.event_type = cur.event_type AND prev.week_idx = cur.week_idx - 1
"""


@query("ts_wow_growth", oracle=_WOW_ORACLE, tags=("timeseries",))
def ts_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth per event type (weeks anchored at
    2024-01-01 so both engines derive identical week indices) — the
    KPI delta every operational review opens with, here as exact
    integer cents with one floor(double) for the ppm growth rate.

    Scale shape: one corpus-sized weekly aggregate, then a self
    equi-join on the calendar-bounded weekly table (52 rows/year/type
    regardless of corpus size)."""
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type",
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') DIV 7"
            " AS BIGINT)"
        ).alias("week_idx"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint")).alias(
            "cents"
        )
    )
    cur = weekly.alias("cur")
    prev = weekly.alias("prev")
    return cur.join(
        prev,
        (F.col("prev.event_type") == F.col("cur.event_type"))
        & (F.col("prev.week_idx") == F.col("cur.week_idx") - 1),
    ).select(
        F.col("cur.event_type").alias("event_type"),
        F.col("cur.week_idx").alias("week_idx"),
        F.col("cur.cents").alias("cents"),
        F.col("prev.cents").alias("prev_cents"),
        F.floor(
            (F.col("cur.cents").cast("double") - F.col("prev.cents"))
            * 1000000
            / F.col("prev.cents")
        )
        .cast("long")
        .alias("wow_growth_ppm"),
    )


# --- Dickey–Fuller unit-root diagnostic ------------------------------------

# DF regression dy_t = alpha + phi * y_{t-1}: phi and its t-statistic
# from exact moment sums over the lag-paired hourly series; the 5%
# critical value (-2.86, constant-only case) is a shared literal. A
# t-stat below it rejects the unit root -> series is stationary enough
# for the level-based smoothers (ts_ewma/ts_holt_linear); otherwise
# difference first.
_ADF_ORACLE = f"""
WITH obs AS (
  SELECT CAST(date_diff('hour', {_TS_ORIGIN}, date_trunc('hour', ts))
    AS BIGINT) AS h,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS y
  FROM events
  GROUP BY date_trunc('hour', ts)
),
lagp AS (
  SELECT prev.y AS x, cur.y - prev.y AS dy
  FROM obs cur JOIN obs prev ON prev.h = cur.h - 1
),
mo AS (
  -- quadratic lanes wide (DECIMAL(38,0) parses identically in Spark
  -- and DuckDB, so the shared text survives): hourly cents reach
  -- ~4.6e12 at the 1e12-row target, so x·x ≈ 2e25 overflows int64
  -- PER ROW (round-10 overflow audit)
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * dy) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sx2,
         CAST(SUM(CAST(dy AS DECIMAL(38,0)) * dy) AS DECIMAL(38,0)) AS sy2
  FROM lagp
),
fit AS (
  SELECT n,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / (CAST(n AS DOUBLE) * sx2 - CAST(sx AS DOUBLE) * sx) AS phi,
         (CAST(sy AS DOUBLE)
          - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sx2 - CAST(sx AS DOUBLE) * sx)) * sx)
           / n AS alpha,
         sx, sy, sxy, sx2, sy2
  FROM mo
),
resid AS (
  SELECT n, phi,
         (CAST(sy2 AS DOUBLE) - alpha * sy - phi * sxy) / (n - 2) AS mse,
         CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS ssx
  FROM fit
)
SELECT n AS n_pairs,
       CAST(floor(phi * 1000000) AS BIGINT) AS phi_micro,
       CAST(floor(phi / sqrt(mse / ssx) * 1000) AS BIGINT) AS t_stat_milli,
       phi / sqrt(mse / ssx) < -2.86 AS stationary_5pct
FROM resid
"""


@query("ts_adf_unit_root", oracle=_ADF_ORACLE, tags=("timeseries", "stats"))
def ts_adf_unit_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey–Fuller unit-root diagnostic on the hourly revenue series:
    regress the hourly change on the lagged level and test phi against
    the -2.86 constant-only 5% critical value — the standard "is this
    series mean-reverting or a random walk" gate a forecaster runs
    before trusting level-based models.

    Scale shape: one corpus-sized hourly aggregate, a lag equi-join on
    the calendar-bounded bucket table, then a constant moment fold —
    the moments-then-closed-form family. Exact int64 sums, doubles
    cast once, one shared literal critical value."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        _ADF_ORACLE.replace(
            f"date_diff('hour', {_TS_ORIGIN}, date_trunc('hour', ts))",
            f"timestampdiff(HOUR, {_TS_ORIGIN}, date_trunc('hour', ts))",
        )
    )


# ---------------------------------------------------------------------------
# lagged cross-correlation between two event streams (lead-lag finder)
# ---------------------------------------------------------------------------

# One template, two epoch spellings: Spark's unix_timestamp(ts) and
# DuckDB's EPOCH(ts) return the same exact integer seconds.
_XCORR_TEMPLATE = """
WITH x AS (
  SELECT CAST(FLOOR({EPOCH} / 3600.0) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type = 'view' GROUP BY 1
),
y AS (
  SELECT CAST(FLOOR({EPOCH} / 3600.0) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
lags AS (SELECT {LAGS} AS lag),
pairs AS (
  SELECT l.lag, x.c AS cx, y.c AS cy
  FROM lags l
  JOIN x ON TRUE
  JOIN y ON y.h = x.h + l.lag
),
moments AS (
  -- quadratic lanes wide (DECIMAL(38,0), same literal both engines):
  -- hourly counts reach ~4.6e8 at the 1e12-row target, so Σcx² ≈
  -- 4.6e20 and the centering products n·sxx ≈ 1e24 overflow int64
  -- (round-10 overflow audit)
  SELECT lag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cx) AS BIGINT) AS sx,
         CAST(SUM(cy) AS BIGINT) AS sy,
         CAST(SUM(CAST(cx AS DECIMAL(38,0)) * cy) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(cx AS DECIMAL(38,0)) * cx) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(cy AS DECIMAL(38,0)) * cy) AS DECIMAL(38,0)) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n,
       CAST(FLOOR(
         CAST(CAST(n AS DECIMAL(38,0)) * sxy
              - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
         / SQRT(CAST(CAST(n AS DECIMAL(38,0)) * sxx
                     - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
                * CAST(CAST(n AS DECIMAL(38,0)) * syy
                       - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))
         * 1000000
       ) AS BIGINT) AS pearson_micro
FROM moments
ORDER BY lag
"""

_XCORR_LAGS = "unnest([-3, -2, -1, 0, 1, 2, 3])"
_XCORR_LAGS_SPARK = "explode(array(-3, -2, -1, 0, 1, 2, 3))"

_XCORR_ORACLE = _XCORR_TEMPLATE.format(EPOCH="EPOCH(ts)", LAGS=_XCORR_LAGS)


@query("ts_cross_correlation", oracle=_XCORR_ORACLE, tags=("timeseries", "stats"))
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged Pearson cross-correlation between the hourly 'view' and
    'purchase' count series at lags -3..+3 hours — the lead-lag finder
    that answers "does view traffic predict purchases, and by how many
    hours?". All six moments per lag are exact int64 sums; the single
    correlation expression (one subtraction tree, one sqrt, one
    division) is evaluated identically by both engines.

    Scale shape: the two hourly rollups are map-side-combinable
    aggregates; the lag join is an equi-join on the shifted hour index
    (7 lags × hours rows — calendar-sized, not event-sized). Only the
    two base rollups ever see raw events."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        _XCORR_TEMPLATE.format(
            EPOCH="unix_timestamp(ts)", LAGS=_XCORR_LAGS_SPARK
        )
    )


# ---------------------------------------------------------------------------
# Bollinger bands: rolling mean ± 2σ breakout detection, exact integers
# ---------------------------------------------------------------------------

_BOLLINGER_TEMPLATE = """
WITH hourly AS (
  SELECT event_type,
         CAST(FLOOR({EPOCH} / 3600.0) AS BIGINT) AS bucket,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events
  GROUP BY 1, 2
),
rolled AS (
  SELECT event_type, bucket, cents,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(cents) OVER w AS BIGINT) AS s,
         CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) OVER w
              AS DECIMAL(38,0)) AS q
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT event_type, bucket, cents,
       CAST(FLOOR(s * 1000.0 / n) AS BIGINT) AS roll_mean_milli,
       n * cents - s > 0
         AND CAST(n * cents - s AS DECIMAL(38,0)) * (n * cents - s)
             > 4 * (CAST(n AS DECIMAL(38,0)) * q
                    - CAST(s AS DECIMAL(38,0)) * s)
         AS breakout_hi,
       n * cents - s < 0
         AND CAST(n * cents - s AS DECIMAL(38,0)) * (n * cents - s)
             > 4 * (CAST(n AS DECIMAL(38,0)) * q
                    - CAST(s AS DECIMAL(38,0)) * s)
         AS breakout_lo
FROM rolled
"""

_BOLLINGER_ORACLE = _BOLLINGER_TEMPLATE.format(EPOCH="EPOCH(ts)")


@query("ts_bollinger_bands", oracle=_BOLLINGER_ORACLE, tags=("timeseries", "window"))
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout detection on the hourly per-type revenue
    series: rolling 24-bucket mean with ±2σ bands, flags computed
    ENTIRELY in exact integer arithmetic — (n·x−S)² > 4(nQ−S²) is
    (x−μ)² > 4σ² cross-multiplied by n², so the breakout verdict never
    touches a float and cannot drift between engines or partitionings.

    Scale shape: one hash aggregate to hourly grain, then one window
    pass partitioned by series — the same single-shuffle shape as
    every rolling operator here. Headroom: the squared lanes (Q, S²,
    the cross-multiplied breakout comparison) run in DECIMAL(38,0) —
    the old int64 lanes died at ~6e8 cents/hour (round-10 overflow
    audit); the verdict is still EXACT integer arithmetic, now good to
    ~3.8e17 cents/hour (the n·x−S int64 lane)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_BOLLINGER_TEMPLATE.format(EPOCH="unix_timestamp(ts)"))


# ---------------------------------------------------------------------------
# Haar wavelet energy: which timescale carries the variance?
# ---------------------------------------------------------------------------

# Detail coefficient at level L for dyadic block b: (sum of the block's
# first half) − (second half), halves at resolution 2^(L−1) hours.
# Missing hours contribute zero (gap ≡ no traffic). All coefficients
# are exact integer cents; energies are exact integer sums of squares.
# Headroom: |d| ≤ block-sum ≈ 2^L·max-hourly-cents, so at L=3 and 1e7
# cents/hour d² ≈ 6e15 — inside int64 with ~1000 blocks of margin.
# Width cliff (round-10 overflow audit): energy_cents2 is an OUTPUT
# column in cents² units, so its int64 bound (~9.2e18, i.e. hourly
# sums ≳ 1e9 cents) is a REPORTING-width choice both engines share and
# fail loudly on (Spark ANSI multiply / DuckDB cast) — widening the
# internal lane would only move the failure to the output cast;
# rescale to dollars² upstream when series carry >$10M/hour.
_HAAR_LEVELS = (1, 2, 3)

_HAAR_TEMPLATE = """
WITH hourly AS (
  SELECT event_type,
         CAST(FLOOR({EPOCH} / 3600.0) AS BIGINT) AS bucket,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events
  GROUP BY 1, 2
),
indexed AS (
  SELECT event_type, cents,
         bucket - MIN(bucket) OVER (PARTITION BY event_type) AS idx
  FROM hourly
),
lv AS (SELECT {LEVELS} AS level),
details AS (
  SELECT i.event_type, l.level,
         CAST(FLOOR(i.idx / POW(2.0, l.level)) AS BIGINT) AS block,
         CAST(SUM(i.cents
                  * (1 - 2 * (CAST(FLOOR(i.idx / POW(2.0, l.level - 1))
                                   AS BIGINT) % 2))) AS BIGINT) AS d
  FROM indexed i JOIN lv l ON TRUE
  GROUP BY i.event_type, l.level,
           CAST(FLOOR(i.idx / POW(2.0, l.level)) AS BIGINT)
)
SELECT event_type, CAST(level AS BIGINT) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(d * d) AS BIGINT) AS energy_cents2
FROM details
GROUP BY event_type, level
"""

_HAAR_LEVELS_DUCK = "unnest([1, 2, 3])"
_HAAR_LEVELS_SPARK = "explode(array(1, 2, 3))"


@query("ts_haar_energy", oracle=_HAAR_TEMPLATE.format(
    EPOCH="EPOCH(ts)", LEVELS=_HAAR_LEVELS_DUCK
), tags=("timeseries",))
def ts_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy decomposition of each hourly revenue series:
    per level (2 h, 4 h, 8 h block structure), the summed squared
    detail coefficients — which timescale carries the series'
    variance? A spike shows up at fine levels, a daily cycle at coarse
    ones; the multiresolution companion to ``ts_stl_decompose``'s
    fixed-period split. Coefficients and energies are exact integer
    cents end to end (gaps count as zero traffic).

    Scale shape: hourly rollup (the only data-sized pass), then two
    calendar-sized hash aggregates; the 3-level fan-out joins a 3-row
    literal table. Powers of two via POW on non-negative ints — exact
    in IEEE double well past any calendar length."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        _HAAR_TEMPLATE.format(
            EPOCH="unix_timestamp(ts)", LEVELS=_HAAR_LEVELS_SPARK
        )
    )


# ---------------------------------------------------------------------------
# M4 downsampling: the lossless-for-pixels dashboard reduction
# ---------------------------------------------------------------------------

# M4 (visualization-oriented aggregation): split the series into one
# bucket per output pixel column and keep 4 points each — first, last,
# min, max — which provably reproduces the line rendering exactly.
# Extremum points tie-break to the earliest index via integer encoding
# (cents·1e5 + idx for min; cents·1e5 + (99999 − idx) for max), so the
# selected POINTS, not just values, are engine-identical.
_M4_BUCKETS = 24

_M4_TEMPLATE = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(FLOOR({{EPOCH}} / 3600.0) AS BIGINT) AS h,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1, 2
),
indexed AS (
  SELECT event_type, cents,
         h - MIN(h) OVER (PARTITION BY event_type) AS idx,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM hourly
),
binned AS (
  SELECT event_type, cents, idx,
         CAST(FLOOR(idx * {_M4_BUCKETS}.0 / (1 + MAX(idx) OVER
              (PARTITION BY event_type))) AS BIGINT) AS bin
  FROM indexed
),
m4 AS (
  SELECT event_type, bin,
         CAST(COUNT(*) AS BIGINT) AS n_points,
         CAST(MIN(idx) AS BIGINT) AS first_idx,
         CAST(MAX(idx) AS BIGINT) AS last_idx,
         CAST(MIN(cents * 100000 + idx) AS BIGINT) AS minenc,
         CAST(MAX(cents * 100000 + (99999 - idx)) AS BIGINT) AS maxenc
  FROM binned GROUP BY event_type, bin
)
SELECT event_type, bin, n_points, first_idx, last_idx,
       CAST(FLOOR(minenc / 100000.0) AS BIGINT) AS min_cents,
       minenc - CAST(FLOOR(minenc / 100000.0) AS BIGINT) * 100000
         AS min_idx,
       CAST(FLOOR(maxenc / 100000.0) AS BIGINT) AS max_cents,
       99999 - (maxenc - CAST(FLOOR(maxenc / 100000.0) AS BIGINT) * 100000)
         AS max_idx
FROM m4
"""


@query(
    "ts_m4_downsample",
    oracle=_M4_TEMPLATE.format(EPOCH="EPOCH(ts)"),
    tags=("timeseries",),
)
def ts_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling of each hourly revenue series to 24 pixel
    buckets × 4 points (first/last/min/max) — the
    visualization-oriented aggregation that renders the same line a
    full-resolution plot would, at 1/30th the points shipped to the
    dashboard. Extremum POINT IDENTITY (not just value) is pinned by
    integer tie-break encoding, so two engines pick the same pixels.

    Scale shape: hourly rollup, two windows per series, one grouped
    aggregate — series-keyed shuffles only; output is pixels × 4.
    Headroom: the 1e5 encoding field holds ~11 years of hourly
    indexes; widen for longer retentions."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_M4_TEMPLATE.format(EPOCH="unix_timestamp(ts)"))


# ---------------------------------------------------------------------------
# hierarchical forecast reconciliation (bottom-up coherence)
# ---------------------------------------------------------------------------

# Per-type seasonal-naive forecasts (value 7 days earlier) never sum
# to the total's own forecast; proportional reconciliation rescales
# the bottom level so the hierarchy is coherent — the fix every
# roll-up dashboard needs before per-segment forecasts are shown next
# to the company number.
_RECONCILE_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
base AS (
  SELECT d.event_type, d.day, d.y, l.y AS fc
  FROM daily d
  LEFT JOIN daily l
    ON l.event_type = d.event_type AND l.day = d.day - INTERVAL 7 DAY
),
scoped AS (
  SELECT event_type, day, y, fc FROM base WHERE fc IS NOT NULL
),
top AS (
  SELECT day,
         CAST(SUM(y) AS BIGINT) AS total_actual,
         CAST(SUM(fc) AS BIGINT) AS bottom_sum
  FROM scoped GROUP BY day
),
top_fc AS (
  SELECT t.day, t.total_actual, t.bottom_sum,
         CAST(SUM(d.y) AS BIGINT) AS top_forecast
  FROM top t JOIN daily d ON d.day = t.day - INTERVAL 7 DAY
  GROUP BY t.day, t.total_actual, t.bottom_sum
)
SELECT s.event_type, s.day, s.y AS actual,
       CAST(s.fc AS BIGINT) AS base_forecast,
       CASE WHEN tf.bottom_sum = 0 THEN CAST(NULL AS BIGINT)
            ELSE CAST(FLOOR(s.fc * 1000.0 * tf.top_forecast
                            / tf.bottom_sum) AS BIGINT)
       END AS reconciled_milli,
       tf.top_forecast, tf.bottom_sum
FROM scoped s JOIN top_fc tf ON tf.day = s.day
"""


@query("ts_forecast_reconcile", oracle=_RECONCILE_SQL, tags=("timeseries",))
def ts_forecast_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical forecast reconciliation: per-type seasonal-naive
    forecasts proportionally rescaled so they sum exactly to the
    total-level forecast (bottom-up coherence) — without it, segment
    dashboards contradict the company roll-up. Reconciled values are
    floor-quantized milli-counts from exact integer forecasts. Both
    levels use the same CALENDAR lag (self-join on day − 7 days), so
    series with missing days stay aligned with the total; a
    zero bottom_sum yields NULL rather than a division blow-up.

    Scale shape: one daily rollup, one calendar self-join per series,
    two calendar-keyed aggregates — everything after the rollup is
    calendar-sized. The segment dimension scales by adding series,
    not shuffle width."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_RECONCILE_SQL)


# ---------------------------------------------------------------------------
# small-k periodogram: spectral energy at candidate cycles
# ---------------------------------------------------------------------------

# DFT energy at P ∈ {24 h, 168 h}: per term, cos/sin are micro-
# quantized BEFORE the y-weighted sum (the ln discipline — a last-ulp
# libm wobble is ~1e-10 of the grid step), with a generic phase offset
# 0.1234567 rad so no sample angle lands on the exact .5/0/±1 cosine
# values where a 1-ulp wobble could straddle a floor boundary. The
# weighted sums are exact int64 (|y|·1e6·n_hours ≪ 2^63); the final
# energy ratio squares them in double (each operand < 2^53 → exact
# conversion, correctly-rounded square) and milli-quantizes.
_PERIODOGRAM_SQL = """
WITH hourly AS (
  SELECT event_type,
         CAST(FLOOR({EPOCH} / 3600) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, y,
         h - MIN(h) OVER (PARTITION BY event_type) AS t
  FROM hourly
),
periods AS (
  SELECT CAST(24 AS BIGINT) AS p UNION ALL SELECT CAST(168 AS BIGINT)
),
terms AS (
  SELECT i.event_type, pr.p, i.y,
         CAST(FLOOR(cos(2 * pi() * i.t / pr.p + 0.1234567) * 1000000)
              AS BIGINT) AS c,
         CAST(FLOOR(sin(2 * pi() * i.t / pr.p + 0.1234567) * 1000000)
              AS BIGINT) AS s
  FROM idx i CROSS JOIN periods pr
),
sums AS (
  -- DFT sums wide (DECIMAL(38,0), same literal both engines): the
  -- int64 bound |y|·1e6·n_hours held only ~9x margin at the 1e12-row
  -- target (round-10 overflow audit)
  SELECT event_type, p,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS re_u,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * s) AS DECIMAL(38,0)) AS im_u,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(COUNT(*) AS BIGINT) AS n_hours
  FROM terms GROUP BY event_type, p
)
SELECT event_type, p AS period_hours, n_hours,
       CAST(FLOOR(
         (CAST(re_u AS DOUBLE) * re_u + CAST(im_u AS DOUBLE) * im_u)
         / (1000000.0 * 1000000.0)
         / (CAST(sy AS DOUBLE) * sy)
         * 1000000) AS BIGINT) AS energy_ppm_of_sq_mass
FROM sums
"""


@query(
    "ts_periodogram_energy",
    oracle=_PERIODOGRAM_SQL.format(EPOCH="EPOCH(ts)"),
    tags=("timeseries",),
)
def ts_periodogram_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-domain cycle detection: DFT energy of each type's
    hourly series at the daily (24 h) and weekly (168 h) candidate
    periods, as a share of squared total mass — the spectral
    complement to ``stat_seasonality_profile``'s time-domain means
    (a profile can look flat while a phase-shifted cycle carries
    energy, and vice versa). High daily energy ⇒ hour-of-day features
    and day-partitioned processing pay off.

    Scale shape: one hourly rollup (the only data-sized pass), one
    window for the series origin, then |periods|× calendar-sized term
    rows into a hash aggregate — all exact integer lanes until two
    final IEEE-exact squares."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_PERIODOGRAM_SQL.format(EPOCH="unix_timestamp(ts)"))
