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

from udacity_data_engineer_capstone_spark.catalog import load_table
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
