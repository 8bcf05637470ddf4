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
