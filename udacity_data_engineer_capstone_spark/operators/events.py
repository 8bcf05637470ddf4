"""Event-time windowed aggregations over the ``events`` table (batch
form; the streaming twins live in :mod:`..streaming.events`).

The reference has zero window/streaming constructs (SURVEY §2.8); these
are north-star extensions. All three window shapes are expressed with
Spark's native event-time window functions — ``F.window`` (tumbling &
sliding) and ``F.session_window`` — which at scale become a single hash
aggregate keyed by (window, keys): partial aggregation happens map-side,
so the shuffle carries one row per (window, key) per partition, not one
row per event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table, register_views
from udacity_data_engineer_capstone_spark.operators.ordinal import (
    composite_bucket_key,
    global_row_number,
)
from udacity_data_engineer_capstone_spark.registry import query

_TUMBLING_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT))
         AS BIGINT) AS sum_value_micros
FROM events
GROUP BY 1, 2
"""


@query("evt_window_tumbling", oracle=_TUMBLING_ORACLE, tags=("events", "window"))
def evt_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows per event type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact BIGINT micros: the decimal(18,6) conversion is the
            # same on both engines, then integer scaling — no DECIMAL
            # (driver-hash-unstable in r2/r3) reaches the output
            F.sum(
                (F.col("value").cast("decimal(18,6)") * 1000000).cast("long")
            ).alias("sum_value_micros"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_micros",
        )
    )


# sliding windows: length 60 min, slide 15 min ⇒ every event belongs to the
# 4 windows starting at its 15-min-aligned timestamp minus 0/15/30/45 min.
_SLIDING_ORACLE = """
WITH aligned AS (
  SELECT date_trunc('hour', ts)
           + (minute(ts) // 15) * INTERVAL 15 MINUTE AS a15,
         event_type, value
  FROM events
)
SELECT a15 - k.k * INTERVAL 15 MINUTE AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT))
         AS BIGINT) AS sum_value_micros
FROM aligned
CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
GROUP BY 1, 2
"""


@query("evt_window_sliding", oracle=_SLIDING_ORACLE, tags=("events", "window"))
def evt_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes (each event counted in 4
    overlapping windows)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact BIGINT micros: the decimal(18,6) conversion is the
            # same on both engines, then integer scaling — no DECIMAL
            # (driver-hash-unstable in r2/r3) reaches the output
            F.sum(
                (F.col("value").cast("decimal(18,6)") * 1000000).cast("long")
            ).alias("sum_value_micros"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_micros",
        )
    )


# session windows, 30-minute inactivity gap. Spark semantics: a session's
# end is last_event + gap, and an event at exactly previous_ts + gap does
# NOT merge (windows are end-exclusive) → new session when diff >= gap.
_SESSION_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
islands AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT))
         AS BIGINT) AS sum_value_micros
FROM islands
GROUP BY user_id, session_id
"""


@query("evt_window_session", oracle=_SESSION_ORACLE, tags=("events", "window"))
def evt_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap
    (``F.session_window``; oracle is the classic gaps-and-islands SQL)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact BIGINT micros: the decimal(18,6) conversion is the
            # same on both engines, then integer scaling — no DECIMAL
            # (driver-hash-unstable in r2/r3) reaches the output
            F.sum(
                (F.col("value").cast("decimal(18,6)") * 1000000).cast("long")
            ).alias("sum_value_micros"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value_micros",
        )
    )


_JSON_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
"""


_MAP_ORACLE = """
SELECT event_id,
       array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
       CAST(len(json_keys(props)) AS INT) AS n_keys
FROM events
"""


@query("fn_map_sampler", oracle=_MAP_ORACLE, tags=("events", "scalar", "map"))
def fn_map_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse JSON props into map<string,int>, then key
    listing, element access (NULL-safe ``try_element_at`` — plain ``[]``
    throws on a missing key under ANSI mode), and cardinality. Oracle
    uses DuckDB's JSON functions over the same payload."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "m", F.from_json("props", "map<string,int>")
    )
    return ev.select(
        "event_id",
        F.concat_ws(",", F.array_sort(F.map_keys("m"))).alias("keys_csv"),
        F.try_element_at("m", F.lit("k")).alias("k_val"),
        F.size("m").alias("n_keys"),
    )


@query("fn_json_extract", oracle=_JSON_ORACLE, tags=("events", "scalar", "json"))
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the ``props`` column + aggregate —
    the semi-structured-column path (scalar JSON functions are absent
    from the reference, SURVEY §2.8)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sum_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# ordered funnel
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id)
SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
       CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            WHEN v.user_id IS NOT NULL THEN 1
            ELSE 0 END AS stage
FROM u
LEFT JOIN v ON v.user_id = u.user_id
LEFT JOIN c ON c.user_id = u.user_id
LEFT JOIN p ON p.user_id = u.user_id
"""


@query("evt_funnel", oracle=_FUNNEL_ORACLE, tags=("events",))
def evt_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: each stage's
    timestamp is the earliest event of that type occurring strictly
    after the previous stage (the product-analytics definition — a click
    before the first view does not count).

    Per-stage dataflow: filter + per-user min aggregate + equi-join back
    on user_id — three narrow hash aggregations co-partitioned on the
    same key, so under one repartition the stages pipeline without
    re-shuffling. Timestamps pass through untouched (no arithmetic), so
    the oracle hash is exact."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        u.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "t_view", "t_click", "t_purchase", stage.alias("stage"))
    )


# ---------------------------------------------------------------------------
# cohort retention
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         CAST(datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS INT) AS day_offset
  FROM events e JOIN firsts f ON f.user_id = e.user_id
)
SELECT cohort_day, day_offset, COUNT(*) AS n_users
FROM activity
GROUP BY cohort_day, day_offset
"""


@query("evt_retention", oracle=_RETENTION_ORACLE, tags=("events",))
def evt_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    counted once per (cohort, day-offset) they return on — the classic
    growth-analytics triangle. Two shuffles on user_id (first-day
    aggregate + the distinct), then a count on the small (cohort,
    offset) key space; integer date arithmetic end to end."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# ---------------------------------------------------------------------------
# value histogram
# ---------------------------------------------------------------------------

_HIST_BIN = 50

_HIST_ORACLE = f"""
SELECT event_type,
       CAST(floor(value / {_HIST_BIN}) AS BIGINT) AS bin,
       COUNT(*) AS n_events,
       CAST(floor(value / {_HIST_BIN}) AS BIGINT) * {_HIST_BIN} AS bin_lo
FROM events
GROUP BY 1, 2
"""


@query("agg_value_histogram", oracle=_HIST_ORACLE, tags=("agg", "stats"))
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per event type (floor-binned — the same
    IEEE op in both engines, unlike width_bucket's edge handling).
    Partial-aggregates map-side; the shuffle carries one row per
    (type, bin)."""
    ev = load_table(spark, sf_dir, "events")
    bin_ = F.floor(F.col("value") / _HIST_BIN).cast("long")
    return ev.groupBy(
        "event_type", bin_.alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
    ).withColumn("bin_lo", F.col("bin") * _HIST_BIN)


# ---------------------------------------------------------------------------
# per-user event paths
# ---------------------------------------------------------------------------

_PATH_ORACLE = """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
"""

_PATH_SPARK = """
SELECT user_id,
       listagg(event_type, '>') WITHIN GROUP (ORDER BY ts, event_id) AS path,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
"""


@query("evt_user_path", oracle=_PATH_ORACLE, tags=("events", "string"))
def evt_user_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered event path (``view>click>purchase>...``) — the
    input shape for sequence mining / Markov funnel models. Ordered
    listagg with a (ts, event_id) total order makes the string
    deterministic. Ordered concat cannot partial-aggregate; at
    billion-event users, cap the sequence first (curate_group_cap
    pattern)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_PATH_SPARK)


# ---------------------------------------------------------------------------
# sessionized funnel
# ---------------------------------------------------------------------------

_SESSION_FUNNEL_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
islands AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM ordered
),
v AS (SELECT user_id, session_id, MIN(ts) AS t_view FROM islands
      WHERE event_type = 'view' GROUP BY user_id, session_id),
c AS (SELECT i.user_id, i.session_id, MIN(i.ts) AS t_click
      FROM islands i JOIN v ON v.user_id = i.user_id
                           AND v.session_id = i.session_id
      WHERE i.event_type = 'click' AND i.ts > v.t_view
      GROUP BY i.user_id, i.session_id)
SELECT s.user_id, s.session_id, s.n_events,
       (v.user_id IS NOT NULL) AS saw_view,
       (c.user_id IS NOT NULL) AS converted_click
FROM (SELECT user_id, session_id, COUNT(*) AS n_events
      FROM islands GROUP BY user_id, session_id) s
LEFT JOIN v ON v.user_id = s.user_id AND v.session_id = s.session_id
LEFT JOIN c ON c.user_id = s.user_id AND c.session_id = s.session_id
"""


@query("evt_session_funnel", oracle=_SESSION_FUNNEL_ORACLE, tags=("events",))
def evt_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel scoped to sessions: within each 30-minute-gap session, did
    the user view and then click? Composes the gaps-and-islands
    sessionizer with the ordered-stage pattern of ``evt_funnel`` — the
    per-session conversion shape product analytics actually reports.
    All joins are on (user_id, session_id); timestamps pass through
    untouched."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap (a seconds cast would truncate and disagree
    # with the oracle's INTERVAL comparison on sub-second boundaries)
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap >= 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    islands = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("session_id"),
    )
    s = islands.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    v = (
        islands.filter(F.col("event_type") == "view")
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        islands.filter(F.col("event_type") == "click")
        .join(v, ["user_id", "session_id"])
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("t_click"))
    )
    return (
        s.join(v.select("user_id", "session_id", F.lit(True).alias("saw_view")),
               ["user_id", "session_id"], "left")
        .join(c.select("user_id", "session_id",
                       F.lit(True).alias("converted_click")),
              ["user_id", "session_id"], "left")
        .select(
            "user_id", "session_id", "n_events",
            F.coalesce("saw_view", F.lit(False)).alias("saw_view"),
            F.coalesce("converted_click", F.lit(False)).alias("converted_click"),
        )
    )


# ---------------------------------------------------------------------------
# Markov transition matrix
# ---------------------------------------------------------------------------

# One SQL text for both engines. The per-user ORDER BY carries event_id
# as tiebreak so simultaneous events order identically everywhere.
_TRANSITION_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


@query("evt_transition_matrix", oracle=_TRANSITION_SQL, tags=("events", "window"))
def evt_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts (the Markov-chain edge weights
    behind next-action models): LAG over each user's event-time-ordered
    stream, then a tiny (type x type) count aggregate. One shuffle on
    user_id for the window sort; the group-by then reduces map-side to
    at most |types|^2 rows per partition."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_TRANSITION_SQL)


# ---------------------------------------------------------------------------
# event-rate anomaly detection (z-score per minute bucket)
# ---------------------------------------------------------------------------

# Per-type moments are exact BIGINTs; mean/sd/z are a fixed tree of
# IEEE-correctly-rounded ops (casts, +,-,*,/, sqrt), so z is
# bit-identical cross-engine and the |z| > 3 cut is deterministic.
# Shared SQL text for both engines.
# The Σc² lane runs in the DECIMAL(38,0)↔HUGEINT wide pair: with the
# event window fixed, per-minute counts grow linearly with corpus size
# (c ≈ 2e6 at the 1e12-row target), so Σc² ≈ 4e17·minutes crosses int64
# within a decade of the target (round-11 Σ-square audit).


def _anomaly_sql(wide: str) -> str:
    return f"""
WITH buckets AS (
  SELECT event_type, date_trunc('minute', ts) AS minute,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, date_trunc('minute', ts)
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(CAST(c AS {wide}) * c) AS {wide}) AS ss
  FROM buckets GROUP BY event_type
)
SELECT b.event_type, b.minute, b.c AS n_events,
       (b.c - CAST(m.s AS DOUBLE) / m.n)
         / nullif(sqrt((CAST(m.ss AS DOUBLE) - CAST(m.s AS DOUBLE) * m.s / m.n)
                       / (m.n - 1)), 0) AS z
FROM buckets b JOIN m ON b.event_type = m.event_type AND m.n > 1
WHERE abs((b.c - CAST(m.s AS DOUBLE) / m.n)
          / nullif(sqrt((CAST(m.ss AS DOUBLE) - CAST(m.s AS DOUBLE) * m.s / m.n)
                        / (m.n - 1)), 0)) > 3
"""


@query(
    "evt_anomaly_zscore", oracle=_anomaly_sql("HUGEINT"), tags=("events", "stats")
)
def evt_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute event-rate anomalies: minutes whose event count sits
    more than 3 sample standard deviations from that event type's mean
    rate — the traffic-spike/outage detector over the event stream. Two
    hash aggregates (minute buckets, then per-type moments; both reduce
    map-side) and a broadcast-sized join back onto the bucket table.
    The z expression is a fixed tree of correctly-rounded IEEE ops over
    exact integer moments, so the 3-sigma cut is deterministic — no
    float-fold drift can flip a row in or out."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_anomaly_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# gaps and islands: maximal runs of consecutive active minutes
# ---------------------------------------------------------------------------

# minute_idx - row_number() is constant exactly within a run of
# consecutive minutes — the classic gaps-and-islands trick, all in
# exact integers. Engine and oracle differ only in the epoch-seconds
# builtin (unix_timestamp vs epoch); everything downstream is shared
# arithmetic.
_ISLANDS_BODY = """
minutes AS (
  SELECT DISTINCT user_id, {minute_idx} AS m
  FROM events
),
grouped AS (
  SELECT user_id, m,
         m - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY m) AS grp
  FROM minutes
)
SELECT user_id,
       CAST(MIN(m) AS BIGINT) AS start_minute,
       CAST(MAX(m) AS BIGINT) AS end_minute,
       CAST(COUNT(*) AS BIGINT) AS n_minutes
FROM grouped
GROUP BY user_id, grp
"""

_ISLANDS_ORACLE = "WITH " + _ISLANDS_BODY.format(
    minute_idx="CAST(epoch(date_trunc('minute', ts)) AS BIGINT) / 60"
)


@query("evt_gaps_islands", oracle=_ISLANDS_ORACLE, tags=("events", "window"))
def evt_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's maximal runs of consecutive active
    minutes (the activity-streak / uptime-segment primitive). The
    integer minute index minus the per-user row number is constant
    exactly within a consecutive run, so one window plus one aggregate
    finds every island — no self-join, no iteration. One shuffle on
    user_id serves both the window and (via partial aggregation) the
    island rollup; all arithmetic is exact integers."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        "WITH "
        + _ISLANDS_BODY.format(
            minute_idx="CAST(unix_timestamp(date_trunc('minute', ts)) AS BIGINT) DIV 60"
        )
    )


# ---------------------------------------------------------------------------
# last-touch attribution
# ---------------------------------------------------------------------------

# Engine/oracle differ only in IGNORE NULLS placement (Spark:
# `last_value(x) IGNORE NULLS`, DuckDB: `last_value(x IGNORE NULLS)`).
# The window excludes the current row, so a purchase never attributes
# to itself; the total order (ts, event_id) makes the answer exact.
_ATTRIB_BODY = """
SELECT user_id, event_id AS purchase_event_id, ts AS purchase_ts,
       COALESCE(last_touch, 'none') AS attributed_channel
FROM (
  SELECT user_id, event_id, ts, event_type,
         {last_value} OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_touch
  FROM (SELECT user_id, event_id, ts, event_type,
               CASE WHEN event_type IN ('view', 'click')
                    THEN event_type END AS channel
        FROM events)
)
WHERE event_type = 'purchase'
"""

_ATTRIB_ORACLE = _ATTRIB_BODY.format(last_value="last_value(channel IGNORE NULLS)")


@query("evt_attribution_last_touch", oracle=_ATTRIB_ORACLE, tags=("events", "window"))
def evt_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the most recent
    preceding view/click by the same user — the marketing-analytics
    primitive for conversion credit. One IGNORE NULLS navigation window
    over the user timeline (self-excluded frame) finds the touch; no
    self-join of events to events, so cost is one user_id shuffle
    regardless of timeline length."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        _ATTRIB_BODY.format(last_value="last_value(channel) IGNORE NULLS")
    )


# ---------------------------------------------------------------------------
# Markov stationary distribution of the event-type chain
# ---------------------------------------------------------------------------

# π ← πP iterated in integer fixed point (same discipline as
# emb_pca_power_iteration): transition counts n_ij and row sums r_i are
# exact integers; each step computes π'_j = Σ_i π_i·n_ij // r_i in
# int64, then renormalizes to L1 mass 1e6 with truncating division.
# Headroom: π ≤ 1e6, n ≤ 1e12 events/pair → products ≤ 1e18 < 2^63.
_MARKOV_ITERS = 6

_MARKOV_BASE = """
trans AS MATERIALIZED (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type,
           event_type AS next_type
    FROM events
  )
  WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
),
rowsum AS MATERIALIZED (
  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS r FROM trans GROUP BY prev_type
),
types AS MATERIALIZED (SELECT DISTINCT prev_type AS t FROM trans),
p0 AS MATERIALIZED (
  SELECT t, CAST(1000000 AS BIGINT) // (SELECT COUNT(*) FROM types) AS pi
  FROM types
)
"""

_MARKOV_STEP = """
m{i} AS MATERIALIZED (
  SELECT tr.next_type AS t,
         CAST(SUM(p.pi * tr.n // rs.r) AS BIGINT) AS raw
  FROM trans tr
  JOIN rowsum rs ON rs.prev_type = tr.prev_type
  JOIN p{prev} p ON p.t = tr.prev_type
  GROUP BY tr.next_type
),
s{i} AS MATERIALIZED (SELECT CAST(SUM(raw) AS BIGINT) AS tot FROM m{i}),
p{i} AS MATERIALIZED (
  SELECT t, (raw * 1000000) // tot AS pi FROM m{i}, s{i}
)
"""


def _markov_oracle() -> str:
    ctes = [_MARKOV_BASE]
    for i in range(1, _MARKOV_ITERS + 1):
        ctes.append(_MARKOV_STEP.format(i=i, prev=i - 1))
    return (
        "WITH "
        + ",".join(ctes)
        + f"SELECT t AS event_type, pi AS stationary_ppm FROM p{_MARKOV_ITERS}"
    )


@query("evt_markov_stationary", oracle=_markov_oracle(), tags=("events", "iterative"))
def evt_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution (ppm) of the event-type Markov chain —
    where user behavior settles long-run, the weighting next-action
    models and crawl schedulers use. Transition counts come from one
    windowed LAG pass (corpus-sized); the |types|² chain then iterates
    entirely in broadcast-sized frames with exact integer fixed-point
    arithmetic, so both engines agree bitwise after any number of
    rounds."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    trans = (
        seq.groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)  # tiny |types|^2 frame, computed once
    )
    rowsum = trans.groupBy("prev_type").agg(F.sum("n").alias("r"))
    n_types = trans.select("prev_type").distinct().count()
    pi = trans.select("prev_type").distinct().select(
        F.col("prev_type").alias("t"),
        F.lit(1_000_000 // n_types).cast("long").alias("pi"),
    )
    for _ in range(_MARKOV_ITERS):
        m = (
            trans.join(F.broadcast(rowsum), "prev_type")
            .join(F.broadcast(pi.withColumnRenamed("t", "prev_type")), "prev_type")
            .groupBy(F.col("next_type").alias("t"))
            .agg(F.sum(F.expr("pi * n DIV r")).alias("raw"))
        )
        s = m.agg(F.sum("raw").alias("tot"))
        pi = m.crossJoin(F.broadcast(s)).selectExpr(
            "t", "(raw * 1000000) DIV tot AS pi"
        )
    return pi.select(
        F.col("t").alias("event_type"), F.col("pi").alias("stationary_ppm")
    )


# ---------------------------------------------------------------------------
# event-type sequence n-grams (next-action model input)
# ---------------------------------------------------------------------------

_SEQ_NGRAM_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type, 2) OVER w AS t0,
         LAG(event_type, 1) OVER w AS t1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
grams AS (
  SELECT t0, t1, event_type AS t2 FROM seq WHERE t0 IS NOT NULL
)
SELECT t0, t1, t2,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) * 1000000 // (SELECT COUNT(*) FROM grams) AS BIGINT)
         AS share_ppm
FROM grams
GROUP BY t0, t1, t2
"""


@query("evt_sequence_ngrams", oracle=_SEQ_NGRAM_SQL, tags=("events", "window"))
def evt_sequence_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type trigram frequencies across all user streams — the
    sequence statistic next-action models and funnel designers start
    from. One LAG window pass per user (the same user_id partitioning
    every sequence operator here shares), then a |types|³-bounded hash
    aggregate; shares are exact integer ppm. Shared SQL text with the
    oracle."""
    register_views(spark, sf_dir, ("events",))
    # same text; Spark spells integer division DIV, DuckDB //
    return spark.sql(_SEQ_NGRAM_SQL.replace("//", "DIV"))


# ---------------------------------------------------------------------------
# audience overlap matrix (event-type user-set Jaccard)
# ---------------------------------------------------------------------------

_AUDIENCE_SQL = """
WITH audiences AS (
  SELECT DISTINCT event_type, user_id FROM events
),
sizes AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM audiences GROUP BY event_type
),
ovl AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM audiences a
  JOIN audiences b ON b.user_id = a.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT o.type_a, o.type_b, sa.n AS n_a, sb.n AS n_b, o.n_both,
       CAST(o.n_both * 1000000 // (sa.n + sb.n - o.n_both) AS BIGINT)
         AS jaccard_ppm
FROM ovl o
JOIN sizes sa ON sa.event_type = o.type_a
JOIN sizes sb ON sb.event_type = o.type_b
"""


@query("evt_audience_overlap", oracle=_AUDIENCE_SQL, tags=("events", "agg"))
def evt_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: exact-ppm Jaccard between each pair of
    event types' user sets — the segment-intersection report behind
    campaign planning (and the exact ground truth the KMV/theta sketch
    ops approximate). One distinct-projection, a user-keyed self-join
    (fan-out = types-per-user ≤ |types|), and broadcast-sized size
    joins."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_AUDIENCE_SQL.replace("//", "DIV"))


# ---------------------------------------------------------------------------
# timed cart abandonment (funnel complement)
# ---------------------------------------------------------------------------

_ABANDON_SQL = """
WITH clicks AS (
  SELECT user_id, ts AS click_ts, event_id
  FROM events WHERE event_type = 'click'
),
converted AS (
  SELECT DISTINCT c.user_id, c.event_id
  FROM clicks c
  JOIN events p
    ON p.user_id = c.user_id
   AND p.event_type = 'purchase'
   AND p.ts > c.click_ts
   AND p.ts <= c.click_ts + INTERVAL 1 HOUR
)
SELECT c.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(COUNT(*) - COUNT(v.event_id) AS BIGINT) AS n_abandoned,
       CAST((COUNT(*) - COUNT(v.event_id)) * 1000000 // COUNT(*) AS BIGINT)
         AS abandon_ppm
FROM clicks c
LEFT JOIN converted v
  ON v.user_id = c.user_id AND v.event_id = c.event_id
GROUP BY c.user_id
"""


@query("evt_cart_abandonment", oracle=_ABANDON_SQL, tags=("events", "join"))
def evt_cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timed funnel complement: per user, the clicks NOT followed by a
    purchase within one hour (exact-ppm abandonment rate) — the
    retargeting audience query. The conversion check is a time-bounded
    range join per user (state bounded by the 1-hour horizon — the same
    bound its streaming twin would give a watermark); the roll-up is
    one user-keyed aggregate. Shared SQL text."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_ABANDON_SQL.replace("//", "DIV"))


# ---------------------------------------------------------------------------
# dense series materialization (gap fill)
# ---------------------------------------------------------------------------

_GAP_FILL_SQL = """
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
),
spine AS (
  SELECT u.h FROM bounds,
       LATERAL (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h) u
),
types AS (SELECT DISTINCT event_type FROM events),
observed AS (
  SELECT event_type, date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)
)
SELECT t.event_type, s.h AS hour,
       CAST(COALESCE(o.c, 0) AS BIGINT) AS n_events,
       (o.c IS NULL) AS was_gap
FROM spine s
CROSS JOIN types t
LEFT JOIN observed o ON o.event_type = t.event_type AND o.h = s.h
"""


@query("evt_gap_fill", oracle=_GAP_FILL_SQL, tags=("events", "timeseries"))
def evt_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type: cross the generated hour
    spine with the type dim and left-join observed counts, zero-filling
    gaps (and flagging them) — the materialization every window/lag
    analysis needs before treating a series as evenly spaced. The spine
    and type dim are broadcast-sized; only the observed aggregate
    touches event-scale data."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour")
    )
    types = ev.select("event_type").distinct()
    observed = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        spine.crossJoin(F.broadcast(types))
        .join(observed, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("n_events"),
            F.col("c").isNull().alias("was_gap"),
        )
    )


# ---------------------------------------------------------------------------
# peak concurrency (sweep-line over interval endpoints)
# ---------------------------------------------------------------------------

# Each event opens a fixed 5-minute activity interval; peak concurrency
# per event type is the classic sweep-line: explode every interval into
# a +1 (start) and a -1 (end) endpoint, order endpoints by time, take
# the running sum's maximum. Ends sort BEFORE starts at the same
# instant (endpoint kind 0 vs 1) so back-to-back intervals don't count
# as overlapping — the convention both engines encode identically in
# the ORDER BY. Exact integers end to end.

_CONCURRENCY_SQL = """
WITH endpoints AS (
  SELECT event_type, unix_micros(ts) AS t, 1 AS kind, 1 AS delta
  FROM events
  UNION ALL
  SELECT event_type, unix_micros(ts) + 300000000 AS t, 0 AS kind, -1 AS delta
  FROM events
),
swept AS (
  SELECT event_type,
         SUM(delta) OVER (PARTITION BY event_type
                          ORDER BY t, kind, delta
                          ROWS UNBOUNDED PRECEDING) AS live
  FROM endpoints
)
SELECT event_type,
       CAST(MAX(live) AS BIGINT) AS peak_concurrency
FROM swept
GROUP BY event_type
"""

_CONCURRENCY_DUCK = _CONCURRENCY_SQL.replace("unix_micros(ts)", "epoch_us(ts)")


@query("evt_peak_concurrency", oracle=_CONCURRENCY_DUCK, tags=("events", "window"))
def evt_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent activity per event type: sweep-line over 5-minute
    activity intervals (see section comment for the endpoint-ordering
    convention). The question every capacity plan asks — "how many are
    active AT ONCE at the worst moment" — which no plain windowed count
    answers, because tumbling windows quantize the peak away.

    Scale shape: the endpoint explode doubles rows (narrow map); the
    running sum is one sorted window pass PARTITIONED BY event_type —
    per-partition sort bounded by per-type event counts, the same
    bound every other per-key window op here carries. The final MAX is
    a partial+final aggregate. Duplicate timestamps are handled by the
    deterministic (t, kind, delta) total order, ends first."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_CONCURRENCY_SQL)


# ---------------------------------------------------------------------------
# DAU / WAU / MAU rolling active users
# ---------------------------------------------------------------------------

_ACTIVES_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events
),
bounds AS (SELECT MAX(d) AS max_d FROM days),
expanded AS (
  SELECT dy.user_id, dy.d + CAST(o AS INT) AS wend, CAST(o AS INT) AS o
  FROM days dy, unnest(range(0, 28)) AS u(o)
)
SELECT e.wend AS day,
       CAST(COUNT(DISTINCT CASE WHEN e.o = 0 THEN e.user_id END) AS BIGINT)
         AS dau,
       CAST(COUNT(DISTINCT CASE WHEN e.o <= 6 THEN e.user_id END) AS BIGINT)
         AS wau,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS mau
FROM expanded e CROSS JOIN bounds b
WHERE e.wend <= b.max_d
GROUP BY e.wend
"""


@query("evt_dau_wau_mau", oracle=_ACTIVES_ORACLE, tags=("events", "agg"))
def evt_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling active-user counts — DAU, trailing-7-day WAU and
    trailing-28-day MAU per calendar day, the canonical engagement
    dashboard triple, computed EXACTLY (no sketch) by the offset-
    expansion trick: each distinct (user, day) activity contributes to
    the 28 window-ends it falls inside, and one conditional
    COUNT(DISTINCT) per horizon reads all three off a single expansion.

    Scale shape: the corpus-sized stage is the DISTINCT down to
    (user, active-day) — the standard activity compression, shuffling
    id-width rows with map-side partials. The ×28 expansion then grows
    with |active pairs|, not events, and the final aggregate shuffles
    per (day, user) once. For ad-hoc horizons or sketch-sized state,
    swap the exact distinct for the theta/HLL sketches
    (`agg_theta_sketch_setops`, `agg_hll_partitioned`) — same frame."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).distinct()
    max_d = days.agg(F.max("d").alias("max_d"))
    expanded = days.select(
        "user_id",
        "d",
        F.explode(F.sequence(F.lit(0), F.lit(27))).alias("o"),
    ).select(
        "user_id", F.expr("date_add(d, o)").alias("wend"), "o"
    )
    return (
        expanded.join(F.broadcast(max_d), F.col("wend") <= F.col("max_d"))
        .groupBy(F.col("wend").alias("day"))
        .agg(
            F.countDistinct(
                F.when(F.col("o") == 0, F.col("user_id"))
            ).alias("dau"),
            F.countDistinct(
                F.when(F.col("o") <= 6, F.col("user_id"))
            ).alias("wau"),
            F.countDistinct("user_id").alias("mau"),
        )
    )


# ---------------------------------------------------------------------------
# cohort LTV curves: cumulative value by signup cohort x age week
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
),
spend AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
wk AS (
  SELECT f.cohort_day,
         CAST(date_diff('day', f.cohort_day, s.day) // 7 AS BIGINT) AS age_week,
         CAST(SUM(s.cents) AS BIGINT) AS week_cents
  FROM spend s JOIN firsts f USING (user_id)
  GROUP BY f.cohort_day, date_diff('day', f.cohort_day, s.day) // 7
),
sz AS (
  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM firsts GROUP BY cohort_day
)
SELECT w.cohort_day, w.age_week, z.n_users, w.week_cents,
       CAST(SUM(w.week_cents) OVER (PARTITION BY w.cohort_day
                                    ORDER BY w.age_week) AS BIGINT)
         AS cum_cents,
       CAST(SUM(w.week_cents) OVER (PARTITION BY w.cohort_day
                                    ORDER BY w.age_week)
            * 1000 // z.n_users AS BIGINT) AS cum_per_user_milli
FROM wk w JOIN sz z USING (cohort_day)
"""


@query("evt_ltv_cohort", oracle=_LTV_ORACLE, tags=("events", "window"))
def evt_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by first-activity
    day, spend accumulated by week-of-life, normalized per cohort
    member — the retention-economics readout that pairs with
    ``evt_retention``'s activity triangles (this one follows the money,
    that one the presence).

    Scale shape: two user-keyed hash aggregates (first-touch, daily
    spend) and one broadcast-sized cohort join; the cumulative window
    runs over cohorts x weeks (calendar-bounded). All value lanes are
    exact integer cents; division is truncating on non-negative
    operands (values are >= 0 in this event stream)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    spend = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint")).alias("cents")
    )
    wk = (
        spend.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            (F.datediff(F.col("day"), F.col("cohort_day")) / 7)
            .cast("bigint")
            .alias("age_week"),
        )
        .agg(F.sum("cents").alias("week_cents"))
    )
    sz = firsts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    w = Window.partitionBy("cohort_day").orderBy("age_week")
    return (
        wk.join(F.broadcast(sz), "cohort_day")
        .withColumn("cum_cents", F.sum("week_cents").over(w).cast("long"))
        .select(
            "cohort_day",
            "age_week",
            "n_users",
            "week_cents",
            "cum_cents",
            F.expr("cum_cents * 1000 DIV n_users").alias("cum_per_user_milli"),
        )
    )


# ---------------------------------------------------------------------------
# conversion latency: first view -> first purchase, with exact quantiles
# ---------------------------------------------------------------------------

# Quantiles ride the doubled-rank integer trick for the median and a
# ceil(0.9 n) rank for p90 (both spelled floor((...)/k) on positive
# operands so the rank arithmetic is identical across engines).
_CONV_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT user_id, MIN(ts) AS t_buy FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
),
lat AS (
  SELECT v.user_id,
         CAST(date_diff('second', v.t_view, p.t_buy) AS BIGINT) AS secs
  FROM v JOIN p USING (user_id)
  WHERE p.t_buy > v.t_view
),
ranked AS (
  SELECT secs,
         ROW_NUMBER() OVER (ORDER BY secs, user_id) AS rn,
         COUNT(*) OVER () AS n
  FROM lat
)
SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
       CAST(MAX(CASE WHEN rn = floor((n + 1) / 2) THEN secs END)
            + MAX(CASE WHEN rn = floor((n + 2) / 2) THEN secs END)
         AS BIGINT) AS p50_secs2,
       CAST(MAX(CASE WHEN rn = floor((9 * n + 9) / 10) THEN secs END)
         AS BIGINT) AS p90_secs,
       CAST(MIN(secs) AS BIGINT) AS min_secs,
       CAST(MAX(secs) AS BIGINT) AS max_secs
FROM ranked
"""


@query("evt_conversion_latency", oracle=_CONV_ORACLE, tags=("events", "stats"))
def evt_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time from first view to first purchase across converting users:
    count, exact median (doubled-second units), p90 (rank ceil(0.9 n)),
    min/max — the activation-latency readout a growth dashboard pairs
    with ``evt_funnel``'s step counts.

    Scale shape: two filtered user-keyed aggregates, a user equi-join,
    then the converted-user ranking via the two-phase exact ordinal
    (``operators.ordinal.global_row_number``; latencies are integer
    seconds with heavy ties, so the bucket key folds user_id in) —
    identical ranks to the global window it replaces, and the
    percentile rank positions become driver literals from the ordinal's
    count. All integer second lanes."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    lat = (
        v.join(p, "user_id")
        .filter(F.col("t_buy") > F.col("t_view"))
        .select(
            "user_id",
            (
                F.unix_timestamp("t_buy") - F.unix_timestamp("t_view")
            ).cast("long").alias("secs"),
        )
    )
    ranked, n = global_row_number(
        lat,
        [F.col("secs"), F.col("user_id")],
        composite_bucket_key(F.col("secs"), F.col("user_id")),
        out="rn",
    )
    r_lo, r_hi, r_90 = (n + 1) // 2, (n + 2) // 2, (9 * n + 9) // 10
    return ranked.agg(
        F.lit(n if n > 0 else None).cast("long").alias("n_converted"),
        (
            F.max(F.when(F.col("rn") == r_lo, F.col("secs")))
            + F.max(F.when(F.col("rn") == r_hi, F.col("secs")))
        )
        .cast("long")
        .alias("p50_secs2"),
        F.max(F.when(F.col("rn") == r_90, F.col("secs")))
        .cast("long")
        .alias("p90_secs"),
        F.min("secs").cast("long").alias("min_secs"),
        F.max("secs").cast("long").alias("max_secs"),
    )


# ---------------------------------------------------------------------------
# position-based attribution (40/20/40 with exact largest-remainder split)
# ---------------------------------------------------------------------------

# Credits are integer basis points summing to EXACTLY 10000 per
# purchase: single touch 10000; two touches 5000/5000; otherwise
# first/last 4000 each and the middle 2000 split by integer division
# with the remainder going to the earliest middles (largest-remainder,
# the curate_token_budget discipline). The touch window is 7 days.
_ATTR_POS_ORACLE = """
WITH purchases AS (
  SELECT user_id, event_id AS purchase_id, ts AS pts
  FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id, event_id AS touch_id, ts AS tts, event_type AS channel
  FROM events WHERE event_type IN ('click', 'view')
),
joined AS (
  SELECT p.purchase_id, t.channel, t.tts, t.touch_id,
         ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                            ORDER BY t.tts, t.touch_id) AS rn,
         COUNT(*) OVER (PARTITION BY p.purchase_id) AS cnt
  FROM purchases p
  JOIN touches t
    ON t.user_id = p.user_id
   AND t.tts < p.pts
   AND t.tts >= p.pts - INTERVAL 7 DAY
),
credited AS (
  SELECT purchase_id, channel,
         CASE
           WHEN cnt = 1 THEN 10000
           WHEN cnt = 2 THEN 5000
           WHEN rn = 1 OR rn = cnt THEN 4000
           ELSE 2000 // (cnt - 2)
                + CASE WHEN rn - 1 <= 2000 % (cnt - 2) THEN 1 ELSE 0 END
         END AS bps
  FROM joined
)
SELECT channel,
       CAST(SUM(bps) AS BIGINT) AS total_bps,
       CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_purchases_touched
FROM credited
GROUP BY channel
"""


@query(
    "evt_attribution_position", oracle=_ATTR_POS_ORACLE, tags=("events", "window")
)
def evt_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped 40/20/40) multi-touch attribution over
    a 7-day lookback — the standard refinement of
    ``evt_attribution_last_touch`` when first-touch discovery matters
    as much as closing. Per-purchase credits are exact integer basis
    points that sum to 10000 by construction (largest-remainder middle
    split), so channel totals are fold-order-exact.

    Scale shape: the purchase x prior-touch join is user-keyed and
    window-bounded (7 days), so its fan-out is per-user activity in
    the window, not corpus size; the position window partitions by
    purchase. Integer `/` and `%` run on positive operands only
    (cnt >= 3 in that branch)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("touch_id"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    joined = purchases.join(
        touches,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 7 DAY")),
    )
    w = Window.partitionBy("purchase_id").orderBy("tts", "touch_id")
    wp = Window.partitionBy("purchase_id")
    ranked = joined.select(
        "purchase_id",
        "channel",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("cnt"),
    )
    bps = (
        F.when(F.col("cnt") == 1, F.lit(10000))
        .when(F.col("cnt") == 2, F.lit(5000))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("cnt")), F.lit(4000))
        .otherwise(
            F.expr(
                "2000 DIV (cnt - 2)"
                " + CASE WHEN rn - 1 <= 2000 % (cnt - 2) THEN 1 ELSE 0 END"
            )
        )
    )
    return (
        ranked.select("purchase_id", "channel", bps.alias("bps"))
        .groupBy("channel")
        .agg(
            F.sum("bps").cast("long").alias("total_bps"),
            F.countDistinct("purchase_id").alias("n_purchases_touched"),
        )
    )


# ---------------------------------------------------------------------------
# burstiness: Fano factor of the hourly arrival counts
# ---------------------------------------------------------------------------

# The Σc² lane is HUGEINT (Spark side: SUM over DECIMAL(38,0)): hourly
# counts c ≈ 1e8 at the 1e12-row target make Σc² ≈ 2e19 exceed int64
# (round-11 Σ-square audit). The fold stays INTEGER end-to-end
# (round-12, ADVICE): fano = var/mean = (n·s2 − s1²)/((n−1)·s1), so
# fano_ppm = ⌊10⁶·(n·s2 − s1²) / ((n−1)·s1)⌋ computes entirely in the
# wide pair — no DECIMAL(38,0)→DOUBLE vs HUGEINT→DOUBLE cast whose
# bit-identity above 2⁶⁴ is unverifiable at test scales (DuckDB's
# hugeint→double composes two roundings; Spark's BigDecimal.doubleValue
# is correctly rounded — exactly the >1.8e19 regime the widening exists
# for). Numerator ≈ 10⁶·n·s2 ≈ 2e29 at target scale — inside both
# DECIMAL(38,0) and HUGEINT. Spark DIV truncates toward zero, DuckDB
# // floors: identical here because n·s2 − s1² ≥ 0 (Cauchy–Schwarz)
# and the denominator is positive.
_FANO_ORACLE = """
WITH counts AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)
),
mo AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
  FROM counts GROUP BY event_type
)
SELECT event_type, n AS n_hours, s1 AS n_events,
       CAST((CAST(1000000 AS HUGEINT)
             * (CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1))
            // (CAST(n - 1 AS HUGEINT) * s1) AS BIGINT) AS fano_ppm
FROM mo
"""


@query("evt_burstiness_fano", oracle=_FANO_ORACLE, tags=("events", "stats"))
def evt_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance/mean of hourly arrival counts) per event
    type: 1e6 ppm = Poisson arrivals, higher = bursty (bot spikes,
    campaign waves), lower = paced — the one-number routing statistic
    between ``evt_anomaly_zscore`` (assumes steady) and the burst-aware
    ``ts_stl_anomaly``. One hourly count aggregate + one moment fold;
    the ppm quantization is INTEGER end-to-end in the DECIMAL(38,0)
    wide lane (fano_ppm = ⌊10⁶·(n·s2 − s1²) / ((n−1)·s1)⌋ — see the
    oracle note: no wide→double cast whose cross-engine bit-identity
    is unverifiable above 2⁶⁴)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    mo = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("s2"),
    )
    return mo.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.col("s1").alias("n_events"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (CAST(n AS DECIMAL(38,0)) * s2"
            "    - CAST(s1 AS DECIMAL(38,0)) * s1))"
            " DIV (CAST(n - 1 AS DECIMAL(38,0)) * s1) AS BIGINT)"
        ).alias("fano_ppm"),
    )


# ---------------------------------------------------------------------------
# new vs returning users per day
# ---------------------------------------------------------------------------

_NEW_RET_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY user_id
),
daily AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT d.day,
       CAST(SUM(CASE WHEN f.first_day = d.day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(CASE WHEN f.first_day < d.day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returning,
       CAST(COUNT(*) AS BIGINT) AS n_active
FROM daily d JOIN firsts f USING (user_id)
GROUP BY d.day
"""


@query("evt_new_returning", oracle=_NEW_RET_ORACLE, tags=("events",))
def evt_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning split: each active (user, day) classifies
    against the user's first-ever day — the acquisition/retention
    headline every growth dashboard leads with, and the daily-grain
    companion of ``evt_retention``'s cohort triangles and
    ``evt_dau_wau_mau``'s rolling actives.

    Scale shape: two user-keyed aggregates (first touch, distinct
    activity) and one user equi-join; the first-touch side is
    user-cardinality-sized and co-partitions with the activity table
    on the join key. Pure integer counting."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    daily = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    return (
        daily.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("first_day") == F.col("day"), 1).otherwise(0)
            ).alias("n_new"),
            F.sum(
                F.when(F.col("first_day") < F.col("day"), 1).otherwise(0)
            ).alias("n_returning"),
            F.count(F.lit(1)).alias("n_active"),
        )
    )


# ---------------------------------------------------------------------------
# SLO burn rate: multiwindow error-budget alerting
# ---------------------------------------------------------------------------

_SLO_PPM = 20_000  # 2% error budget

_SLO_ORACLE = f"""
WITH hourly AS (
  SELECT CAST(date_diff('hour', TIMESTAMP '2000-01-01 00:00:00',
                        date_trunc('hour', ts)) AS BIGINT) AS h,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           AS BIGINT) AS errors,
         CAST(COUNT(*) AS BIGINT) AS total
  FROM events
  GROUP BY date_trunc('hour', ts)
),
rolled AS (
  SELECT h, errors, total,
         CAST(SUM(errors) OVER w6 AS BIGINT) AS errors_6h,
         CAST(SUM(total) OVER w6 AS BIGINT) AS total_6h
  FROM hourly
  WINDOW w6 AS (ORDER BY h RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT h, errors, total,
       CAST(errors * 1000000000 // (total * {_SLO_PPM}) AS BIGINT)
         AS burn_1h_milli,
       CAST(errors_6h * 1000000000 // (total_6h * {_SLO_PPM}) AS BIGINT)
         AS burn_6h_milli,
       (errors * 1000000000 // (total * {_SLO_PPM}) > 1000)
       AND (errors_6h * 1000000000 // (total_6h * {_SLO_PPM}) > 1000)
         AS page_alert
FROM rolled
"""


@query("evt_slo_burn_rate", oracle=_SLO_ORACLE, tags=("events", "window"))
def evt_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow SLO burn-rate alerting (the SRE-workbook recipe): a
    page fires only when BOTH the fast (1h) and slow (6h) windows burn
    error budget faster than 1x — fast-only spikes and slow drifts
    alone stay quiet. Budget is 2% errors; burn is exact integer
    milli-multiples of budget; the 6h window is a RANGE frame over the
    integer hour index, so calendar gaps cannot silently shrink it.

    Scale shape: one corpus-sized hourly aggregate, then windows over
    the calendar-bounded bucket table."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("errors"),
            F.count(F.lit(1)).alias("total"),
        )
        .select(
            F.expr(
                "CAST(timestampdiff(HOUR, TIMESTAMP '2000-01-01 00:00:00',"
                " bucket) AS BIGINT)"
            ).alias("h"),
            "errors",
            "total",
        )
    )
    w6 = Window.orderBy("h").rangeBetween(-5, 0)
    rolled = hourly.select(
        "h",
        "errors",
        "total",
        F.sum("errors").over(w6).alias("errors_6h"),
        F.sum("total").over(w6).alias("total_6h"),
    )
    burn1 = F.expr(f"errors * 1000000000 DIV (total * {_SLO_PPM})")
    burn6 = F.expr(f"errors_6h * 1000000000 DIV (total_6h * {_SLO_PPM})")
    return rolled.select(
        "h",
        "errors",
        "total",
        burn1.cast("long").alias("burn_1h_milli"),
        burn6.cast("long").alias("burn_6h_milli"),
        ((burn1 > 1000) & (burn6 > 1000)).alias("page_alert"),
    )


# ---------------------------------------------------------------------------
# session flow matrix: entry type x exit type
# ---------------------------------------------------------------------------

# Reuses the suite's 30-minute session rule (see _SESSION_ORACLE's
# semantics note); entry/exit pick the first/last event by the same
# total order (ts, event_id) the sessionizer uses.
_ENTRY_EXIT_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
islands AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
),
sessions AS (
  SELECT user_id, session_id,
         MIN(ts) AS t0,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MAX(CASE WHEN rn_asc = 1 THEN event_type END) AS entry_type,
         MAX(CASE WHEN rn_desc = 1 THEN event_type END) AS exit_type
  FROM (SELECT *,
               ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                  ORDER BY ts, event_id) AS rn_asc,
               ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                  ORDER BY ts DESC, event_id DESC) AS rn_desc
        FROM islands) x
  GROUP BY user_id, session_id
)
SELECT entry_type, exit_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(n_events) * 1000 // COUNT(*) AS BIGINT)
         AS mean_len_milli
FROM sessions
GROUP BY entry_type, exit_type
"""


@query("evt_session_entry_exit", oracle=_ENTRY_EXIT_ORACLE, tags=("events",))
def evt_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session flow matrix: how sessions OPEN vs how they CLOSE (entry
    event type x exit event type, with counts and mean length) — the
    landing/parting summary a product team reads before diving into
    full paths (``evt_user_path``). Sessions are the suite's standard
    30-minute-gap islands; entry/exit use the sessionizer's own total
    order, so single-event sessions land on the diagonal.

    Scale shape: the gaps-and-islands windows partition by user; the
    flow matrix is a |types|² aggregate. Integer lanes; one truncating
    division on positive operands."""
    ev = load_table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    wlag = Window.partitionBy("user_id").orderBy(*order)
    ordered = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            (
                F.expr("unix_micros(ts)")
                - F.expr("unix_micros(lag(ts) OVER (PARTITION BY user_id"
                         " ORDER BY ts, event_id))")
                >= 1800 * 1_000_000
            )
            | F.lag("ts").over(wlag).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    islands = ordered.withColumn(
        "session_id",
        F.sum("new_session").over(
            wlag.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ws = Window.partitionBy("user_id", "session_id")
    ranked = islands.select(
        "user_id",
        "session_id",
        "event_type",
        F.row_number().over(ws.orderBy(*order)).alias("rn_asc"),
        F.row_number()
        .over(ws.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn_desc"),
    )
    sessions = ranked.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.when(F.col("rn_asc") == 1, F.col("event_type"))).alias(
            "entry_type"
        ),
        F.max(F.when(F.col("rn_desc") == 1, F.col("event_type"))).alias(
            "exit_type"
        ),
    )
    return sessions.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.expr(
            "CAST(SUM(n_events) * 1000 DIV COUNT(*) AS BIGINT)"
        ).alias("mean_len_milli"),
    )


# ---------------------------------------------------------------------------
# funnel path regex: MATCH_RECOGNIZE-lite over per-user event strings
# ---------------------------------------------------------------------------

# Event types compress to one char each so a user's whole journey is a
# short string and the funnel becomes a regular expression. The funnel
# asked here: a view directly converting (a later purchase with no
# intervening purchase) — 'v[^p]*p'.
_PATH_CHAR_CASE = (
    "CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'"
    " WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'"
    " WHEN 'error' THEN 'e' ELSE '?' END"
)

_PATH_REGEX = "v[^p]*p"

_PATH_REGEX_ORACLE = f"""
WITH paths AS (
  SELECT user_id,
         string_agg({_PATH_CHAR_CASE}, '' ORDER BY ts, event_id) AS path,
         CAST(COUNT(*) AS BIGINT) AS path_len
  FROM events GROUP BY user_id
)
SELECT user_id, path_len,
       regexp_matches(path, '{_PATH_REGEX}') AS converted
FROM paths
"""


@query("evt_path_regex_match", oracle=_PATH_REGEX_ORACLE, tags=("events", "funnel"))
def evt_path_regex_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel matching as a regular expression over each user's
    compressed event string ('v[^p]*p': a view that eventually
    converts with no purchase in between) — the MATCH_RECOGNIZE-lite
    pattern that expresses arbitrary ordered funnels without one join
    per step (compare ``evt_funnel``'s fixed-step windows). Per-user
    journey strings are built with an order-pinned aggregate
    (sort by ts, event_id — a total order), so both engines see the
    identical string.

    Scale shape: one hash aggregate keyed by user builds the path (the
    per-user string is session-sized); the regex is a map-side scalar.
    One shuffle total. For multi-year users, cap the path with a
    windowed recent-N filter before aggregating."""
    ev = load_table(spark, sf_dir, "events")
    paths = (
        ev.select(
            "user_id",
            F.struct("ts", "event_id").alias("k"),
            F.expr(_PATH_CHAR_CASE).alias("ch"),
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(k, ch))),"
                " s -> s.ch), '')"
            ).alias("path"),
            F.count(F.lit(1)).alias("path_len"),
        )
    )
    return paths.select(
        "user_id",
        "path_len",
        F.col("path").rlike(_PATH_REGEX).alias("converted"),
    )


# ---------------------------------------------------------------------------
# feature-store export: one ML feature vector per user
# ---------------------------------------------------------------------------

# The features are exact-integer-derived (counts, cents, day indexes)
# cast to double only at assembly, so the array is bit-identical across
# engines. Recency anchors on the corpus high-water mark, not
# wall-clock — deterministic and replayable.
_FEATURE_SQL = """
WITH hw AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
per_user AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_views,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents,
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
         MAX(CAST(ts AS DATE)) AS last_day
  FROM events GROUP BY user_id
)
SELECT p.user_id, p.n_events, p.n_views, p.n_purchases, p.total_cents,
       p.active_days,
       CAST({DATEDIFF} AS BIGINT) AS recency_days,
       {ARR_OPEN}
         CAST(p.n_events AS DOUBLE),
         CAST(p.n_views AS DOUBLE),
         CAST(p.n_purchases AS DOUBLE),
         CAST(p.total_cents AS DOUBLE) / 100,
         CAST(p.active_days AS DOUBLE),
         CAST({DATEDIFF} AS DOUBLE)
       {ARR_CLOSE} AS features
FROM per_user p CROSS JOIN hw
"""


@query(
    "evt_feature_vector_assembly",
    oracle=_FEATURE_SQL.format(
        DATEDIFF="hw.max_day - p.last_day", ARR_OPEN="[", ARR_CLOSE="]"
    ),
    tags=("events", "curation"),
)
def evt_feature_vector_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store export: one row per user with named behavioral
    features (counts, spend, active days, recency vs the corpus
    high-water mark) AND the assembled ``array<double>`` feature
    vector a model server consumes — the batch half of a feature
    platform, with training/serving skew ruled out because both views
    come from the same expression.

    Scale shape: one hash aggregate keyed by user; the high-water mark
    is a 1-row broadcast. Array assembly is a map-side projection."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        _FEATURE_SQL.format(
            DATEDIFF="datediff(hw.max_day, p.last_day)",
            ARR_OPEN="array(",
            ARR_CLOSE=")",
        )
    )


# ---------------------------------------------------------------------------
# velocity rule: too many purchases inside a sliding hour
# ---------------------------------------------------------------------------

_VELOCITY_LIMIT = 3

_VELOCITY_SQL = f"""
WITH purchases AS (
  SELECT user_id, ts, CAST({{EPOCH}} AS BIGINT) AS sec
  FROM events WHERE event_type = 'purchase'
),
windowed AS (
  SELECT user_id, ts,
         CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY sec
                             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS purchases_in_hour
  FROM purchases
),
peaks AS (
  SELECT user_id,
         CAST(MAX(purchases_in_hour) AS BIGINT) AS peak_hour_purchases,
         CAST(COUNT(*) AS BIGINT) AS total_purchases
  FROM windowed GROUP BY user_id
)
SELECT user_id, total_purchases, peak_hour_purchases,
       peak_hour_purchases >= {_VELOCITY_LIMIT} AS velocity_flagged
FROM peaks
"""


@query("evt_fraud_velocity", oracle=_VELOCITY_SQL.format(EPOCH="FLOOR(EPOCH(ts))"), tags=("events", "quality"))
def evt_fraud_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity fraud rule: each user's peak number of purchases inside
    ANY sliding 60-minute window (an event-anchored RANGE frame over
    epoch seconds — windows between events don't need checking because
    the count only changes at an event). Users at or above the limit
    are flagged — the rate-limit primitive of card-fraud and
    abuse-detection rulebooks.

    Scale shape: one user-partitioned range-frame window over the
    purchase subset + one rollup; both shuffles are user-keyed and the
    filter prunes to the purchase stream before any window state."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_VELOCITY_SQL.format(EPOCH="unix_timestamp(ts)"))


# ---------------------------------------------------------------------------
# Kaplan–Meier survival: the statistically-correct churn curve
# ---------------------------------------------------------------------------

# Duration = active days (last − first event day) per user; a user
# whose last activity is within the censoring horizon of the corpus
# high-water mark is CENSORED (still alive as far as the data knows),
# not churned — the distinction naive retention curves ignore. The
# product-limit estimator multiplies (1 − d/n) over event times; each
# factor's ln is quantized to nano-units so the running product is an
# exact integer cumsum, and one exp at the end recovers S(t).
_KM_HORIZON_DAYS = 7

_KM_SQL = f"""
WITH bounds AS (
  SELECT MAX(CAST(ts AS DATE)) AS hw FROM events
),
users AS (
  SELECT user_id,
         MIN(CAST(ts AS DATE)) AS first_day,
         MAX(CAST(ts AS DATE)) AS last_day
  FROM events GROUP BY user_id
),
spans AS (
  SELECT u.user_id,
         CAST({{DDIFF_DUR}} AS BIGINT) AS duration,
         CAST({{DDIFF_CENS}} AS BIGINT) < {_KM_HORIZON_DAYS} AS censored
  FROM users u CROSS JOIN bounds b
),
times AS (
  SELECT duration AS t,
         CAST(SUM(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM spans GROUP BY duration
),
risk AS (
  SELECT t, d, c,
         CAST(SUM(d + c) OVER (ORDER BY t DESC) AS BIGINT) AS n_at_risk
  FROM times
),
steps AS (
  SELECT t, d, c, n_at_risk,
         CASE WHEN d = 0 THEN CAST(0 AS BIGINT)
              WHEN d < n_at_risk
                THEN CAST(FLOOR(LN(1.0 - CAST(d AS DOUBLE) / n_at_risk)
                                * 1000000000) AS BIGINT)
              ELSE CAST(NULL AS BIGINT) END AS ln_nano
  FROM risk
),
walk AS (
  SELECT t, d, c, n_at_risk,
         SUM(ln_nano) OVER (ORDER BY t) AS cum_ln_nano,
         MIN(CASE WHEN d >= n_at_risk THEN 0 ELSE 1 END)
           OVER (ORDER BY t) AS alive
  FROM steps
)
SELECT t AS duration_days, n_at_risk, d AS churned, c AS censored,
       CASE WHEN alive = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(FLOOR(EXP(cum_ln_nano / 1000000000.0) * 1000000)
                      AS BIGINT) END AS survival_ppm
FROM walk
"""


@query(
    "evt_survival_km",
    oracle=_KM_SQL.format(
        DDIFF_DUR="u.last_day - u.first_day",
        DDIFF_CENS="b.hw - u.last_day",
    ),
    tags=("events", "stats"),
)
def evt_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier product-limit survival curve of user lifetime
    (days between first and last activity), with right-censoring:
    users still active within 7 days of the corpus high-water mark are
    censored, not counted as churn — the correction that makes this
    the churn curve a subscription business can actually act on,
    unlike ``evt_retention``'s naive cohort fractions. The running
    product is an exact integer cumsum of quantized log factors, so
    the curve is identical on any partitioning.

    Scale shape: one per-user rollup (the only data-sized pass), then
    windows over the DURATION timeline (bounded by distinct lifetime
    lengths — calendar-sized)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        _KM_SQL.format(
            DDIFF_DUR="datediff(u.last_day, u.first_day)",
            DDIFF_CENS="datediff(b.hw, u.last_day)",
        )
    )


# ---------------------------------------------------------------------------
# next-event prediction: train a transition model, evaluate out-of-time
# ---------------------------------------------------------------------------

# The simplest sequence model there is — predict the most frequent
# next event type per current type — trained on the first half of the
# calendar and EVALUATED on the second half: a genuine out-of-time
# train/test split, the evaluation discipline every production model
# inherits. Ties in the argmax break lexicographically (deterministic).
_NXT_SPLIT = "2024-01-16 00:00:00"

_NXT_SQL = f"""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type,
         LEAD(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS next_ts
  FROM events
),
train AS (
  SELECT event_type AS prev, next_type AS nxt,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM seq
  WHERE next_type IS NOT NULL
    AND next_ts < TIMESTAMP '{_NXT_SPLIT}'
  GROUP BY event_type, next_type
),
model AS (
  SELECT prev, nxt AS predicted_next
  FROM (SELECT prev, nxt,
               ROW_NUMBER() OVER (PARTITION BY prev
                                  ORDER BY c DESC, nxt) AS r
        FROM train) ranked
  WHERE r = 1
),
test AS (
  SELECT event_type AS prev, next_type AS actual_next
  FROM seq
  WHERE next_type IS NOT NULL
    AND ts >= TIMESTAMP '{_NXT_SPLIT}'
)
SELECT t.prev AS event_type, m.predicted_next,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN t.actual_next = m.predicted_next
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(FLOOR(SUM(CASE WHEN t.actual_next = m.predicted_next
                           THEN 1 ELSE 0 END) * 1000000.0 / COUNT(*))
            AS BIGINT) AS accuracy_ppm
FROM test t JOIN model m ON m.prev = t.prev
GROUP BY t.prev, m.predicted_next
"""


@query("evt_next_event_eval", oracle=_NXT_SQL, tags=("events", "eval"))
def evt_next_event_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-time evaluation of a next-event model: the per-type
    majority-transition predictor is fit on the first half of the
    calendar and scored on the second — leakage-free by construction
    (train pairs must COMPLETE before the split; test pairs start
    after it). Reports per-type test accuracy, the baseline any
    sequence model must beat before it earns a deployment.

    Scale shape: one user-partitioned lead window builds transitions;
    train counts and the argmax are transition-matrix-sized (types²);
    the model broadcasts onto the test stream."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_NXT_SQL)


# ---------------------------------------------------------------------------
# alert throttling: suppress repeats inside a cooldown window
# ---------------------------------------------------------------------------

_THROTTLE_COOLDOWN_SEC = 6 * 3600

_THROTTLE_SQL = f"""
WITH alerts AS (
  SELECT user_id, ts, event_id, CAST({{EPOCH}} AS BIGINT) AS sec
  FROM events WHERE event_type = 'error'
),
spaced AS (
  SELECT user_id, ts, event_id, sec,
         LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
           AS prev_sec
  FROM alerts
),
islands AS (
  SELECT user_id, ts, event_id, sec,
         CAST(SUM(CASE WHEN prev_sec IS NULL
                       OR sec - prev_sec > {_THROTTLE_COOLDOWN_SEC}
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY sec, event_id)
              AS BIGINT) AS burst_id
  FROM spaced
),
ranked AS (
  SELECT user_id, ts, event_id, burst_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, burst_id
                            ORDER BY sec, event_id) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY user_id, burst_id) AS BIGINT)
           AS suppressed_count
  FROM islands
)
SELECT user_id, ts AS alert_ts, event_id, burst_id,
       suppressed_count - 1 AS n_suppressed
FROM ranked
WHERE rn = 1
"""


@query(
    "evt_alert_throttle",
    oracle=_THROTTLE_SQL.format(EPOCH="FLOOR(EPOCH(ts))"),
    tags=("events", "quality"),
)
def evt_alert_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert throttling with gap-based cooldown: the FIRST error per
    user opens a burst; subsequent errors within 6 h of their
    predecessor chain into the same burst and are suppressed, and the
    emitted alert carries how many it swallowed — the dedup rule that
    keeps a flapping job from paging 400 times. Chained (gap-based)
    cooldown, not fixed-window: a burst stays silenced for as long as
    errors keep arriving, the behavior on-call actually wants.

    Scale shape: two user-partitioned windows (lag + running sum) and
    a per-burst rank — one user-keyed shuffle serves all three."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_THROTTLE_SQL.format(EPOCH="unix_timestamp(ts)"))


# ---------------------------------------------------------------------------
# behavior-profile segmentation via event-type bitmasks
# ---------------------------------------------------------------------------

# Each user's event-type SET packs into one integer bitmask (bit per
# type, alphabetical); equal masks = identical behavioral profile.
# Set-valued segmentation as pure integer aggregation — no arrays, no
# strings in the shuffle.
_BITMASK_SQL = """
WITH bits AS (
  SELECT user_id,
         CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
              WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
              WHEN 'view' THEN 16 ELSE 32 END AS bit
  FROM events
  WHERE ts < TIMESTAMP '2024-01-04 00:00:00'
),
profiles AS (
  SELECT user_id, CAST(BIT_OR(bit) AS BIGINT) AS profile_mask
  FROM bits GROUP BY user_id
)
SELECT profile_mask,
       CONCAT(CASE WHEN profile_mask % 2 = 1 THEN 'c' ELSE '-' END,
              CASE WHEN (profile_mask / 2) % 2 >= 1 THEN 'e' ELSE '-' END,
              CASE WHEN (profile_mask / 4) % 2 >= 1 THEN 'p' ELSE '-' END,
              CASE WHEN (profile_mask / 8) % 2 >= 1 THEN 's' ELSE '-' END,
              CASE WHEN (profile_mask / 16) % 2 >= 1 THEN 'v' ELSE '-' END)
         AS profile_label,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM profiles
GROUP BY profile_mask
"""


@query("agg_behavior_bitmask", oracle=_BITMASK_SQL, tags=("agg", "events"))
def agg_behavior_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral segmentation by event-type SET over the first-three-
    days onboarding window (a full month saturates every profile to
    all-types — the window is where profiles actually differ): each
    user's distinct event types pack into one integer bitmask (BIT_OR
    aggregate), and equal masks are identical profiles — set-valued
    grouping without arrays or strings ever entering the shuffle,
    plus a decoded 'cepsv' label for humans. The segment counts feed
    audience sizing and the bitmask itself is the O(1)-width join key
    for profile-targeted queries.

    Scale shape: two integer hash aggregates (user, then mask) — both
    map-side combinable."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_BITMASK_SQL)


# ---------------------------------------------------------------------------
# bot detection: rate, coverage, and regularity heuristics per user
# ---------------------------------------------------------------------------

# Three classic behavioral signals, each exact-integer derived:
# superhuman burst rate (events < 2 s apart), around-the-clock
# coverage (distinct active hours-of-day), and inhumanly regular
# timing (coefficient of variation of inter-arrival gaps below 10%).
# Humans trip none; scrapers and replayers trip one or more.
# The Σgap² lane runs in the {WIDE} pair (DECIMAL(38,0)↔HUGEINT): a
# year-scale gap (~3e7 s) squares to ~1e15, so a bursty user with ~1e4
# gaps already puts Σgap² within one decade of int64 (round-11 audit).
_BOT_SQL = """
WITH gaps AS (
  SELECT user_id,
         CAST({EPOCH} AS BIGINT)
           - CAST(LAG({EPOCH}) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT)
           AS gap_sec,
         CAST({HOUR} AS BIGINT) AS hour_of_day
  FROM events
),
per_user AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(CASE WHEN gap_sec < 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_burst_gaps,
         CAST(COUNT(DISTINCT hour_of_day) AS BIGINT) AS active_hours_of_day,
         CAST(SUM(gap_sec) AS BIGINT) AS s,
         CAST(SUM(CAST(gap_sec AS {WIDE}) * gap_sec) AS {WIDE}) AS q
  FROM gaps
  WHERE gap_sec IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, n_gaps, n_burst_gaps, active_hours_of_day,
       CAST(FLOOR(
         SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_gaps)
              / (n_gaps - 1))
         / (CAST(s AS DOUBLE) / n_gaps) * 1000) AS BIGINT)
         AS gap_cv_milli,
       n_burst_gaps * 10 > n_gaps AS rate_flag,
       active_hours_of_day >= 22 AS coverage_flag,
       SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_gaps)
            / (n_gaps - 1))
         / (CAST(s AS DOUBLE) / n_gaps) < 0.1 AS regularity_flag
FROM per_user
WHERE n_gaps >= 2
"""


@query(
    "evt_bot_detection",
    oracle=_BOT_SQL.format(
        EPOCH="FLOOR(EPOCH(ts))", HOUR="hour(ts)", WIDE="HUGEINT"
    ),
    tags=("events", "quality"),
)
def evt_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot-detection heuristics per user: burst rate (>10% of gaps
    under 2 s), around-the-clock coverage (≥22 distinct hours of day),
    and inhuman regularity (inter-arrival CV < 10%) — the three
    behavioral signals abuse teams combine before any model. Gap
    moments are exact integer seconds; the CV is one double
    expression.

    Scale shape: one user-partitioned lag window + one user-keyed
    moment aggregate — a single shuffle."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        _BOT_SQL.format(
            EPOCH="unix_timestamp(ts)", HOUR="hour(ts)", WIDE="DECIMAL(38,0)"
        )
    )


# ---------------------------------------------------------------------------
# activity heatmap: day-of-week x hour-of-day matrix
# ---------------------------------------------------------------------------

_HEATMAP_SQL = """
SELECT CAST({DOW} AS BIGINT) AS dow,
       CAST(SUM(CASE WHEN hour(ts) < 6 THEN 1 ELSE 0 END) AS BIGINT)
         AS night_00_06,
       CAST(SUM(CASE WHEN hour(ts) >= 6 AND hour(ts) < 12 THEN 1 ELSE 0 END)
            AS BIGINT) AS morning_06_12,
       CAST(SUM(CASE WHEN hour(ts) >= 12 AND hour(ts) < 18 THEN 1 ELSE 0 END)
            AS BIGINT) AS afternoon_12_18,
       CAST(SUM(CASE WHEN hour(ts) >= 18 THEN 1 ELSE 0 END) AS BIGINT)
         AS evening_18_24,
       CAST(COUNT(*) AS BIGINT) AS total,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users
FROM events
GROUP BY 1
"""


@query(
    "evt_activity_heatmap",
    # DuckDB numbers Sunday 0, Spark numbers Sunday 1 — shift the
    # oracle to Spark's convention
    oracle=_HEATMAP_SQL.format(DOW="dayofweek(ts) + 1"),
    tags=("events", "agg"),
)
def evt_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × daypart activity matrix (the ops-dashboard
    heatmap): one pivoted row per weekday with night/morning/
    afternoon/evening counts plus totals and unique users — the
    when-are-users-here view that staffs support rotations and
    schedules maintenance windows. Day-of-week numbering is pinned to
    Spark's 1=Sunday convention (DuckDB's 0-based dayofweek is shifted
    in the oracle).

    Scale shape: one conditional hash aggregate — 7 output rows at
    any scale."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_HEATMAP_SQL.format(DOW="dayofweek(ts)"))


# ---------------------------------------------------------------------------
# watermark choice: the lateness CDF that sizes a stream's delay budget
# ---------------------------------------------------------------------------
#
# Choosing a watermark is a measurement, not a guess: replay the log,
# compute every event's lateness against the event-time high-water-mark
# in ARRIVAL order, and read the drop rate each candidate delay would
# have produced. The staged test events arrive in event-time order
# (lateness 0 — nothing to measure), so arrival disorder is SIMULATED
# with a deterministic bounded transit jitter: arrival = ts +
# pmod(xxhash64(event_id), 3600) seconds — the shuffled-log shape a
# multi-partition kafka topic actually delivers (md5-derived so both
# engines compute the identical jitter). The high-water-mark
# runs PER USER (the keyed-stream state shape, and a per-user window
# distributes; a single global cummax would serialize — at scale the
# global watermark is the min over per-partition marks, same
# decomposition).

_WM_CANDIDATES = (0, 900, 1800, 3600, 7200)  # seconds

_WM_ORACLE = f"""
WITH arr AS (
  SELECT user_id, event_id, ts,
         ts + to_seconds(
           CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 4))
                AS INTEGER) % 3600) AS arrival
  FROM events
),
late AS (
  SELECT user_id,
         CAST(epoch(MAX(ts) OVER (PARTITION BY user_id
                                  ORDER BY arrival, event_id
                                  ROWS UNBOUNDED PRECEDING) - ts)
              AS BIGINT) AS late_s
  FROM arr
),
wm AS (SELECT unnest({list(_WM_CANDIDATES)!r}) AS wm_s)
SELECT CAST(wm.wm_s AS BIGINT) AS watermark_s,
       CAST(COUNT(*) FILTER (late.late_s > wm.wm_s) AS BIGINT) AS n_dropped,
       CAST(COUNT(*) FILTER (late.late_s > wm.wm_s) * 1000000
            // COUNT(*) AS BIGINT) AS drop_ppm
FROM late CROSS JOIN wm
GROUP BY wm.wm_s
"""


@query("evt_watermark_choice", oracle=_WM_ORACLE, tags=("events", "streaming"))
def evt_watermark_choice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark sizing from measured lateness: per user (the keyed
    stream shape), each event's lateness = event-time high-water-mark
    at its (jitter-simulated) arrival minus its own timestamp; the
    output is the drop rate each candidate watermark {0, 15m, 30m, 1h,
    2h} would have caused. Read: pick the smallest delay whose
    drop_ppm clears the SLO — the exact methodology behind Flink/Spark
    lateness dashboards, as a batch replay.

    Scale shape: one narrow map (jitter), one per-user running-max
    window (distributes on the user key, state is one timestamp per
    user), and a 5-row broadcast cross join for the threshold table —
    the log is scanned once."""
    ev = load_table(spark, sf_dir, "events")
    arr = ev.select(
        "user_id",
        "event_id",
        "ts",
        (
            F.col("ts")
            + F.make_interval(
                secs=F.expr(
                    "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 4),"
                    " 16, 10) AS BIGINT) % 3600"
                )
            )
        ).alias("arrival"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrival", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = arr.select(
        "user_id",
        (F.unix_timestamp(F.max("ts").over(w)) - F.unix_timestamp("ts"))
        .cast("long")
        .alias("late_s"),
    )
    wm = spark.createDataFrame(
        [(s,) for s in _WM_CANDIDATES], "wm_s long"
    )
    return (
        late.crossJoin(F.broadcast(wm))
        .groupBy(F.col("wm_s").alias("watermark_s"))
        .agg(
            F.sum((F.col("late_s") > F.col("wm_s")).cast("long"))
            .cast("long")
            .alias("n_dropped"),
            F.expr(
                "CAST(SUM(CASE WHEN late_s > wm_s THEN 1 ELSE 0 END) * 1000000"
                " DIV COUNT(*) AS BIGINT)"
            ).alias("drop_ppm"),
        )
    )
