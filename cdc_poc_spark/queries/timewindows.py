"""Event-time window aggregations over the events stream table
(SURVEY §2.B streaming rows: tumbling/sliding/session windows).

Spark's ``window()`` / ``session_window()`` grouping works identically in
batch and Structured Streaming — the SAME functions here run under
``readStream`` with a watermark (see streaming/ and tests/test_streaming.py).
Registering them as batch queries gives the windows a DuckDB oracle
(bucket arithmetic on epoch micros / gaps-and-islands for sessions),
which streaming-only execution could not have.

Scale notes: window bucketing is a map-side expression (no shuffle beyond
the final groupBy); sliding windows multiply rows by windows-per-event
(here exactly 2) before the shuffle — the classic size/slide tradeoff.
Event-time comes from `ts` stored as epoch-nanos (SURVEY §1.2); all
arithmetic is integer micros, never float seconds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import VAL, dec, events_with_time
from . import register

_5M_US = 5 * 60 * 1_000_000
_10M_US = 10 * 60 * 1_000_000
_30M_US = 30 * 60 * 1_000_000


def _fmt_start(col):
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


# ---------------------------------------------------------------------------
# Tumbling window: 5-minute buckets per event_type.
# ---------------------------------------------------------------------------

_TUMBLING_ORACLE = f"""
SELECT
  strftime(make_timestamp((epoch_us(ts) // {_5M_US}) * {_5M_US}), '%Y-%m-%d %H:%M:%S') AS win_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("tw_tumbling_5min_by_type", oracle=_TUMBLING_ORACLE, tags=("window", "streaming", "agg"))
def tw_tumbling_5min_by_type(spark, sf_dir):
    """`window(etime, '5 minutes')` — epoch-aligned tumbling buckets, so
    the bucket start equals floor(ts_us / 5min) * 5min exactly."""
    ev = events_with_time(spark, sf_dir)
    return (
        ev.groupBy(F.window("etime", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", VAL)).cast("double").alias("total_value"),
        )
        .select(
            _fmt_start("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Sliding window: 10-minute windows every 5 minutes (each event lands in
# exactly two windows).
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = f"""
SELECT
  strftime(make_timestamp((epoch_us(ts) // {_5M_US} - k.k) * {_5M_US}), '%Y-%m-%d %H:%M:%S') AS win_start,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users
FROM events
CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1) k
GROUP BY 1
"""


@register("tw_sliding_10min_step5", oracle=_SLIDING_ORACLE, tags=("window", "streaming", "agg"))
def tw_sliding_10min_step5(spark, sf_dir):
    """`window(etime, '10 minutes', '5 minutes')` — the oracle replicates
    Spark's window assignment: an event at t belongs to the windows
    starting at floor(t/5m)*5m and that minus 5m."""
    ev = events_with_time(spark, sf_dir)
    return (
        ev.groupBy(F.window("etime", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(_fmt_start("w.start").alias("win_start"), "n_events", "n_users")
    )


# ---------------------------------------------------------------------------
# Session window: per-user sessions closed by a 30-minute silence gap.
# ---------------------------------------------------------------------------

_SESSION_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) > {_30M_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sessioned AS (
  SELECT user_id, ts_us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM ordered
)
SELECT user_id,
       strftime(make_timestamp(MIN(ts_us)), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(make_timestamp(MAX(ts_us)), '%Y-%m-%d %H:%M:%S') AS session_last,
       COUNT(*) AS n_events
FROM sessioned
GROUP BY user_id, session_no
"""


@register("tw_session_30min_by_user", oracle=_SESSION_ORACLE, tags=("window", "streaming", "agg"))
def tw_session_30min_by_user(spark, sf_dir):
    """`session_window(etime, '30 minutes')` per user. The oracle is the
    classic gaps-and-islands rewrite (lag -> new-session flag -> running
    sum), which is also what the operator costs at scale: one shuffle by
    user, one ordered pass. session_last = last EVENT time (window.end is
    last event + gap, so we aggregate MAX(ts) instead)."""
    ev = events_with_time(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("etime", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("etime").alias("start_t"),
            F.max("etime").alias("last_t"),
        )
        .select(
            "user_id",
            _fmt_start("start_t").alias("session_start"),
            _fmt_start("last_t").alias("session_last"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Interval (range) join: view -> purchase attribution within 1 hour.
# Same function runs as a watermarked stream-stream join in
# streaming/windows.py (test_stream_stream_join_matches_batch).
# ---------------------------------------------------------------------------

_1H_US = 60 * 60 * 1_000_000

_INTERVAL_JOIN_ORACLE = f"""
SELECT v.user_id,
       v.event_id AS l_event_id,
       p.event_id AS r_event_id
FROM (SELECT user_id, event_id, epoch_us(ts) AS t FROM events WHERE event_type = 'view') v
JOIN (SELECT user_id, event_id, epoch_us(ts) AS t FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND v.t <= p.t AND p.t <= v.t + {_1H_US}
"""


@register("tw_interval_join_attribution", oracle=_INTERVAL_JOIN_ORACLE, tags=("join", "range", "streaming"))
def tw_interval_join_attribution(spark, sf_dir):
    """Range/interval equi+band join: equi on user_id (the shuffle key),
    band predicate on event time evaluated post-join — the attribution
    shape; streaming twin evicts state by watermark."""
    from ..streaming.windows import stream_stream_join

    ev = events_with_time(spark, sf_dir)
    return stream_stream_join(ev, ev).select("user_id", "l_event_id", "r_event_id")


_TIME_ROLLUP_ORACLE = """
WITH e AS (
  SELECT CAST(date_part('year', ts) AS BIGINT) AS y,
         CAST(date_part('month', ts) AS BIGINT) AS m,
         CAST(date_part('day', ts) AS BIGINT) AS d,
         value
  FROM events
)
SELECT y, m, d, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM e GROUP BY ROLLUP(y, m, d)
"""


@register("tw_time_rollup_hierarchy", oracle=_TIME_ROLLUP_ORACLE, tags=("window", "agg", "rollup"))
def tw_time_rollup_hierarchy(spark, sf_dir):
    """Hypertable-style continuous-aggregate hierarchy: one ROLLUP pass
    produces day, month, year, and grand-total rollups of the event
    stream — the materialization a time-series store keeps per chunk.
    Physically a single scan + one shuffle; rollup levels are expanded
    map-side (Expand) so each level still gets partial aggregation."""
    ev = events_with_time(spark, sf_dir)
    d = ev.select(
        F.year("etime").cast("long").alias("y"),
        F.month("etime").cast("long").alias("m"),
        F.dayofmonth("etime").cast("long").alias("d"),
        "value",
    )
    return d.rollup("y", "m", "d").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", VAL)).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Gap-fill + linear interpolation over an hourly series per event_type.
# ---------------------------------------------------------------------------

_HR_US = 3_600 * 1_000_000

_GAP_FILL_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // {_HR_US} AS hr,
         (2000 * SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) + COUNT(*))
           // (2 * COUNT(*)) AS avg_e5
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi FROM hourly GROUP BY 1
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi)) AS hr FROM bounds
),
j AS (
  SELECT s.event_type, s.hr, h.avg_e5,
         h.avg_e5 IS NOT NULL AS observed
  FROM spine s LEFT JOIN hourly h ON s.event_type = h.event_type AND s.hr = h.hr
),
w AS (
  SELECT event_type, hr, avg_e5, observed,
         last_value(avg_e5 IGNORE NULLS) OVER
           (PARTITION BY event_type ORDER BY hr
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_e5,
         last_value(CASE WHEN observed THEN hr END IGNORE NULLS) OVER
           (PARTITION BY event_type ORDER BY hr
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_hr,
         first_value(avg_e5 IGNORE NULLS) OVER
           (PARTITION BY event_type ORDER BY hr
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_e5,
         first_value(CASE WHEN observed THEN hr END IGNORE NULLS) OVER
           (PARTITION BY event_type ORDER BY hr
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_hr
  FROM j
)
SELECT event_type, hr, observed,
       CAST(CASE
         WHEN observed THEN avg_e5
         WHEN prev_e5 IS NOT NULL AND next_e5 IS NOT NULL THEN
           (2 * (prev_e5 * (next_hr - hr) + next_e5 * (hr - prev_hr))
              + (next_hr - prev_hr)) // (2 * (next_hr - prev_hr))
         WHEN prev_e5 IS NOT NULL THEN prev_e5
         ELSE next_e5 END AS BIGINT) AS value_filled_e5
FROM w
"""


@register("tw_gap_fill_interpolate", oracle=_GAP_FILL_ORACLE, tags=("window", "timeseries"))
def tw_gap_fill_interpolate(spark, sf_dir):
    """Time-series gap-fill with LINEAR INTERPOLATION (the hypertable
    `interpolate()`/`locf` pair): per event_type, densify the hourly
    avg-value series over each series\' own [min, max] hour spine, then
    fill missing hours by interpolating between the nearest observed
    neighbors (edges fall back to nearest-observed).

    Everything is keyed by the series id: the spine explode, the left
    join, and the two IGNORE-NULLS window passes all partition by
    event_type — no global window, so 100k series on 100 TB
    parallelize; per-series window state is one row.

    Numerics: the whole pipeline is e-5 FIXED-POINT INTEGER math
    (cents -> round-half-up scaled average -> barycentric interpolation
    with non-negative numerators, so floor==truncate in both engines).
    Cross-engine double rounding is NOT reproducible at rounding
    boundaries — DuckDB rounds x*1e5 while Spark rounds the decimal
    expansion of x, and they disagree on ties (observed one flip at
    sf0.001) — so the contract output is the exact scaled integer."""
    from pyspark.sql import Window as W

    ev = events_with_time(spark, sf_dir)
    cents = dec("value", VAL) * 100
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"ts_us DIV {_HR_US}").alias("hr"),
            cents.cast("long").alias("cents"),
        )
        .groupBy("event_type", "hr")
        .agg(F.sum("cents").alias("sum_c"), F.count(F.lit(1)).alias("n"))
        # BIGINT DIV keeps the whole pipeline in exact integer math; double
        # division would diverge from the oracle's `//` once the numerator
        # approaches 2^53.
        .select(
            "event_type", "hr",
            F.expr("(2000 * sum_c + n) DIV (2 * n)").alias("avg_e5"),
        )
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select("event_type", F.explode(F.expr("sequence(lo, hi)")).alias("hr"))
    )
    j = spine.join(hourly, ["event_type", "hr"], "left").select(
        "event_type", "hr", "avg_e5", F.col("avg_e5").isNotNull().alias("observed")
    )
    w_prev = W.partitionBy("event_type").orderBy("hr").rowsBetween(W.unboundedPreceding, 0)
    w_next = W.partitionBy("event_type").orderBy("hr").rowsBetween(0, W.unboundedFollowing)
    obs_hr = F.when(F.col("observed"), F.col("hr"))
    filled = (
        j.withColumn("prev_e5", F.last("avg_e5", ignorenulls=True).over(w_prev))
        .withColumn("prev_hr", F.last(obs_hr, ignorenulls=True).over(w_prev))
        .withColumn("next_e5", F.first("avg_e5", ignorenulls=True).over(w_next))
        .withColumn("next_hr", F.first(obs_hr, ignorenulls=True).over(w_next))
    )
    interp = (
        F.when(F.col("observed"), F.col("avg_e5"))
        .when(
            F.col("prev_e5").isNotNull() & F.col("next_e5").isNotNull(),
            F.expr("(2 * (prev_e5 * (next_hr - hr) + next_e5 * (hr - prev_hr))"
                   " + (next_hr - prev_hr)) DIV (2 * (next_hr - prev_hr))"),
        )
        .when(F.col("prev_e5").isNotNull(), F.col("prev_e5"))
        .otherwise(F.col("next_e5"))
    )
    return filled.select(
        "event_type", "hr", "observed",
        interp.cast("long").alias("value_filled_e5"),
    )


# ---------------------------------------------------------------------------
# M4 downsampling: min/max/first/last per pixel bucket (round 5)
# ---------------------------------------------------------------------------

_M4_US = 15 * 60 * 1_000_000  # one "pixel" = 15 minutes

_M4_ORACLE = f"""
WITH b AS (
  SELECT event_type, event_id, CAST(value AS DOUBLE) AS value,
         epoch_us(ts) AS ts_us,
         (epoch_us(ts) // {_M4_US}) * {_M4_US} AS bucket_us,
         row_number() OVER (PARTITION BY event_type, epoch_us(ts) // {_M4_US}
                            ORDER BY epoch_us(ts), event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, epoch_us(ts) // {_M4_US}
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, bucket_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(value) AS v_min, MAX(value) AS v_max,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS v_first,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS v_last
FROM b GROUP BY event_type, bucket_us
"""


@register("tw_m4_downsample", oracle=_M4_ORACLE, tags=("window", "timeseries", "agg"))
def tw_m4_downsample(spark, sf_dir):
    """M4 time-series downsampling (Jugel et al., VLDB'14: the
    min/max/first/last-per-pixel aggregation that makes a line chart of
    N points render pixel-identically from 4 points per pixel column):
    15-minute pixels per series (event_type). The dashboard-backend
    query of every metrics store, and the visual-fidelity-preserving
    reduction a 100 TB telemetry table needs before a human looks at
    it. Plan: ONE map-side-combinable groupBy — first/last are
    min_by/max_by on the (ts, event_id) total order, no window pass,
    no per-bucket sort; values pass through un-arithmeticked so the
    oracle match is bit-exact."""
    ev = events_with_time(spark, sf_dir)
    key = F.struct(F.col("ts_us"), F.col("event_id"))
    return (
        ev.withColumn(
            "bucket_us", (F.col("ts_us") - F.pmod("ts_us", F.lit(_M4_US)))
        )
        .groupBy("event_type", "bucket_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.min_by("value", key).alias("v_first"),
            F.max_by("value", key).alias("v_last"),
        )
    )


# ---------------------------------------------------------------------------
# Per-series z-score anomaly detection over hourly buckets (round 5)
# ---------------------------------------------------------------------------

_1H_US = 3600 * 1_000_000

_ZSCORE_ORACLE = f"""
WITH b AS (
  SELECT event_type, (epoch_us(ts) // {_1H_US}) * {_1H_US} AS bucket_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_buckets,
         CAST(SUM(n_events) AS DECIMAL(38,0)) AS s1,
         CAST(SUM(n_events * n_events) AS DECIMAL(38,0)) AS s2
  FROM b GROUP BY event_type
)
SELECT b.event_type, b.bucket_us, b.n_events,
       round((CAST(b.n_events AS DOUBLE) - CAST(s.s1 AS DOUBLE) / s.n_buckets)
             / sqrt(CAST(s.s2 AS DOUBLE) / s.n_buckets
                    - (CAST(s.s1 AS DOUBLE) / s.n_buckets)
                      * (CAST(s.s1 AS DOUBLE) / s.n_buckets)), 4) AS zscore
FROM b JOIN s ON b.event_type = s.event_type
WHERE CAST(s.s2 AS DOUBLE) / s.n_buckets
      - (CAST(s.s1 AS DOUBLE) / s.n_buckets)
        * (CAST(s.s1 AS DOUBLE) / s.n_buckets) > 0
  AND abs((CAST(b.n_events AS DOUBLE) - CAST(s.s1 AS DOUBLE) / s.n_buckets)
          / sqrt(CAST(s.s2 AS DOUBLE) / s.n_buckets
                 - (CAST(s.s1 AS DOUBLE) / s.n_buckets)
                   * (CAST(s.s1 AS DOUBLE) / s.n_buckets))) >= 2.0
"""


@register("tw_anomaly_zscore", oracle=_ZSCORE_ORACLE, tags=("window", "timeseries", "anomaly"))
def tw_anomaly_zscore(spark, sf_dir):
    """Volume-anomaly detection: hourly event counts per series, flag
    buckets whose count sits >= 2 sigma from the series mean — the
    alerting query of every ingest monitor. Exactness discipline: the
    per-series moments are EXACT integer sums (DECIMAL(38) s1/s2, no
    float accumulation across rows), so mean/variance derive from
    identical integers in both engines and the z-score doubles match
    bit-for-bit. Plan: two map-side-combinable aggs (bucket count,
    series moments) + one broadcast join back — series cardinality is
    tiny, bucket relation is |series x hours|. The flag derivation is
    operators/temporal.py:anomaly_zscore_flags — shared verbatim with
    the streaming maintainer (streaming/windows.py:
    streaming_anomaly_zscore), whose drained output is asserted EQUAL
    to this query in tests/test_streaming.py."""
    from ..operators.temporal import anomaly_zscore_flags

    ev = events_with_time(spark, sf_dir)
    b = (
        ev.withColumn("bucket_us", (F.col("ts_us") - F.pmod("ts_us", F.lit(_1H_US))))
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return anomaly_zscore_flags(b, sigma=2.0)
