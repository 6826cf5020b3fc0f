"""Time-series / behavioral analytics over the events stream table:
OHLC bar aggregation, Markov event-transition matrix, weekly retention
cohorts, and equi-depth decile statistics.

Reference parity: the reference (thanminh24/CDC_POC) ships no analytics
at all (SURVEY.md §2) — these extend the engine's event-time surface per
the north-star brief, alongside queries/timewindows.py.

Cross-engine exactness: all event-time arithmetic is integer micros on
the epoch-nanos long (never float seconds); money/value columns go
through exact cents BIGINTs before any aggregation (tables.py
conventions), so results are bit-identical across engines and shuffle
orders.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..tables import VAL, dec, load_table
from . import register

_15M_US = 15 * 60 * 1_000_000
_DAY_US = 86_400 * 1_000_000

# ---------------------------------------------------------------------------
# OHLC bars: open/high/low/close per 15-minute bucket per event_type.
# ---------------------------------------------------------------------------

_OHLC_ORACLE = f"""
WITH e AS (
  SELECT event_type,
         (epoch_us(ts) // {_15M_US}) * {_15M_US} AS win_us,
         epoch_us(ts) AS ts_us, event_id,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events
), r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, win_us
                            ORDER BY ts_us, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, win_us
                            ORDER BY ts_us DESC, event_id DESC) AS rn_d
  FROM e
)
SELECT strftime(make_timestamp(win_us), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       CAST(MAX(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
       CAST(MAX(cents) AS BIGINT) AS high_cents,
       CAST(MIN(cents) AS BIGINT) AS low_cents,
       CAST(MAX(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
       CAST(COUNT(*) AS BIGINT) AS volume,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM r
GROUP BY win_us, event_type
"""


@register("tw_ohlc_bars", oracle=_OHLC_ORACLE, tags=("timeseries", "window"))
def tw_ohlc_bars(spark, sf_dir):
    """OHLC candlestick bars (open/high/low/close/volume) per 15-minute
    bucket per event_type — the standard financial/metrics downsample
    (complement of tw_m4_downsample's min/max envelope).

    Scale shape: ONE hash aggregation. open/close use `min_by`/`max_by`
    keyed on the (ts_us, event_id) struct — typed imperative aggregates
    with map-side partial merge, so the plan is scan → partial agg →
    one shuffle on (type, bucket) → final agg, with NO window sort and
    no per-bucket row_number pass (the oracle's two-window formulation
    is the engine-neutral spelling of the same pick; event_id uniqueness
    makes the tie-break total, so both agree exactly). At 100 TB this is
    the same shape as any keyed rollup: bucket count bounds the output,
    AQE coalesces the post-shuffle partitions."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.expr(f"(ts DIV 1000 DIV {_15M_US}) * {_15M_US}").alias("win_us"),
        F.expr("ts DIV 1000").alias("ts_us"),
        "event_id",
        (F.col("value").cast(VAL) * 100).cast("long").alias("cents"),
    )
    key = F.struct(F.col("ts_us"), F.col("event_id"))
    return (
        e.groupBy("win_us", "event_type")
        .agg(
            F.min_by("cents", key).alias("open_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max_by("cents", key).alias("close_cents"),
            F.count(F.lit(1)).alias("volume"),
            F.sum("cents").alias("total_cents"),
        )
        .select(
            F.date_format(F.timestamp_micros(F.col("win_us")), "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "event_type",
            "open_cents",
            "high_cents",
            "low_cents",
            "close_cents",
            "volume",
            "total_cents",
        )
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences.
# ---------------------------------------------------------------------------

_TRANSITIONS_ORACLE = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events
), t AS (
  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM s WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n_transitions,
       round(CAST(n_transitions AS DOUBLE)
             / SUM(n_transitions) OVER (PARTITION BY prev_type), 6) AS p_transition
FROM t
"""


@register("win_event_transitions", oracle=_TRANSITIONS_ORACLE, tags=("timeseries", "window"))
def win_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: for each ordered pair (prev_type → next_type), the count
    and the conditional probability P(next | prev) — the session-path
    model behind funnel diagnostics and next-event prediction baselines.

    Scale shape: one shuffle on user_id for the lag window (per-user
    sequences are short — no skew), then a keyed count whose output is
    |event_types|² rows; the per-prev normalization runs on that tiny
    aggregate. The probability is ONE double division on exact BIGINT
    counts, performed identically by both engines (no float
    accumulation)."""
    ev = load_table(spark, sf_dir, "events")
    seq = W.partitionBy("user_id").orderBy(F.expr("ts DIV 1000"), F.col("event_id"))
    t = (
        ev.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(seq).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    per_prev = W.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double") / F.sum("n_transitions").over(per_prev),
            6,
        ).alias("p_transition"),
    )


# ---------------------------------------------------------------------------
# Weekly retention cohorts.
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = f"""
WITH a AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} // 7 AS week FROM events
), w AS (
  SELECT DISTINCT user_id, week FROM a
), c AS (
  SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY user_id
)
SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
       CAST(w.week - c.cohort_week AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active_users
FROM w JOIN c USING (user_id)
GROUP BY c.cohort_week, w.week - c.cohort_week
"""


@register("tw_retention_cohorts", oracle=_RETENTION_ORACLE, tags=("timeseries", "window"))
def tw_retention_cohorts(spark, sf_dir):
    """Weekly retention triangle: users are cohorted by their first
    active week (integer weeks since epoch — exact DIV arithmetic on
    the micros long), and each (cohort_week, week_offset) cell counts
    the cohort's users still active that many weeks later — the
    standard product-analytics retention table.

    Scale shape: ONE shuffle on user_id — the per-user active-week SET
    is a collect_set aggregate (map-side partial dedup), and both the
    cohort (array_min) and the per-week explode are then map-side array
    expressions; no second exchange, no window, no join back. The
    per-user set is bounded by the corpus duration in weeks, not by
    event count. The final rollup's output is bounded by cohorts ×
    offsets, not by users."""
    ev = load_table(spark, sf_dir, "events")
    weeks = (
        ev.select("user_id", F.expr(f"ts DIV 1000 DIV {_DAY_US} DIV 7").alias("week"))
        .groupBy("user_id")
        .agg(F.collect_set("week").alias("weeks"))
        .select(
            F.array_min("weeks").alias("cohort_week"),
            F.explode("weeks").alias("week"),
        )
    )
    return weeks.groupBy(
        "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
    ).agg(F.count(F.lit(1)).alias("n_active_users"))


# ---------------------------------------------------------------------------
# Equi-depth decile statistics over order totals.
# ---------------------------------------------------------------------------

_DECILE_ORACLE = """
WITH c AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT) AS cents
  FROM orders
), r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_orderkey) AS rnk,
         COUNT(*) OVER () AS n
  FROM c
)
SELECT CAST(1 + ((rnk - 1) * 10) // n AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(cents) AS BIGINT) AS min_cents,
       CAST(MAX(cents) AS BIGINT) AS max_cents,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM r
GROUP BY 1
"""


@register("agg_decile_stats", oracle=_DECILE_ORACLE, tags=("agg", "stats"))
def agg_decile_stats(spark, sf_dir):
    """Equi-depth decile profile of order totals: rows are ranked by
    (cents, orderkey) — a total order, so bucketing is deterministic —
    and decile d gets rows with 1 + (rank-1)*10 DIV n = d (the
    equi-probable formula spelled identically in both engines rather
    than each engine's ntile(), whose remainder distribution is
    implementation-defined in spirit if not in standard).

    Scale shape: the global rank comes from operators.scale.global_index
    (range-repartition + per-partition offsets — two light jobs), NOT
    from `row_number() OVER (ORDER BY ...)`, which would serialize the
    table through one task. n rides a broadcast single-row relation (no
    separate driver count job). The final stats are a 10-row keyed
    rollup of exact BIGINTs."""
    from ..operators.scale import global_index

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(15,2)") * 100).cast("long").alias("cents"),
    )
    ranked = global_index(orders, idx_col="rnk0", order_cols=["cents", "o_orderkey"])
    total = orders.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("decile", F.expr("1 + (rnk0 * 10) DIV n"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").alias("sum_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonal (day-of-week × hour) baseline and top deviating buckets.
# ---------------------------------------------------------------------------

_HOUR_US = 3600 * 1_000_000

_SEASONAL_ORACLE = f"""
WITH b AS (
  SELECT event_type,
         epoch_us(ts) // {_DAY_US} AS day_idx,
         (epoch_us(ts) % {_DAY_US}) // {_HOUR_US} AS hour,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2, 3
), s AS (
  SELECT event_type, (day_idx + 4) % 7 AS dow, hour,
         CAST(SUM(n_events) AS BIGINT) AS slot_total,
         CAST(COUNT(*) AS BIGINT) AS n_slot_buckets
  FROM b GROUP BY 1, 2, 3
)
SELECT b.event_type, CAST(b.day_idx AS BIGINT) AS day_idx,
       CAST(b.hour AS BIGINT) AS hour, b.n_events,
       s.slot_total, s.n_slot_buckets,
       round(CAST(b.n_events AS DOUBLE) * s.n_slot_buckets / s.slot_total, 6)
         AS dev_ratio
FROM b JOIN s ON s.event_type = b.event_type
             AND s.dow = (b.day_idx + 4) % 7 AND s.hour = b.hour
ORDER BY dev_ratio DESC, b.event_type, b.day_idx, b.hour
LIMIT 20
"""


@register("tw_seasonal_baseline", oracle=_SEASONAL_ORACLE, tags=("timeseries", "anomaly"))
def tw_seasonal_baseline(spark, sf_dir):
    """Seasonality-aware deviation: each (series, day, hour) bucket is
    compared to its OWN day-of-week × hour-of-day slot average — the
    profile that catches "quiet Tuesday 3am is suddenly busy" where a
    global z-score (tw_anomaly_zscore) averages the diurnal cycle away.
    Top-20 buckets by deviation ratio.

    Exactness: day/hour/dow all derive from integer DIV/mod on the
    micros long ((day_idx + 4) % 7 — epoch day 0 was a Thursday — so
    neither engine's locale-dependent dow function is consulted); the
    ratio is ONE double expression on exact BIGINTs, rounded for the
    deterministic TakeOrdered ranking. Plan: two map-side-combinable
    keyed aggs (buckets, then slots) + a broadcast join back (slots are
    |series × 7 × 24|); top-20 is TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.select(
            "event_type",
            F.expr(f"ts DIV 1000 DIV {_DAY_US}").alias("day_idx"),
            F.expr(f"(ts DIV 1000 % {_DAY_US}) DIV {_HOUR_US}").alias("hour"),
        )
        .groupBy("event_type", "day_idx", "hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    s = (
        b.withColumn("dow", F.expr("(day_idx + 4) % 7"))
        .groupBy("event_type", "dow", "hour")
        .agg(
            F.sum("n_events").alias("slot_total"),
            F.count(F.lit(1)).alias("n_slot_buckets"),
        )
    )
    joined = b.withColumn("dow", F.expr("(day_idx + 4) % 7")).join(
        F.broadcast(s), ["event_type", "dow", "hour"]
    )
    return (
        joined.select(
            "event_type",
            "day_idx",
            "hour",
            "n_events",
            "slot_total",
            "n_slot_buckets",
            F.round(
                F.col("n_events").cast("double")
                * F.col("n_slot_buckets")
                / F.col("slot_total"),
                6,
            ).alias("dev_ratio"),
        )
        .orderBy(F.desc("dev_ratio"), "event_type", "day_idx", "hour")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Inter-arrival gap percentiles (demand spacing / capacity planning).
# ---------------------------------------------------------------------------

_GAP_ORACLE = f"""
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - lag(epoch_us(ts))
            OVER (PARTITION BY user_id, event_type
                  ORDER BY epoch_us(ts), event_id)) // 1000000 AS gap_s
  FROM events
), h AS (
  SELECT event_type, gap_s, CAST(COUNT(*) AS BIGINT) AS c
  FROM g WHERE gap_s IS NOT NULL GROUP BY event_type, gap_s
), cum AS (
  SELECT event_type, gap_s, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY gap_s
                      ROWS UNBOUNDED PRECEDING) AS cc,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM h
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_gaps,
       CAST(MIN(CASE WHEN cc * 2 >= n THEN gap_s END) AS BIGINT) AS p50_s,
       CAST(MIN(CASE WHEN cc * 20 >= n * 19 THEN gap_s END) AS BIGINT) AS p95_s,
       CAST(MIN(CASE WHEN cc * 100 >= n * 99 THEN gap_s END) AS BIGINT) AS p99_s,
       CAST(MAX(gap_s) AS BIGINT) AS max_s
FROM cum GROUP BY event_type
"""


@register("tw_interarrival_stats", oracle=_GAP_ORACLE, tags=("timeseries", "stats"))
def tw_interarrival_stats(spark, sf_dir):
    """Per-series inter-arrival gap percentiles (per USER-series gaps
    rolled up per series) — the demand-spacing profile behind capacity
    planning and session-gap threshold selection (tw_sessionize's 30min
    is exactly a p-high of this distribution). Percentiles via the
    exact integer histogram predicate (smallest gap bucket whose
    cumulative count clears q·n — no interpolation), the same machinery
    as cdc_watermark_recommendation.

    Scale shape: the lag window partitions by (user, type) — high-
    cardinality keys, short sequences, NO per-series serialization (a
    PARTITION BY type alone would drag whole series through single
    tasks); the histogram and its cumulative window run on the bounded
    (series × distinct-gap-seconds) relation."""
    ev = load_table(spark, sf_dir, "events")
    seq = W.partitionBy("user_id", "event_type").orderBy(
        F.expr("ts DIV 1000"), F.col("event_id")
    )
    gap_us = F.expr("ts DIV 1000") - F.lag(F.expr("ts DIV 1000")).over(seq)
    g = ev.select(
        "event_type",
        F.floor(gap_us / F.lit(1_000_000)).cast("long").alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    h = g.groupBy("event_type", "gap_s").agg(F.count(F.lit(1)).alias("c"))
    wcum = W.partitionBy("event_type").orderBy("gap_s").rowsBetween(
        W.unboundedPreceding, 0
    )
    wall = W.partitionBy("event_type")
    cum = h.select(
        "event_type",
        "gap_s",
        F.sum("c").over(wcum).alias("cc"),
        F.sum("c").over(wall).alias("n"),
    )
    return cum.groupBy("event_type").agg(
        F.max("n").alias("n_gaps"),
        F.min(F.when(F.col("cc") * 2 >= F.col("n"), F.col("gap_s"))).alias("p50_s"),
        F.min(F.when(F.col("cc") * 20 >= F.col("n") * 19, F.col("gap_s"))).alias("p95_s"),
        F.min(F.when(F.col("cc") * 100 >= F.col("n") * 99, F.col("gap_s"))).alias("p99_s"),
        F.max("gap_s").alias("max_s"),
    )


# ---------------------------------------------------------------------------
# Reorder-latency distribution by market segment.
# ---------------------------------------------------------------------------

_REORDER_ORACLE = """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od, o_orderkey FROM orders
), g AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(od) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey),
                   od) AS gap_days
  FROM o
), j AS (
  SELECT c.c_mktsegment, g.gap_days
  FROM g JOIN customer c ON c.c_custkey = g.o_custkey
  WHERE g.gap_days IS NOT NULL
), h AS (
  SELECT c_mktsegment, gap_days, CAST(COUNT(*) AS BIGINT) AS c
  FROM j GROUP BY c_mktsegment, gap_days
), cum AS (
  SELECT c_mktsegment, gap_days, c,
         SUM(c) OVER (PARTITION BY c_mktsegment ORDER BY gap_days
                      ROWS UNBOUNDED PRECEDING) AS cc,
         SUM(c) OVER (PARTITION BY c_mktsegment) AS n
  FROM h
)
SELECT c_mktsegment, CAST(MAX(n) AS BIGINT) AS n_reorders,
       CAST(MIN(CASE WHEN cc * 2 >= n THEN gap_days END) AS BIGINT) AS p50_days,
       CAST(MIN(CASE WHEN cc * 10 >= n * 9 THEN gap_days END) AS BIGINT) AS p90_days,
       CAST(MAX(gap_days) AS BIGINT) AS max_days
FROM cum GROUP BY c_mktsegment
"""


@register("tw_reorder_latency", oracle=_REORDER_ORACLE, tags=("timeseries", "stats"))
def tw_reorder_latency(spark, sf_dir):
    """Reorder-latency distribution: per customer, day gaps between
    consecutive orders, rolled up to exact histogram percentiles per
    market segment — the repeat-purchase-cadence profile behind
    retention and inventory planning. Same integer histogram-percentile
    predicate as tw_interarrival_stats; the lag window keys on
    customer (high cardinality, short sequences), the segment
    attribution is a keyed dim join, and every window after that runs
    on the bounded (segment × distinct-gap-days) relation."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        "o_orderkey",
    )
    seq = W.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    g = o.select(
        "o_custkey", F.datediff(F.col("od"), F.lag("od").over(seq)).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = g.join(cust, g.o_custkey == cust.c_custkey).select("c_mktsegment", "gap_days")
    h = j.groupBy("c_mktsegment", "gap_days").agg(F.count(F.lit(1)).alias("c"))
    wcum = W.partitionBy("c_mktsegment").orderBy("gap_days").rowsBetween(
        W.unboundedPreceding, 0
    )
    wall = W.partitionBy("c_mktsegment")
    cum = h.select(
        "c_mktsegment",
        "gap_days",
        F.sum("c").over(wcum).alias("cc"),
        F.sum("c").over(wall).alias("n"),
    )
    return cum.groupBy("c_mktsegment").agg(
        F.max("n").alias("n_reorders"),
        F.min(F.when(F.col("cc") * 2 >= F.col("n"), F.col("gap_days"))).cast("long").alias("p50_days"),
        F.min(F.when(F.col("cc") * 10 >= F.col("n") * 9, F.col("gap_days"))).cast("long").alias("p90_days"),
        F.max("gap_days").cast("long").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# Round-6 sequential analytics: trailing EWMA, CUSUM change point,
# cross-correlation at lags.
# ---------------------------------------------------------------------------

_1H_US = 3600 * 1_000_000

_EWMA_ORACLE = f"""
WITH b AS (
  SELECT event_type, (epoch_us(ts) // {_1H_US}) * {_1H_US} AS bucket_us,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), l AS (
  SELECT event_type, bucket_us, x,
         lag(x, 1) OVER w AS x1, lag(x, 2) OVER w AS x2,
         lag(x, 3) OVER w AS x3, lag(x, 4) OVER w AS x4,
         lag(x, 5) OVER w AS x5, lag(x, 6) OVER w AS x6,
         lag(x, 7) OVER w AS x7
  FROM b WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us)
), s AS (
  SELECT event_type, bucket_us, x,
         128 * x + 64 * COALESCE(x1, 0) + 32 * COALESCE(x2, 0)
           + 16 * COALESCE(x3, 0) + 8 * COALESCE(x4, 0)
           + 4 * COALESCE(x5, 0) + 2 * COALESCE(x6, 0) + COALESCE(x7, 0)
           AS num,
         128 + CASE WHEN x1 IS NULL THEN 0 ELSE 64 END
             + CASE WHEN x2 IS NULL THEN 0 ELSE 32 END
             + CASE WHEN x3 IS NULL THEN 0 ELSE 16 END
             + CASE WHEN x4 IS NULL THEN 0 ELSE 8 END
             + CASE WHEN x5 IS NULL THEN 0 ELSE 4 END
             + CASE WHEN x6 IS NULL THEN 0 ELSE 2 END
             + CASE WHEN x7 IS NULL THEN 0 ELSE 1 END AS den
  FROM l
)
SELECT event_type, bucket_us, x AS n_events,
       CAST(num AS BIGINT) AS ewma_num, CAST(den AS BIGINT) AS ewma_den,
       round(CAST(num AS DOUBLE) / den, 6) AS ewma8
FROM s
"""


@register("tw_ewma_trailing", oracle=_EWMA_ORACLE, tags=("window", "timeseries"))
def tw_ewma_trailing(spark, sf_dir):
    """Trailing 8-bucket exponentially-weighted moving average (alpha =
    1/2) of hourly event counts per series — the smoothing baseline
    dashboards and alerting draw. EXACT by construction: alpha = 1/2
    makes every weight a power of two, so numerator and denominator are
    INTEGER window expressions (8 lags, short ramp-up renormalized by
    the present-lag mask) and the only float op is one final division,
    rounded at 6 dp — no recurrence, no accumulated float state. Plan:
    one keyed bucket count + one lag window over the per-(series, hour)
    relation (|series x hours| rows, never |events|)."""
    from .timewindows import events_with_time  # shared ts normalization

    from ..operators.temporal import ewma_trailing

    ev = events_with_time(spark, sf_dir)
    b = (
        ev.withColumn(
            "bucket_us", F.col("ts_us") - F.pmod("ts_us", F.lit(_1H_US))
        )
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    return ewma_trailing(b)


_CUSUM_ORACLE = f"""
WITH b AS (
  SELECT event_type, (epoch_us(ts) // {_1H_US}) * {_1H_US} AS bucket_us,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nb,
         CAST(SUM(x) AS BIGINT) AS s
  FROM b GROUP BY event_type
), p AS (
  SELECT b.event_type, b.bucket_us,
         SUM(tot.nb * b.x - tot.s) OVER (PARTITION BY b.event_type
                                         ORDER BY b.bucket_us
                                         ROWS UNBOUNDED PRECEDING) AS pre
  FROM b JOIN tot ON tot.event_type = b.event_type
), c AS (
  SELECT event_type, bucket_us,
         pre - least(0, MIN(pre) OVER (PARTITION BY event_type
                                       ORDER BY bucket_us
                                       ROWS UNBOUNDED PRECEDING)) AS cusum
  FROM p
)
SELECT c.event_type, CAST(tot.nb AS BIGINT) AS n_buckets,
       CAST(MAX(c.cusum) AS BIGINT) AS max_cusum_scaled,
       CAST(MIN(CASE WHEN c.cusum = mc.m THEN c.bucket_us END) AS BIGINT)
         AS changepoint_bucket_us
FROM c
JOIN (SELECT event_type, MAX(cusum) AS m FROM c GROUP BY event_type) mc
  ON mc.event_type = c.event_type
JOIN tot ON tot.event_type = c.event_type
GROUP BY c.event_type, tot.nb
"""


@register("tw_cusum_changepoint", oracle=_CUSUM_ORACLE, tags=("window", "timeseries", "anomaly"))
def tw_cusum_changepoint(spark, sf_dir):
    """One-sided CUSUM change-point scan over hourly counts per series:
    S_t = max(0, S_{t-1} + (x_t - mean)) — the sequential drift
    detector. The recurrence is rewritten relationally via the
    prefix-sum identity S_t = P_t - min(0, min_{j<=t} P_j), and the
    mean-centering is SCALED BY n (drift = n*x_t - total) so every
    intermediate is an exact BIGINT — no float recurrence, no rounding
    anywhere. Reports each series' peak CUSUM and the earliest bucket
    attaining it (the change point). Plan: one keyed count, one tiny
    per-series rollup broadcast back, two windows over the bucket
    relation."""
    from .timewindows import events_with_time

    ev = events_with_time(spark, sf_dir)
    b = (
        ev.withColumn(
            "bucket_us", F.col("ts_us") - F.pmod("ts_us", F.lit(_1H_US))
        )
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    from ..operators.temporal import cusum_changepoints

    return cusum_changepoints(b)


_XCORR_SERIES_A = "click"
_XCORR_SERIES_B = "purchase"
_XCORR_MAX_LAG = 3

_XCORR_ORACLE = f"""
WITH b AS (
  SELECT event_type, (epoch_us(ts) // {_1H_US}) * {_1H_US} AS bucket_us,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events WHERE event_type IN ('{_XCORR_SERIES_A}', '{_XCORR_SERIES_B}')
  GROUP BY 1, 2
), lags AS (
  SELECT unnest(generate_series(0, {_XCORR_MAX_LAG})) AS lag_h
), p AS (
  SELECT l.lag_h, a.x AS xa, y.x AS xb
  FROM lags l
  JOIN b a ON a.event_type = '{_XCORR_SERIES_A}'
  JOIN b y ON y.event_type = '{_XCORR_SERIES_B}'
          AND y.bucket_us = a.bucket_us + l.lag_h * {_1H_US}
), m AS (
  SELECT lag_h, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xa) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(xb) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(xa * xb) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(xa * xa) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(xb * xb) AS DECIMAL(38,0)) AS syy
  FROM p GROUP BY lag_h
)
SELECT CAST(lag_h AS BIGINT) AS lag_h, n AS n_pairs,
       CASE WHEN (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
             AND (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
            THEN round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                       6)
            END AS xcorr
FROM m
"""


@register("tw_cross_correlation_lags", oracle=_XCORR_ORACLE, tags=("window", "timeseries"))
def tw_cross_correlation_lags(spark, sf_dir):
    """Cross-correlation between the click and purchase hourly series
    at lags 0..3h — "does click volume lead purchase volume, and by how
    much?", the lead-lag diagnostic behind attribution and capacity
    models. Lag alignment is an EQUI-join on shifted bucket ids (no
    sequence assumptions about gaps — only co-present buckets pair);
    moments are exact DECIMAL(38) integer sums with ONE double
    expression per lag, degenerate variance an explicit NULL. Plan: one
    keyed bucket count, a 4-row lag explode on the (tiny) series-A
    relation, one equi-join on (shifted) bucket, one keyed moments
    agg."""
    from .timewindows import events_with_time

    ev = events_with_time(spark, sf_dir)
    b = (
        ev.filter(F.col("event_type").isin(_XCORR_SERIES_A, _XCORR_SERIES_B))
        .withColumn("bucket_us", F.col("ts_us") - F.pmod("ts_us", F.lit(_1H_US)))
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    a = (
        b.filter(F.col("event_type") == _XCORR_SERIES_A)
        .select("bucket_us", F.col("x").alias("xa"))
        .withColumn(
            "lag_h", F.explode(F.sequence(F.lit(0), F.lit(_XCORR_MAX_LAG)))
        )
        .select(
            "lag_h",
            "xa",
            (F.col("bucket_us") + F.col("lag_h") * _1H_US).alias("b_bucket"),
        )
    )
    y = b.filter(F.col("event_type") == _XCORR_SERIES_B).select(
        F.col("bucket_us").alias("b_bucket"), F.col("x").alias("xb")
    )
    p = a.join(y, "b_bucket")
    m = p.groupBy("lag_h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xa").cast("decimal(38,0)").alias("sx"),
        F.sum("xb").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("xa") * F.col("xb")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("xa") * F.col("xa")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("xb") * F.col("xb")).cast("decimal(38,0)").alias("syy"),
    )
    nd = F.col("n")
    varx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    vary = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")
    cov = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    return m.select(
        F.col("lag_h").cast("long").alias("lag_h"),
        F.col("n").alias("n_pairs"),
        F.when((varx > 0) & (vary > 0), F.round(cov / F.sqrt(varx * vary), 6)).alias(
            "xcorr"
        ),
    )


# ---------------------------------------------------------------------------
# Round-6 (cont.): peak detection, runs profile, streak lengths.
# ---------------------------------------------------------------------------

_PEAKS_ORACLE = f"""
WITH b AS (
  SELECT event_type, (epoch_us(ts) // {_1H_US}) * {_1H_US} AS bucket_us,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), l AS (
  SELECT event_type, bucket_us, x,
         lag(x) OVER w AS xp, lead(x) OVER w AS xn
  FROM b WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us)
)
SELECT event_type, bucket_us, x AS n_events,
       CAST(x - greatest(xp, xn) AS BIGINT) AS prominence
FROM l
WHERE xp IS NOT NULL AND xn IS NOT NULL AND x > xp AND x > xn
"""


@register("tw_peak_detection", oracle=_PEAKS_ORACLE, tags=("window", "timeseries"))
def tw_peak_detection(spark, sf_dir):
    """Strict local maxima of the hourly count series per event type
    (greater than BOTH neighbors; series edges excluded), with
    prominence over the higher neighbor — the peak picker behind load
    profiling and burst triage. Pure integer lag/lead comparisons on
    the per-(series, hour) relation; one window per series."""
    from .timewindows import events_with_time

    ev = events_with_time(spark, sf_dir)
    b = (
        ev.withColumn("bucket_us", F.col("ts_us") - F.pmod("ts_us", F.lit(_1H_US)))
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = W.partitionBy("event_type").orderBy("bucket_us")
    l = b.select(
        "event_type",
        "bucket_us",
        "x",
        F.lag("x").over(w).alias("xp"),
        F.lead("x").over(w).alias("xn"),
    )
    return l.filter(
        F.col("xp").isNotNull()
        & F.col("xn").isNotNull()
        & (F.col("x") > F.col("xp"))
        & (F.col("x") > F.col("xn"))
    ).select(
        "event_type",
        "bucket_us",
        F.col("x").alias("n_events"),
        (F.col("x") - F.greatest("xp", "xn")).cast("long").alias("prominence"),
    )


_RUNS_ORACLE = f"""
WITH b AS (
  SELECT event_type, (epoch_us(ts) // {_1H_US}) * {_1H_US} AS bucket_us,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nb, CAST(SUM(x) AS BIGINT) AS s
  FROM b GROUP BY event_type
), f AS (
  SELECT b.event_type, b.bucket_us,
         CASE WHEN tot.nb * b.x > tot.s THEN 1 ELSE 0 END AS above
  FROM b JOIN tot USING (event_type)
), g AS (
  SELECT event_type, bucket_us, above,
         CASE WHEN lag(above) OVER (PARTITION BY event_type ORDER BY bucket_us)
                   IS DISTINCT FROM above THEN 1 ELSE 0 END AS boundary
  FROM f
), r AS (
  SELECT event_type, above,
         SUM(boundary) OVER (PARTITION BY event_type ORDER BY bucket_us
                             ROWS UNBOUNDED PRECEDING) AS run_id
  FROM g
), runs AS (
  SELECT event_type, run_id, above, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM r GROUP BY event_type, run_id, above
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(count_if(above = 1) AS BIGINT) AS n_runs_above,
       CAST(MAX(CASE WHEN above = 1 THEN run_len END) AS BIGINT)
         AS longest_run_above,
       CAST(MAX(CASE WHEN above = 0 THEN run_len END) AS BIGINT)
         AS longest_run_below
FROM runs GROUP BY event_type
"""


@register("tw_runs_profile", oracle=_RUNS_ORACLE, tags=("window", "timeseries", "stats"))
def tw_runs_profile(spark, sf_dir):
    """Wald-Wolfowitz-style runs profile of each hourly series vs its
    own mean: run counts and longest above/below stretches — too few
    runs means trend/regime structure, too many means oscillation; the
    cheap randomness screen before fitting seasonal models. The
    above-mean flag uses the SCALED integer compare nb*x > sum (no
    float mean), runs come from the boundary-flag cumulative-sum
    gaps-and-islands identity — exact integers throughout."""
    from .timewindows import events_with_time

    ev = events_with_time(spark, sf_dir)
    b = (
        ev.withColumn("bucket_us", F.col("ts_us") - F.pmod("ts_us", F.lit(_1H_US)))
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    tot = b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nb"), F.sum("x").alias("s")
    )
    f = b.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "bucket_us",
        F.when(F.col("nb") * F.col("x") > F.col("s"), 1).otherwise(0).alias("above"),
    )
    w = W.partitionBy("event_type").orderBy("bucket_us")
    wc = w.rowsBetween(W.unboundedPreceding, 0)
    g = f.withColumn(
        "boundary",
        F.when(
            ~F.lag("above").over(w).eqNullSafe(F.col("above")), 1
        ).otherwise(0),
    )
    r = g.select(
        "event_type", "above", F.sum("boundary").over(wc).alias("run_id")
    )
    runs = r.groupBy("event_type", "run_id", "above").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.count(F.when(F.col("above") == 1, 1)).alias("n_runs_above"),
        F.max(F.when(F.col("above") == 1, F.col("run_len"))).alias(
            "longest_run_above"
        ),
        F.max(F.when(F.col("above") == 0, F.col("run_len"))).alias(
            "longest_run_below"
        ),
    )


_STREAK_ORACLE = """
WITH s AS (
  SELECT user_id, event_type, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id)
           - row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY event_id) AS isl
  FROM events
), streaks AS (
  SELECT user_id, event_type, isl, CAST(COUNT(*) AS BIGINT) AS streak_len
  FROM s GROUP BY user_id, event_type, isl
)
SELECT event_type,
       CAST(MAX(streak_len) AS BIGINT) AS max_streak,
       CAST(count_if(streak_len >= 3) AS BIGINT) AS n_streaks_ge3,
       CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM streaks GROUP BY event_type
"""


@register("win_streak_lengths", oracle=_STREAK_ORACLE, tags=("window", "analytics"))
def win_streak_lengths(spark, sf_dir):
    """Longest CONSECUTIVE same-event-type streak per user (arrival
    order), rolled up per type — the classic gaps-and-islands by
    row-number DIFFERENCE (two row_numbers over the same shuffle
    partitioning; their gap is constant exactly within a streak), the
    engagement/repetition shape behind "N purchases in a row" features.
    Exact integers; both windows share the user_id partitioning — one
    shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id"
    )
    w1 = W.partitionBy("user_id").orderBy("event_id")
    w2 = W.partitionBy("user_id", "event_type").orderBy("event_id")
    s = ev.withColumn(
        "isl", F.row_number().over(w1) - F.row_number().over(w2)
    )
    streaks = s.groupBy("user_id", "event_type", "isl").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return streaks.groupBy("event_type").agg(
        F.max("streak_len").alias("max_streak"),
        F.count(F.when(F.col("streak_len") >= 3, 1)).alias("n_streaks_ge3"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


# ---------------------------------------------------------------------------
# Round-6: time-to-conversion horizon table (discrete survival curve).
# ---------------------------------------------------------------------------

_TTC_HORIZONS_US = [
    3_600_000_000,        # 1h
    21_600_000_000,       # 6h
    86_400_000_000,       # 1d
    259_200_000_000,      # 3d
    604_800_000_000,      # 7d
]

_TTC_ORACLE = f"""
WITH s AS (
  SELECT user_id, MIN(epoch_us(ts)) AS signup_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
), f AS (
  SELECT s.user_id, s.signup_us,
         MIN(CASE WHEN p.ts_us >= s.signup_us THEN p.ts_us END) AS first_purchase_us
  FROM s LEFT JOIN p ON p.user_id = s.user_id
  GROUP BY s.user_id, s.signup_us
), h AS (
  SELECT unnest([{", ".join(str(h) for h in _TTC_HORIZONS_US)}]) AS horizon_us
)
SELECT h.horizon_us,
       CAST(COUNT(*) AS BIGINT) AS n_signups,
       CAST(SUM(CASE WHEN f.first_purchase_us IS NOT NULL
                      AND f.first_purchase_us - f.signup_us <= h.horizon_us
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
       CAST(SUM(CASE WHEN f.first_purchase_us IS NOT NULL
                      AND f.first_purchase_us - f.signup_us <= h.horizon_us
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS conversion_ppm
FROM f, h
GROUP BY h.horizon_us
"""


@register("tw_time_to_conversion", oracle=_TTC_ORACLE, tags=("timewindow", "analytics"))
def tw_time_to_conversion(spark, sf_dir):
    """TIME-TO-CONVERSION horizon table (the discrete empirical
    survival/conversion curve): for each signup, the first
    at-or-after-signup purchase, evaluated at 1h/6h/1d/3d/7d horizons —
    per horizon: signups at risk, conversions within, exact-ppm rate.
    Users who never purchase are the censored mass (they count in the
    denominator at every horizon — dropping them is the classic
    survivorship bias this table exists to avoid).

    Plan: two keyed MIN aggs (signup, first qualifying purchase — the
    conditional MIN keeps it one pass), a x5 horizon explode of the
    small per-user relation, one keyed count. All integers; floor-ppm
    on nonnegative operands."""
    from .timewindows import events_with_time  # shared ts normalization

    ev = events_with_time(spark, sf_dir)
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("signup_us"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_us").alias("p_us")
    )
    f = (
        s.join(p, "user_id", "left")
        .groupBy("user_id", "signup_us")
        .agg(
            F.min(
                F.when(F.col("p_us") >= F.col("signup_us"), F.col("p_us"))
            ).alias("first_purchase_us")
        )
    )
    h = F.explode(
        F.array(*[F.lit(x) for x in _TTC_HORIZONS_US])
    ).alias("horizon_us")
    conv = F.when(
        F.col("first_purchase_us").isNotNull()
        & (F.col("first_purchase_us") - F.col("signup_us") <= F.col("horizon_us")),
        1,
    ).otherwise(0)
    return (
        f.select("signup_us", "first_purchase_us", h)
        .groupBy("horizon_us")
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.sum(conv).cast("long").alias("n_converted"),
            F.expr(
                "CAST(SUM(CASE WHEN first_purchase_us IS NOT NULL"
                " AND first_purchase_us - signup_us <= horizon_us"
                " THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT)"
            ).alias("conversion_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7: session-gap calibration — n_sessions as a function of the
# inactivity gap, from ONE lag pass (the threshold/probe curve pattern
# applied to sessionization).
# ---------------------------------------------------------------------------

_GAP_SWEEP_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events
), d AS (
  SELECT user_id,
         ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
           AS delta_us
  FROM e
), u AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM e
), g AS (
  SELECT unnest([5, 15, 30, 60]) AS gap_min
)
SELECT g.gap_min,
       u.n_users + CAST(
         (SELECT COUNT(*) FROM d
          WHERE d.delta_us > CAST(g.gap_min AS BIGINT) * 60000000) AS BIGINT) AS n_sessions,
       CAST(CAST(u.n_events AS HUGEINT) * 1000000
            // (u.n_users + (SELECT COUNT(*) FROM d
                WHERE d.delta_us > CAST(g.gap_min AS BIGINT) * 60000000))
            AS BIGINT) AS events_per_session_micro
FROM g, u
"""


@register("tw_session_gap_sweep", oracle=_GAP_SWEEP_ORACLE, tags=("timewindow", "session"))
def tw_session_gap_sweep(spark, sf_dir):
    """SESSION-GAP calibration: total session count (and mean events
    per session, exact micro-units) as a function of the inactivity
    gap (5/15/30/60 min) — the curve that picks the sessionization
    parameter every funnel/retention metric downstream depends on.

    The identity that makes this ONE pass instead of four
    sessionizations: a session boundary exists exactly where a
    per-user inter-arrival delta exceeds the gap, so
    n_sessions(g) = n_users + #{deltas > g}. One per-user lag window
    computes every delta once; the 4-row gap relation then
    broadcast-theta-joins onto the delta relation and each gap is a
    conditional count — map-side combinable, no re-shuffle per
    candidate gap. Exact integers end-to-end (micros, HUGEINT/DECIMAL
    floor division for the mean)."""
    from ..tables import events_with_time

    e = events_with_time(spark, sf_dir).select("user_id", "ts_us")
    w = W.partitionBy("user_id").orderBy("ts_us")
    d = e.select(
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("delta_us")
    ).filter(F.col("delta_us").isNotNull())
    u = e.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    g = spark.range(1).select(
        F.explode(F.array(F.lit(5), F.lit(15), F.lit(30), F.lit(60))).alias(
            "gap_min"
        )
    )
    boundaries = (
        F.broadcast(g)
        .join(
            d,
            d.delta_us > F.col("gap_min").cast("long") * F.lit(60000000).cast("long"),
            "left",
        )
        .groupBy("gap_min")
        .agg(F.count(F.col("delta_us")).alias("n_boundaries"))
    )
    return boundaries.crossJoin(F.broadcast(u)).select(
        "gap_min",
        (F.col("n_users") + F.col("n_boundaries")).alias("n_sessions"),
        F.expr(
            "CAST(CAST(n_events AS DECIMAL(38,0)) * 1000000"
            " DIV (n_users + n_boundaries) AS BIGINT)"
        ).alias("events_per_session_micro"),
    )


# ---------------------------------------------------------------------------
# Round-8: event-time LATENESS histogram — the empirical distribution a
# watermark delay is read off of.
# ---------------------------------------------------------------------------

_LATENESS_ORACLE = """
WITH s AS (
  SELECT epoch_us(ts) - MAX(epoch_us(ts)) OVER (
           PARTITION BY user_id
           ORDER BY event_id + CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 4))
                    AS BIGINT) % 64, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS late_us
  FROM events
), b AS (
  SELECT CASE
           WHEN late_us IS NULL OR late_us >= 0 THEN 'on_time'
           WHEN -late_us < 60000000 THEN 'lt_1m'
           WHEN -late_us < 300000000 THEN 'lt_5m'
           WHEN -late_us < 900000000 THEN 'lt_15m'
           WHEN -late_us < 3600000000 THEN 'lt_1h'
           ELSE 'ge_1h'
         END AS bucket,
         CASE WHEN late_us < 0 THEN -late_us ELSE 0 END AS lateness_us
  FROM s
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(lateness_us) AS BIGINT) AS max_lateness_us
FROM b GROUP BY bucket
"""


@register("tw_lateness_histogram", oracle=_LATENESS_ORACLE, tags=("timewindow", "cdc", "streaming"))
def tw_lateness_histogram(spark, sf_dir):
    """Event-time LATENESS distribution: per event, how far its event
    time falls BEHIND the per-key running maximum seen so far in
    arrival order (the md5-jittered arrival key shared with the OOO
    profile — see queries/profiling.py for why the raw fixture order
    is non-discriminating), bucketed into the on-time/1m/5m/15m/1h
    bands a watermark delay is chosen from. This is the empirical
    histogram behind cdc_watermark_recommendation's single recommended
    number: the recommendation says WHERE to cut; this shows what the
    cut drops. Exact integers end-to-end (micros; per-band max). Plan:
    one per-key running-max window (the key shuffle only) + a tiny
    keyed rollup."""
    from .profiling import _JITTER_SPARK

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.expr(_JITTER_SPARK), F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    s = ev.select(
        (
            F.expr("ts DIV 1000") - F.max(F.expr("ts DIV 1000")).over(w)
        ).alias("late_us")
    )
    lateness = F.when(F.col("late_us") < 0, -F.col("late_us")).otherwise(
        F.lit(0)
    )
    bucket = (
        F.when(
            F.col("late_us").isNull() | (F.col("late_us") >= 0), "on_time"
        )
        .when(-F.col("late_us") < 60_000_000, "lt_1m")
        .when(-F.col("late_us") < 300_000_000, "lt_5m")
        .when(-F.col("late_us") < 900_000_000, "lt_15m")
        .when(-F.col("late_us") < 3_600_000_000, "lt_1h")
        .otherwise("ge_1h")
    )
    return (
        s.select(bucket.alias("bucket"), lateness.alias("lateness_us"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("lateness_us").cast("long").alias("max_lateness_us"),
        )
    )


# ---------------------------------------------------------------------------
# Round-8: maximum drawdown per series — the peak-to-trough risk metric.
# ---------------------------------------------------------------------------

_DRAWDOWN_ORACLE = """
WITH d AS (
  SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(SUM(round(CAST(value AS DECIMAL(12,2)) * 100)) AS BIGINT)
           AS day_cents
  FROM events GROUP BY 1, 2
), c AS (
  SELECT event_type, day,
         SUM(day_cents) OVER (PARTITION BY event_type ORDER BY day) AS cum
  FROM d
), r AS (
  SELECT event_type, day, cum,
         MAX(cum) OVER (PARTITION BY event_type ORDER BY day) AS peak
  FROM c
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(peak) AS BIGINT) AS final_peak_cents,
       CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown_cents
FROM r GROUP BY event_type
"""


@register("tw_max_drawdown", oracle=_DRAWDOWN_ORACLE, tags=("timewindow", "stats"))
def tw_max_drawdown(spark, sf_dir):
    """MAXIMUM DRAWDOWN per series: largest peak-to-trough fall of the
    cumulative daily value — the classic sequential risk metric
    (finance's worst-case-regret number), and in a data pipeline the
    shape that monitors any cumulative KPI for regressions. Exact
    integer cents end-to-end. Plan: one daily rollup (map-side
    combinable), then TWO per-series prefix windows (cumsum + running
    max) — both partitioned BY SERIES, so the window never
    single-partitions the data; a per-series day count is bounded by
    the calendar, not the corpus (at 100 TB the per-key relation is
    |days| rows regardless of event volume — the rollup absorbed the
    scale)."""
    from ..tables import events_with_time

    e = events_with_time(spark, sf_dir)
    d = (
        e.select(
            "event_type",
            F.expr("ts_us DIV 86400000000").alias("day"),
            F.round(dec_value() * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("day_cents"))
    )
    wc = W.partitionBy("event_type").orderBy("day")
    c = d.withColumn("cum", F.sum("day_cents").over(wc))
    r = c.withColumn("peak", F.max("cum").over(wc))
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("peak").cast("long").alias("final_peak_cents"),
        F.max(F.col("peak") - F.col("cum")).cast("long").alias(
            "max_drawdown_cents"
        ),
    )


def dec_value():
    from ..tables import VAL

    return F.col("value").cast(VAL)


_VWAP_ORACLE = """
WITH e AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS BIGINT) AS qty
  FROM events
)
SELECT day, event_type,
       CAST(SUM(qty) AS BIGINT) AS total_qty,
       CAST(SUM(cents * qty) AS BIGINT) AS notional_cents,
       round(CAST(SUM(cents * qty) AS DOUBLE) / SUM(qty), 6) AS vwap_cents
FROM e GROUP BY day, event_type
HAVING SUM(qty) > 0
"""


@register("tw_vwap_daily", oracle=_VWAP_ORACLE, tags=("timeseries", "agg"))
def tw_vwap_daily(spark, sf_dir):
    """Daily VWAP per event type — the volume-weighted mean every
    market-data / metering rollup ships (value = price in exact cents,
    the props k field = quantity): VWAP = Σ(price·qty) / Σqty with
    BOTH sums exact integers and ONE final division (the weighted twin
    of the OHLC close; a plain AVG is the qty=1 special case and gets
    the wrong answer whenever volume varies). Zero-volume groups are
    excluded by an exact HAVING, not a NULL-division. One hash
    aggregation, map-side combinable."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    e = ev.select(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("etime")), "yyyy-MM-dd").alias("day"),
        (F.col("value").cast(VAL) * 100).cast("long").alias("cents"),
        F.regexp_extract("props", '"k": *([0-9]+)', 1).cast("long").alias("qty"),
    )
    return (
        e.groupBy("day", "event_type")
        .agg(
            F.sum("qty").cast("long").alias("total_qty"),
            F.sum(F.col("cents") * F.col("qty")).cast("long").alias("notional_cents"),
            F.round(
                F.sum(F.col("cents") * F.col("qty")).cast("double") / F.sum("qty"),
                6,
            ).alias("vwap_cents"),
        )
        .filter(F.col("total_qty") > 0)
    )


_BOLLINGER_ORACLE = """
WITH d AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              // COUNT(*) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('day', ts)
), r AS (
  SELECT event_type, day, cents,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(cents) OVER w AS BIGINT) AS s,
         CAST(SUM(cents * cents) OVER w AS BIGINT) AS ss
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, cents, n,
       round(CAST(s AS DOUBLE) / n, 6) AS sma_cents,
       ((n * cents - s) * (n * cents - s) > 4 * (n * ss - s * s)
        AND n * cents > s) AS breakout_hi,
       ((n * cents - s) * (n * cents - s) > 4 * (n * ss - s * s)
        AND n * cents < s) AS breakout_lo
FROM r WHERE n = 7
"""


@register("tw_bollinger_bands", oracle=_BOLLINGER_ORACLE, tags=("timeseries", "window"))
def tw_bollinger_bands(spark, sf_dir):
    """Bollinger bands over the daily mean-price series (7-day rolling
    mean ± 2 population σ), with the breakout test done as an EXACT
    INTEGER predicate: x outside μ ± 2σ  ⟺  (n·x − S)² > 4(n·Σx² − S²)
    — both sides exact longs, so the band comparison can never flip on
    float ulps at the boundary (the layout-audit discipline applied to
    a CLASSIFICATION, where rounding the reported value would not
    help). Warm-up rows (window shorter than 7) are excluded exactly.
    Daily closes are integer floor-mean cents; the only float is the
    REPORTED sma. Plan: one day-rollup + one windowed pass partitioned
    by series — both keyed shuffles."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    d = (
        ev.select(
            "event_type",
            F.date_format(F.date_trunc("day", F.col("etime")), "yyyy-MM-dd").alias("day"),
            (F.col("value").cast(VAL) * 100).cast("long").alias("c0"),
        )
        .groupBy("event_type", "day")
        .agg(F.expr("CAST(SUM(c0) DIV COUNT(*) AS BIGINT)").alias("cents"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    r = d.select(
        "event_type",
        "day",
        "cents",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("cents").over(w).cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).over(w).cast("long").alias("ss"),
    ).filter(F.col("n") == 7)
    dev = F.col("n") * F.col("cents") - F.col("s")
    var4 = 4 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    return r.select(
        "event_type",
        "day",
        "cents",
        "n",
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("sma_cents"),
        ((dev * dev > var4) & (dev > 0)).alias("breakout_hi"),
        ((dev * dev > var4) & (dev < 0)).alias("breakout_lo"),
    )


_KM_ORACLE = """
WITH ordered AS (
  SELECT e.user_id, c.c_mktsegment AS segment,
         date_trunc('day', e.ts) AS day, e.event_type,
         row_number() OVER (PARTITION BY e.user_id
                            ORDER BY epoch_us(e.ts) DESC, e.event_id DESC)
           AS rn
  FROM events e JOIN customer c ON c.c_custkey = e.user_id
), span AS (
  SELECT user_id, ANY_VALUE(segment) AS segment,
         date_diff('day', MIN(day), MAX(day)) AS duration,
         MAX(CASE WHEN rn = 1 THEN event_type END) AS last_type
  FROM ordered GROUP BY user_id
), d AS (
  SELECT segment, CAST(duration AS BIGINT) AS duration,
         CAST(SUM(CASE WHEN last_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_deaths,
         CAST(COUNT(*) AS BIGINT) AS n_ending
  FROM span GROUP BY segment, duration
), r AS (
  SELECT segment, duration, n_deaths,
         CAST(SUM(n_ending) OVER (PARTITION BY segment ORDER BY duration
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_ending
              AS BIGINT) AS n_before
  FROM d
), t AS (
  SELECT segment, CAST(SUM(n_ending) AS BIGINT) AS n_total
  FROM d GROUP BY segment
), f AS (
  SELECT r.segment, r.duration, r.n_deaths,
         t.n_total - r.n_before AS n_at_risk,
         CAST(round(1000000 * ln(1.0 - CAST(r.n_deaths AS DOUBLE)
                                       / (t.n_total - r.n_before)))
              AS BIGINT) AS step_log_micro
  FROM r JOIN t USING (segment)
  WHERE r.n_deaths > 0 AND t.n_total - r.n_before > r.n_deaths
)
SELECT segment, duration, n_at_risk, n_deaths,
       CAST(SUM(step_log_micro) OVER (PARTITION BY segment ORDER BY duration
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS km_log_micro
FROM f
"""


@register("tw_kaplan_meier", oracle=_KM_ORACLE, tags=("timeseries", "agg", "stats"))
def tw_kaplan_meier(spark, sf_dir):
    """KAPLAN-MEIER survival curve of user lifetimes per market
    segment (Kaplan & Meier 1958) with right censoring: a user's
    duration is last-event day minus first-event day; users whose LAST
    event is the tombstone died at that duration, everyone else is
    censored (still alive when observation stopped) and leaves the
    risk set without a death step. S(d) = Π_{d_i<=d} (1 - e_i/n_i) is
    carried in the engine's MICRO-NAT discipline: each factor's ln is
    quantized ONCE to an integer (identical IEEE ln on identical exact
    integers in both engines), and the running product is then an
    EXACT integer cumulative sum over the ordered frame — no float
    accumulation can diverge across layouts or engines. Plateau
    durations with zero deaths are no-ops and excluded, as is the
    degenerate everyone-dies tail (factor 0). Plan: per-user rollup
    (keyed), per-(segment,duration) rollup, two windowed passes
    partitioned by segment."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    span = (
        ev.join(F.broadcast(cust), "user_id")
        .groupBy("user_id", "segment")
        .agg(
            F.datediff(
                F.max(F.date_trunc("day", F.col("etime"))),
                F.min(F.date_trunc("day", F.col("etime"))),
            ).cast("long").alias("duration"),
            F.max_by(
                "event_type", F.struct(F.col("ts_us"), F.col("event_id"))
            ).alias("last_type"),
        )
    )
    d = span.groupBy("segment", "duration").agg(
        F.sum(
            F.when(F.col("last_type") == "error", F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("n_deaths"),
        F.count(F.lit(1)).cast("long").alias("n_ending"),
    )
    wcum = (
        W.partitionBy("segment")
        .orderBy("duration")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    r = d.select(
        "segment",
        "duration",
        "n_deaths",
        "n_ending",
        (F.sum("n_ending").over(wcum) - F.col("n_ending"))
        .cast("long")
        .alias("n_before"),
    )
    t = d.groupBy(F.col("segment").alias("seg2")).agg(
        F.sum("n_ending").cast("long").alias("n_total")
    )
    f = (
        r.join(F.broadcast(t), r.segment == F.col("seg2"))
        .withColumn("n_at_risk", F.col("n_total") - F.col("n_before"))
        .filter(
            (F.col("n_deaths") > 0)
            & (F.col("n_at_risk") > F.col("n_deaths"))
        )
        .withColumn(
            "step_log_micro",
            F.round(
                1_000_000
                * F.log(
                    F.lit(1.0)
                    - F.col("n_deaths").cast("double") / F.col("n_at_risk")
                )
            ).cast("long"),
        )
    )
    return f.select(
        "segment",
        "duration",
        "n_at_risk",
        "n_deaths",
        F.sum("step_log_micro").over(wcum).cast("long").alias("km_log_micro"),
    )


_ACF_ORACLE = """
WITH d AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              // COUNT(*) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('day', ts)
), r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
  FROM d
), lags AS (
  SELECT lag.lag AS lag, a.event_type, a.cents AS x, b.cents AS y
  FROM (SELECT unnest([1, 2, 3]) AS lag) lag
  JOIN r a ON TRUE
  JOIN r b ON b.event_type = a.event_type AND b.t = a.t + lag.lag
), m AS (
  SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS syy
  FROM lags GROUP BY event_type, lag
)
SELECT event_type, CAST(lag AS BIGINT) AS lag, n,
       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             6) AS acf
FROM m
"""


@register("tw_autocorrelation_daily", oracle=_ACF_ORACLE, tags=("timeseries", "stats"))
def tw_autocorrelation_daily(spark, sf_dir):
    """AUTOCORRELATION of each event type's daily mean-price series at
    lags 1-3 — the seasonality/persistence fingerprint (the SELF twin
    of tw_cross_correlation_lags, which correlates two different
    series): Pearson between the series and its own lag-k shift over
    the overlapping observed days (row-lag over the ordered sequence —
    the convention for irregularly observed series, stated rather than
    calendar-gap-filled). Exactness: daily closes are integer
    floor-mean cents; every moment is a DECIMAL(38)/HUGEINT sum; each
    (type, lag) correlation is one float expression (the OLS rule).
    Plan: one day rollup, one per-series rank window, THREE shifted
    equi-joins (one per lag — the band-join-as-equi-joins pattern),
    one moment rollup."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    d = (
        ev.select(
            "event_type",
            F.date_format(F.date_trunc("day", F.col("etime")), "yyyy-MM-dd").alias("day"),
            (F.col("value").cast(VAL) * 100).cast("long").alias("c0"),
        )
        .groupBy("event_type", "day")
        .agg(F.expr("CAST(SUM(c0) DIV COUNT(*) AS BIGINT)").alias("cents"))
    )
    r = d.select(
        "event_type",
        "cents",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("day"))
        .alias("t"),
    )
    lagged = None
    for k in (1, 2, 3):
        a = r.select("event_type", F.col("cents").alias("x"), (F.col("t") + k).alias("t"))
        b = r.select("event_type", F.col("cents").alias("y"), "t")
        p = a.join(b, ["event_type", "t"]).select(
            "event_type", F.lit(k).cast("long").alias("lag"), "x", "y"
        )
        lagged = p if lagged is None else lagged.unionByName(p)
    m = lagged.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    return m.select(
        "event_type",
        "lag",
        "n",
        F.round(
            (F.col("n") * F.col("sxy").cast("double")
             - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / F.sqrt(
                (F.col("n") * F.col("sxx").cast("double")
                 - F.col("sx").cast("double") * F.col("sx").cast("double"))
                * (F.col("n") * F.col("syy").cast("double")
                   - F.col("sy").cast("double") * F.col("sy").cast("double"))
            ),
            6,
        ).alias("acf"),
    )


_THEIL_SEN_ORACLE = """
WITH d AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS day_num,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              // COUNT(*) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('day', ts)
), slopes AS (
  SELECT a.event_type,
         CAST((CAST(b.cents - a.cents AS HUGEINT) * 1000000)
              // (b.day_num - a.day_num) AS BIGINT) AS slope_micro
  FROM d a JOIN d b
    ON b.event_type = a.event_type AND b.day_num > a.day_num
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_slopes,
       CAST(round(2 * quantile_cont(slope_micro, 0.5)) AS BIGINT)
         AS theil_sen_slope_micro_x2
FROM slopes GROUP BY event_type
"""


@register("tw_theil_sen_slope", oracle=_THEIL_SEN_ORACLE, tags=("timeseries", "stats"))
def tw_theil_sen_slope(spark, sf_dir):
    """THEIL-SEN robust trend (Theil 1950 / Sen 1968): the median of
    all pairwise slopes of each event type's daily series — the
    estimator that shrugs off the outlier days that drag OLS
    (win_rolling_slope / agg_corr_regression are the L2 twins; this is
    the 29%-breakdown-point one). Per-pair slopes are quantized by
    EXACT integer floor division ((Δcents·10⁶) DIV Δdays — the
    jackknife lesson: never float-round an integer quotient), and the
    median is reported DOUBLED so the even-count interpolation stays
    an exact integer. The pairwise relation is per-series O(days²) —
    bounded by the calendar, not the data (documented; at 100 TB days
    per series is still ~10³). One rollup + one per-series self-join
    + one exact median."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    d = (
        ev.select(
            "event_type",
            F.unix_date(F.to_date(F.col("etime"))).cast("long").alias("day_num"),
            (F.col("value").cast(VAL) * 100).cast("long").alias("c0"),
        )
        .groupBy("event_type", "day_num")
        .agg(F.expr("CAST(SUM(c0) DIV COUNT(*) AS BIGINT)").alias("cents"))
    )
    a = d.select("event_type", F.col("day_num").alias("da"), F.col("cents").alias("ca"))
    b = d.select("event_type", F.col("day_num").alias("db"), F.col("cents").alias("cb"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("db") > F.col("da"))
        .select(
            "event_type",
            F.expr(
                "CAST((CAST(cb - ca AS DECIMAL(38,0)) * 1000000)"
                " DIV (db - da) AS BIGINT)"
            ).alias("slope_micro"),
        )
    )
    return slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_slopes"),
        F.round(2 * F.expr("percentile(slope_micro, 0.5)"))
        .cast("long")
        .alias("theil_sen_slope_micro_x2"),
    )


# ---------------------------------------------------------------------------
# Round-10: Ljung-Box portmanteau, day-of-week seasonality strength,
# Holt double-exponential smoothing (exact integer recurrence).
# ---------------------------------------------------------------------------

_LB_ORACLE = """
WITH d AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              // COUNT(*) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('day', ts)
), r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
  FROM d
), nn AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM r GROUP BY event_type
), lags AS (
  SELECT lag.lag AS lag, a.event_type, a.cents AS x, b.cents AS y
  FROM (SELECT unnest([1, 2, 3, 4, 5]) AS lag) lag
  JOIN r a ON TRUE
  JOIN r b ON b.event_type = a.event_type AND b.t = a.t + lag.lag
), m AS (
  SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS np,
         CAST(SUM(CAST(x AS HUGEINT)) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS syy
  FROM lags GROUP BY event_type, lag
), rk AS (
  SELECT event_type, lag,
         CAST(round(1000000.0 *
           (np * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt((np * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (np * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
           AS BIGINT) AS r_micro
  FROM m
), terms AS (
  SELECT rk.event_type,
         CAST(SUM(CAST(r_micro AS HUGEINT) * r_micro // (nn.n - lag))
              AS DECIMAL(38,0)) AS tsum
  FROM rk JOIN nn ON rk.event_type = nn.event_type
  GROUP BY rk.event_type
)
SELECT nn.event_type, nn.n AS n_days,
       round(nn.n * (nn.n + 2.0) * CAST(terms.tsum AS DOUBLE) / 1e12, 6)
         AS q_ljung_box
FROM nn JOIN terms ON nn.event_type = terms.event_type
"""


@register("tw_ljung_box", oracle=_LB_ORACLE, tags=("timeseries", "stats"))
def tw_ljung_box(spark, sf_dir):
    """LJUNG-BOX portmanteau (Ljung & Box 1978) per event type — "is
    the daily close series white noise?", the diagnostic that reads
    tw_autocorrelation_daily's lags jointly: Q = n(n+2) Σ_{k≤5}
    r_k²/(n−k). Convention pinned: r_k is the Pearson ACF of the
    row-lagged overlapped pairs (the tw_autocorrelation_daily
    convention, stated); each r_k is ONE float expression immediately
    micro-quantized (round(1e6·r) BIGINT — the Burrows-Delta rule), so
    the 5-term sum is EXACT integer arithmetic (r²·10⁶-scale DIV
    (n−k)) and no float addition order exists for layouts to reorder;
    Q is one final float. Plan: one day rollup, one keyed rank window,
    5 shifted equi-joins, two keyed reduces."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    d = (
        ev.select(
            "event_type",
            F.date_format(F.date_trunc("day", F.col("etime")), "yyyy-MM-dd").alias("day"),
            (F.col("value").cast(VAL) * 100).cast("long").alias("c0"),
        )
        .groupBy("event_type", "day")
        .agg(F.expr("CAST(SUM(c0) DIV COUNT(*) AS BIGINT)").alias("cents"))
    )
    r = d.select(
        "event_type",
        "cents",
        F.row_number().over(W.partitionBy("event_type").orderBy("day")).alias("t"),
    )
    nn = r.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    lagged = None
    for k in (1, 2, 3, 4, 5):
        a = r.select("event_type", F.col("cents").alias("x"), (F.col("t") + k).alias("t"))
        b = r.select("event_type", F.col("cents").alias("y"), "t")
        p = a.join(b, ["event_type", "t"]).select(
            "event_type", F.lit(k).cast("long").alias("lag"), "x", "y"
        )
        lagged = p if lagged is None else lagged.unionByName(p)
    m = lagged.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    rk = m.select(
        "event_type",
        "lag",
        F.round(
            1000000.0
            * (
                F.col("np") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / F.sqrt(
                (
                    F.col("np") * F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sx").cast("double")
                )
                * (
                    F.col("np") * F.col("syy").cast("double")
                    - F.col("sy").cast("double") * F.col("sy").cast("double")
                )
            )
        )
        .cast("long")
        .alias("r_micro"),
    )
    terms = (
        rk.join(nn, "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(r_micro AS DECIMAL(38,0)) * r_micro DIV (n - lag)"
                    " AS DECIMAL(38,0))"
                )
            ).alias("tsum")
        )
    )
    return (
        nn.join(terms, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.round(
                F.col("n") * (F.col("n") + 2.0) * F.col("tsum").cast("double") / 1e12,
                6,
            ).alias("q_ljung_box"),
        )
    )


_SEASON_ORACLE = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('day', ts)
), g AS (
  SELECT event_type, dayofweek(day) AS dow, cents FROM d
), per_g AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CAST(cents AS HUGEINT)) AS DECIMAL(38,0)) AS s_g
  FROM g GROUP BY event_type, dow
), tot AS (
  SELECT event_type, CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS DECIMAL(38,0)) AS s,
         CAST(SUM(CAST(s_g AS HUGEINT) * s_g * 1000000 // n_g)
              AS DECIMAL(38,0)) AS sb_scaled
  FROM per_g GROUP BY event_type
), sq AS (
  SELECT event_type,
         CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DECIMAL(38,0)) AS sxx
  FROM g GROUP BY event_type
)
SELECT tot.event_type, tot.n AS n_days,
       round((CAST(tot.sb_scaled AS DOUBLE) / 1e6
              - CAST(tot.s AS DOUBLE) * CAST(tot.s AS DOUBLE) / tot.n)
             / (CAST(sq.sxx AS DOUBLE)
                - CAST(tot.s AS DOUBLE) * CAST(tot.s AS DOUBLE) / tot.n), 6)
         AS eta_squared
FROM tot JOIN sq ON tot.event_type = sq.event_type
"""


@register("tw_seasonality_strength", oracle=_SEASON_ORACLE, tags=("timeseries", "stats"))
def tw_seasonality_strength(spark, sf_dir):
    """DAY-OF-WEEK seasonality strength per event type: η² = between-
    group / total sum of squares of the daily revenue series grouped
    by weekday — the variance-decomposition answer to "how much of the
    daily variation is weekly seasonality?" (the one-way-ANOVA effect
    size, completing agg_anova_f with its strength measure). Σ S_g²/n_g
    is accumulated at the fixed 10⁶ integer scale (the Kruskal-Wallis
    ADVICE fix pattern — truncation < 1e-6 cents²/term); all other
    moments are DECIMAL(38)-exact; η² is one float expression."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    d = (
        ev.select(
            "event_type",
            F.date_trunc("day", "etime").alias("day"),
            F.round(dec("value", VAL) * 100).cast("long").alias("c0"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c0").cast("long").alias("cents"))
    )
    g = d.select("event_type", F.dayofweek("day").alias("dow"), "cents")
    per_g = g.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s_g"),
    )
    tot = per_g.groupBy("event_type").agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum(
            F.expr(
                "CAST(CAST(s_g AS DECIMAL(38,0)) * s_g * 1000000 DIV n_g"
                " AS DECIMAL(38,0))"
            )
        ).alias("sb_scaled"),
    )
    sq = g.groupBy("event_type").agg(
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("sxx")
    )
    s2 = F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    return (
        tot.join(sq, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.round(
                (F.col("sb_scaled").cast("double") / 1e6 - s2)
                / (F.col("sxx").cast("double") - s2),
                6,
            ).alias("eta_squared"),
        )
    )


_HOLT_ORACLE = """
WITH RECURSIVE d AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              // COUNT(*) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('day', ts)
), s AS (
  SELECT event_type, cents AS x,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
  FROM d
), nn AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY event_type
), base AS (
  SELECT a.event_type, 1 AS t,
         a.x * 1000000 AS l,
         (b.x - a.x) * 1000000 AS b
  FROM s a JOIN s b ON b.event_type = a.event_type AND b.t = 2
  WHERE a.t = 1
), rec AS (
  SELECT * FROM base
  UNION ALL
  SELECT rec.event_type, rec.t + 1,
         (3 * sx.x * 1000000 + 7 * (rec.l + rec.b)) // 10,
         (((3 * sx.x * 1000000 + 7 * (rec.l + rec.b)) // 10 - rec.l)
          + 9 * rec.b) // 10
  FROM rec JOIN s sx ON sx.event_type = rec.event_type AND sx.t = rec.t + 1
)
SELECT rec.event_type, nn.n AS n_days,
       CAST(rec.l AS BIGINT) AS level_micro,
       CAST(rec.b AS BIGINT) AS trend_micro,
       CAST(rec.l + rec.b AS BIGINT) AS forecast_micro
FROM rec JOIN nn ON rec.event_type = nn.event_type
WHERE rec.t = nn.n
"""


@register("tw_holt_double_smoothing", oracle=_HOLT_ORACLE, tags=("timeseries",))
def tw_holt_double_smoothing(spark, sf_dir):
    """HOLT double-exponential smoothing (level+trend, α=0.3 β=0.1 as
    the exact rationals 3/10, 1/10) over each event type's daily close
    series — the first RECURRENT time-series operator in the registry:
    l_t = (3·x_t·10⁶ + 7(l+b)) DIV 10, b_t = ((l_t − l) + 9b) DIV 10,
    carried ENTIRELY in integer micro-cents (both engines share
    truncate-toward-zero DIV — the convention the r9 kappa test
    pinned), initialized l₁ = x₁·10⁶, b₁ = (x₂−x₁)·10⁶. Spark runs the
    recurrence as an aggregate() lambda over the collected per-type
    day array (bounded: 30 days — a keyed agg buffer, never a driver
    loop); the oracle is a recursive CTE — two independent evaluation
    strategies, one exact integer answer. Headroom: micro-cents of a
    daily close stay < 2^53 through ~10⁹× the fixture's daily volume.
    Emits the final level/trend and the one-step forecast, all exact
    BIGINT."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    d = (
        ev.select(
            "event_type",
            F.date_format(F.date_trunc("day", F.col("etime")), "yyyy-MM-dd").alias("day"),
            (F.col("value").cast(VAL) * 100).cast("long").alias("c0"),
        )
        .groupBy("event_type", "day")
        .agg(F.expr("CAST(SUM(c0) DIV COUNT(*) AS BIGINT)").alias("cents"))
    )
    arr = d.groupBy("event_type").agg(
        F.expr("transform(array_sort(collect_list(struct(day, cents))), s -> s.cents)").alias("xs"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    rec = F.expr(
        """
        aggregate(
          slice(xs, 2, size(xs) - 1),
          named_struct(
            'l', element_at(xs, 1) * 1000000L,
            'b', (element_at(xs, 2) - element_at(xs, 1)) * 1000000L),
          (acc, x) -> named_struct(
            'l', (3L * x * 1000000L + 7L * (acc.l + acc.b)) DIV 10L,
            'b', (((3L * x * 1000000L + 7L * (acc.l + acc.b)) DIV 10L - acc.l)
                  + 9L * acc.b) DIV 10L)
        )
        """
    )
    return arr.select(
        "event_type",
        "n_days",
        rec.getField("l").cast("long").alias("level_micro"),
        rec.getField("b").cast("long").alias("trend_micro"),
        (rec.getField("l") + rec.getField("b")).cast("long").alias("forecast_micro"),
    )


# ---------------------------------------------------------------------------
# Round-10 wave 4: dominant period, Page-Hinkley, Hurst R/S.
# ---------------------------------------------------------------------------

_PERIOD_ORACLE = """
WITH d AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              // COUNT(*) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('day', ts)
), r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
  FROM d
), nn AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM r GROUP BY event_type
), lags AS (
  SELECT lag.lag AS lag, a.event_type, a.cents AS x, b.cents AS y
  FROM (SELECT unnest([1,2,3,4,5,6,7,8,9,10]) AS lag) lag
  JOIN r a ON TRUE
  JOIN r b ON b.event_type = a.event_type AND b.t = a.t + lag.lag
), m AS (
  SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS np,
         CAST(SUM(CAST(x AS HUGEINT)) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS syy
  FROM lags GROUP BY event_type, lag
), rk AS (
  SELECT event_type, lag,
         CAST(round(1000000.0 *
           (np * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt((np * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (np * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
           AS BIGINT) AS r_micro
  FROM m
), best AS (
  SELECT event_type, lag, r_micro,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY r_micro DESC, lag) AS rnk
  FROM rk
)
SELECT best.event_type, CAST(best.lag AS BIGINT) AS dominant_lag,
       best.r_micro AS acf_micro, nn.n AS n_days,
       CAST(best.r_micro AS HUGEINT) * best.r_micro * nn.n
         > CAST(4000000000000 AS HUGEINT) AS significant
FROM best JOIN nn ON best.event_type = nn.event_type
WHERE best.rnk = 1
"""


@register("tw_dominant_period_acf", oracle=_PERIOD_ORACLE, tags=("timeseries", "stats"))
def tw_dominant_period_acf(spark, sf_dir):
    """DOMINANT PERIOD per event type: the lag (1..10) with the
    largest ACF of the daily close series — the cheap periodicity
    detector (weekly business rhythm shows as lag 7). Each ACF is
    micro-quantized immediately (the tw_ljung_box rule); the argmax is
    a keyed rank with the (r DESC, lag) pinned tiebreak; the
    significance flag r² · n > 4·10¹² is the |r| > 2/√n whitening test
    as EXACT integer arithmetic (no sqrt enters the comparison).
    Plan: one day rollup, one keyed rank window, 10 shifted
    equi-joins, one keyed argmax window over 10 rows/type."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    d = (
        ev.select(
            "event_type",
            F.date_format(F.date_trunc("day", F.col("etime")), "yyyy-MM-dd").alias("day"),
            (F.col("value").cast(VAL) * 100).cast("long").alias("c0"),
        )
        .groupBy("event_type", "day")
        .agg(F.expr("CAST(SUM(c0) DIV COUNT(*) AS BIGINT)").alias("cents"))
    )
    r = d.select(
        "event_type",
        "cents",
        F.row_number().over(W.partitionBy("event_type").orderBy("day")).alias("t"),
    )
    nn = r.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    lagged = None
    for k in range(1, 11):
        a = r.select("event_type", F.col("cents").alias("x"), (F.col("t") + k).alias("t"))
        b = r.select("event_type", F.col("cents").alias("y"), "t")
        p = a.join(b, ["event_type", "t"]).select(
            "event_type", F.lit(k).cast("long").alias("lag"), "x", "y"
        )
        lagged = p if lagged is None else lagged.unionByName(p)
    m = lagged.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    rk = m.select(
        "event_type",
        "lag",
        F.round(
            1000000.0
            * (
                F.col("np") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / F.sqrt(
                (
                    F.col("np") * F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sx").cast("double")
                )
                * (
                    F.col("np") * F.col("syy").cast("double")
                    - F.col("sy").cast("double") * F.col("sy").cast("double")
                )
            )
        )
        .cast("long")
        .alias("r_micro"),
    )
    w = W.partitionBy("event_type").orderBy(F.col("r_micro").desc(), "lag")
    return (
        rk.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .join(nn, "event_type")
        .select(
            "event_type",
            F.col("lag").alias("dominant_lag"),
            F.col("r_micro").alias("acf_micro"),
            F.col("n").alias("n_days"),
            (
                F.col("r_micro").cast("decimal(38,0)")
                * F.col("r_micro")
                * F.col("n")
                > F.lit(4_000_000_000_000).cast("decimal(38,0)")
            ).alias("significant"),
        )
    )


_PH_ORACLE = """
WITH d AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY date_trunc('day', ts)
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s
  FROM d
), m AS (
  SELECT day,
         SUM(cents * t.n - t.s) OVER (ORDER BY day) AS m_t
  FROM d, t
), ph AS (
  SELECT day, m_t,
         m_t - LEAST(0, MIN(m_t) OVER (ORDER BY day)) AS ph_t
  FROM m
), best AS (
  SELECT day, ph_t, row_number() OVER (ORDER BY ph_t DESC, day) AS rnk
  FROM ph
)
SELECT t.n AS n_days,
       CAST(best.ph_t AS BIGINT) AS max_ph_x_n,
       best.day AS alarm_day
FROM best, t WHERE best.rnk = 1
"""


@register("tw_page_hinkley", oracle=_PH_ORACLE, tags=("timeseries", "stats"))
def tw_page_hinkley(spark, sf_dir):
    """PAGE-HINKLEY upward change detection (Page 1954, δ=0 pinned)
    over the daily revenue series — the sequential CUSUM-style alarm
    in its CLOSED FORM: PH_t = max(0, PH_{t−1} + (x_t − μ)) equals
    M_t − min(0, min_{i≤t} M_i) with M_t = Σ(x_i·n − S) — so no
    recurrence is needed, just a cumulative sum and a running min, all
    EXACT integers at the ×n scale (μ = S/n never divides). The alarm
    point is the max-PH day under the (PH DESC, day) pinned tiebreak.
    The day relation is bounded (30 rows) so the cumulative windows
    are whitelisted single-partition; the raw scan is never windowed.
    tw_cusum_changepoint is the two-sided mean-split detector; this is
    the sequential one-sided monitor twin."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    d = (
        ev.select(
            F.date_format(F.date_trunc("day", "etime"), "yyyy-MM-dd").alias("day"),
            F.round(dec("value", VAL) * 100).cast("long").alias("c0"),
        )
        .groupBy("day")
        .agg(F.sum("c0").cast("long").alias("cents"))
    )
    t = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    m = d.crossJoin(F.broadcast(t)).select(
        "day",
        "n",
        F.sum(F.col("cents") * F.col("n") - F.col("s")).over(w).alias("m_t"),
    )
    ph = m.select(
        "day",
        "n",
        (F.col("m_t") - F.least(F.lit(0), F.min("m_t").over(w))).alias("ph_t"),
    )
    w2 = W.orderBy(F.col("ph_t").desc(), "day")
    return (
        ph.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") == 1)
        .select(
            F.col("n").alias("n_days"),
            F.col("ph_t").cast("long").alias("max_ph_x_n"),
            F.col("day").alias("alarm_day"),
        )
    )


_HURST_ORACLE = """
WITH d AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY date_trunc('day', ts)
), r AS (
  SELECT cents, row_number() OVER (ORDER BY day) AS t FROM d
), blk AS (
  SELECT w.w AS w, (t - 1) // w.w AS blk, t, cents,
         row_number() OVER (PARTITION BY w.w, (t - 1) // w.w ORDER BY t)
           AS pos
  FROM r, (SELECT unnest([5, 10, 15]) AS w) w
), tot AS (
  SELECT w, blk, CAST(COUNT(*) AS BIGINT) AS npos,
         CAST(SUM(cents) AS BIGINT) AS s_b,
         CAST(SUM(CAST(cents AS HUGEINT) * cents) AS BIGINT) AS sxx_b
  FROM blk GROUP BY w, blk
), cum AS (
  SELECT w, blk, pos,
         SUM(cents) OVER (PARTITION BY w, blk ORDER BY pos) AS c_t
  FROM blk
), stats AS (
  SELECT c.w, c.blk, t.s_b, t.sxx_b,
         CAST(MAX(c.c_t * c.w - c.pos * t.s_b) AS BIGINT) AS dmax,
         CAST(MIN(c.c_t * c.w - c.pos * t.s_b) AS BIGINT) AS dmin
  FROM cum c JOIN tot t ON c.w = t.w AND c.blk = t.blk AND t.npos = c.w
  GROUP BY c.w, c.blk, t.s_b, t.sxx_b
), pts AS (
  SELECT w,
         CAST(round(1000000 * ln(
           (GREATEST(dmax, 0) - LEAST(dmin, 0))
           / sqrt(CAST(w AS DOUBLE) * sxx_b - CAST(s_b AS DOUBLE) * s_b)))
           AS BIGINT) AS yq,
         CAST(round(1000000 * ln(CAST(w AS DOUBLE))) AS BIGINT) AS xq
  FROM stats
  WHERE GREATEST(dmax, CAST(0 AS BIGINT)) - LEAST(dmin, CAST(0 AS BIGINT)) > 0
    AND w * sxx_b - s_b * s_b > 0
), ols AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS np,
         CAST(SUM(CAST(xq AS HUGEINT)) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(yq AS HUGEINT)) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(xq AS HUGEINT) * yq) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(xq AS HUGEINT) * xq) AS DECIMAL(38,0)) AS sxx
  FROM pts
)
SELECT np AS n_blocks,
       round((np * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (np * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
             6) AS hurst_exponent
FROM ols
"""


@register("tw_hurst_rescaled_range", oracle=_HURST_ORACLE, tags=("timeseries", "stats"))
def tw_hurst_rescaled_range(spark, sf_dir):
    """HURST EXPONENT by rescaled-range analysis (Hurst 1951; Mandelbrot
    & Wallis 1969) over the daily revenue series: for block sizes w ∈
    {5,10,15}, each full block contributes ln(R/S) where R is the range
    of cumulative mean-deviations — computed EXACTLY as max/min of
    C_t·w − t·S_b (cross-multiplied, no division) with the 0 baseline
    pinned (R = max(D,0) − min(D,0)) — and S the block std; R/S =
    R_w / √(w·Σx² − S_b²) with both arguments exact integers, ONE
    irrational chain per block micro-quantized immediately (the
    Burrows rule), then exact integer OLS of ln(R/S) on ln(w) across
    all blocks. H ≈ 0.5 = random walk; > 0.5 persistent trend. Blocks
    per w are keyed windows; degenerate blocks (zero range/variance)
    drop with the documented guard. Plan: keyed block windows over the
    30-row day relation + one exact OLS reduce."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    d = (
        ev.select(
            F.date_format(F.date_trunc("day", "etime"), "yyyy-MM-dd").alias("day"),
            F.round(dec("value", VAL) * 100).cast("long").alias("c0"),
        )
        .groupBy("day")
        .agg(F.sum("c0").cast("long").alias("cents"))
    )
    r = d.select("cents", F.row_number().over(W.orderBy("day")).alias("t"))
    blk = None
    for w in (5, 10, 15):
        p = r.select(
            F.lit(w).cast("long").alias("w"),
            F.expr(f"CAST((t - 1) DIV {w} AS BIGINT)").alias("blk"),
            "t",
            "cents",
        )
        blk = p if blk is None else blk.unionByName(p)
    wb = W.partitionBy("w", "blk").orderBy("t")
    cum = (
        blk.withColumn("pos", F.row_number().over(wb))
        .withColumn(
            "c_t", F.sum("cents").over(wb.rowsBetween(W.unboundedPreceding, 0))
        )
    )
    tot = blk.groupBy("w", "blk").agg(
        F.count(F.lit(1)).alias("npos"),
        F.sum("cents").cast("long").alias("s_b"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("long")
        .alias("sxx_b"),
    )
    dev = (
        cum.join(tot.filter(F.col("npos") == F.col("w")), ["w", "blk"])
        .select(
            "w",
            "blk",
            "s_b",
            "sxx_b",
            (F.col("c_t") * F.col("w") - F.col("pos") * F.col("s_b")).alias("d_t"),
        )
        .groupBy("w", "blk", "s_b", "sxx_b")
        .agg(F.max("d_t").alias("dmax"), F.min("d_t").alias("dmin"))
    )
    pts = (
        dev.filter(
            (F.greatest("dmax", F.lit(0)) - F.least("dmin", F.lit(0)) > 0)
            & (F.col("w") * F.col("sxx_b") - F.col("s_b") * F.col("s_b") > 0)
        )
        .select(
            F.round(
                1000000
                * F.log(
                    (
                        F.greatest("dmax", F.lit(0)) - F.least("dmin", F.lit(0))
                    )
                    / F.sqrt(
                        F.col("w").cast("double") * F.col("sxx_b")
                        - F.col("s_b").cast("double") * F.col("s_b")
                    )
                )
            )
            .cast("long")
            .alias("yq"),
            F.round(1000000 * F.log(F.col("w").cast("double")))
            .cast("long")
            .alias("xq"),
        )
    )
    ols = pts.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum(F.col("xq").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("yq").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("xq").cast("decimal(38,0)") * F.col("yq")).alias("sxy"),
        F.sum(F.col("xq").cast("decimal(38,0)") * F.col("xq")).alias("sxx"),
    )
    return ols.select(
        F.col("np").alias("n_blocks"),
        F.round(
            (
                F.col("np") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                F.col("np") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            ),
            6,
        ).alias("hurst_exponent"),
    )
