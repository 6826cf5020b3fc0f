"""Window-function surface (SURVEY §2.B "Window functions"): ranking,
analytic, and frame-based windows. The reference needs exactly this
family to express "current state from a CDC log" (the MERGE TODO at
reference consumer.py:76) — the CDC-specific windows live in
cdc_queries.py; these are the general-purpose ones.

Scale: every window here partitions by a real key (custkey / nation /
user) so state is bounded per key. The single global-window query
(ntile over all customers) is flagged in its docstring — at 100 TB that
becomes a repartitionByRange + per-range rank, not one partition.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..tables import BAL, MONEY, dec, load_table
from . import register

_TOPK_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM ranked WHERE rn <= 3
"""


@register("win_top3_orders_per_customer", oracle=_TOPK_ORACLE, tags=("window", "topk"))
def win_top3_orders_per_customer(spark, sf_dir):
    """Top-k per group via row_number — the scalable top-k (no global
    sort; one shuffle on the partition key)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


_RANKS_ORACLE = """
SELECT s_nationkey, s_suppkey,
       rank()         OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rnk,
       dense_rank()   OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS drnk,
       percent_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS prnk,
       cume_dist()    OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS cdist
FROM supplier
"""


@register("win_supplier_ranks", oracle=_RANKS_ORACLE, tags=("window",))
def win_supplier_ranks(spark, sf_dir):
    """rank / dense_rank / percent_rank / cume_dist in one window."""
    supp = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc())
    return supp.select(
        "s_nationkey",
        "s_suppkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend
FROM orders
"""


@register("win_running_spend", oracle=_RUNNING_ORACLE, tags=("window", "frame"))
def win_running_spend(spark, sf_dir):
    """Cumulative sum with an explicit ROWS frame (exact decimal running
    state, cast at the edge)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice", MONEY)).over(w).cast("double").alias("running_spend"),
    )


_TRAILING_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day_num,
         o_totalprice
  FROM orders
)
SELECT o_custkey, o_orderkey,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day_num
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_orders_30d,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)))
            OVER (PARTITION BY o_custkey ORDER BY day_num
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
FROM o
"""


@register("win_trailing_30d_spend", oracle=_TRAILING_ORACLE, tags=("window", "frame", "range"))
def win_trailing_30d_spend(spark, sf_dir):
    """RANGE frame over integer day numbers — a trailing 30-day window
    per customer (event-time logic as a batch window)."""
    orders = load_table(spark, sf_dir, "orders")
    day_num = F.unix_date(F.col("o_orderdate").cast("date")).alias("day_num")
    o = orders.select("o_custkey", "o_orderkey", day_num, "o_totalprice")
    w = W.partitionBy("o_custkey").orderBy("day_num").rangeBetween(-30, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
        F.sum(dec("o_totalprice", MONEY)).over(w).cast("double").alias("spend_30d"),
    )


_NTILE_ORACLE = """
SELECT c_custkey,
       ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS wealth_quartile
FROM customer
"""


@register("win_ntile_wealth_quartile", oracle=_NTILE_ORACLE, tags=("window",))
def win_ntile_wealth_quartile(spark, sf_dir):
    """ntile over a global ordering. NOTE: a single-partition window —
    fine for a dimension table; for a 100 TB fact the equivalent is
    repartitionByRange + percent_rank, or approx quantile bucketing."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey", F.ntile(4).over(w).alias("wealth_quartile")
    )


_FIRST_LAST_ORACLE = """
SELECT DISTINCT user_id,
       first_value(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS first_value_seen,
       last_value(value)  OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_value_seen,
       nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_value_seen
FROM events
"""


@register("win_first_last_per_user", oracle=_FIRST_LAST_ORACLE, tags=("window", "frame"))
def win_first_last_per_user(spark, sf_dir):
    """first_value / last_value / nth_value with a full-partition frame,
    deduped to one row per key."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.expr("ts DIV 1000"), "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("value").over(w).alias("first_value_seen"),
        F.last("value").over(w).alias("last_value_seen"),
        F.nth_value("value", 2).over(w).alias("second_value_seen"),
    ).distinct()


# ---------------------------------------------------------------------------
# Distribution-rank analytics: cume_dist / percent_rank (round 5)
# ---------------------------------------------------------------------------

_DISTRANK_ORACLE = """
SELECT s_suppkey, s_nationkey,
       CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       ntile(10) OVER w AS decile
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY CAST(s_acctbal AS DECIMAL(12,2)), s_suppkey)
"""


@register("win_distribution_ranks", oracle=_DISTRANK_ORACLE, tags=("window", "ranking"))
def win_distribution_ranks(spark, sf_dir):
    """The remaining ranking-family analytics in one pass:
    percent_rank, cume_dist, and ntile deciles of supplier balance
    within each nation — all three share ONE window (one shuffle on
    s_nationkey, one per-partition sort). percent_rank/cume_dist are
    ratios of BIGINT ranks, identical doubles in both engines; the
    decimal-cast order key + suppkey tiebreak makes the total order
    (and therefore every rank) engine-stable."""
    bal = dec("s_acctbal", BAL)
    w = W.partitionBy("s_nationkey").orderBy(bal, "s_suppkey")
    return load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        bal.cast("double").alias("bal"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )


_ROLLING_SLOPE_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(round(CAST(o_totalprice AS DECIMAL(15,2)) * 100) AS BIGINT) AS y
  FROM orders
), s AS (
  SELECT o_custkey, o_orderkey, x, y,
         COUNT(*) OVER w AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(y) OVER w AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx
  FROM o
  WINDOW w AS (PARTITION BY o_custkey ORDER BY x
               RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
)
SELECT o_custkey, o_orderkey, CAST(n AS BIGINT) AS n_win,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (n * sxx - sx * sx), 4) AS slope_cents_per_day
FROM s
WHERE n * sxx - sx * sx > 0
"""


@register("win_rolling_slope", oracle=_ROLLING_SLOPE_ORACLE, tags=("window", "frame", "stats"))
def win_rolling_slope(spark, sf_dir):
    """ROLLING REGRESSION: per customer, the OLS slope of spend vs day
    over a trailing 90-day RANGE frame — the per-entity trend feature
    (spend accelerating or decaying?) that static agg_corr_regression
    cannot express. All five sufficient statistics (n, Sx, Sy, Sxy,
    Sxx) accumulate as EXACT integer window sums; the slope is the one
    closed-form float per row, on identical integers in both engines.
    Windows whose x-variance is zero (all orders on one day — always
    true for n_win = 1) are excluded by the exact integer predicate
    n*Sxx - Sx^2 > 0 rather than emitting an engine-specific
    NULL/NaN.

    Plan: ONE key shuffle; all five window sums share the same frame,
    so Catalyst evaluates them in a single Window operator pass."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        "o_orderkey",
        F.unix_date(F.col("o_orderdate").cast("date")).cast("long").alias("x"),
        F.round(dec("o_totalprice", MONEY) * 100).cast("long").alias("y"),
    )
    w = W.partitionBy("o_custkey").orderBy("x").rangeBetween(-90, 0)
    s = o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.filter(denom > 0).select(
        "o_custkey",
        "o_orderkey",
        F.col("n").cast("long").alias("n_win"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / denom,
            4,
        ).alias("slope_cents_per_day"),
    )


# ---------------------------------------------------------------------------
# Round-8: gaps-and-islands — contiguous-run reconstruction, the classic
# sequence-analytics shape.
# ---------------------------------------------------------------------------

_ISLANDS_ORACLE = """
WITH s AS (
  SELECT user_id, event_id,
         event_id - row_number() OVER (PARTITION BY user_id ORDER BY event_id)
           AS grp
  FROM events
)
SELECT user_id,
       CAST(MIN(event_id) AS BIGINT) AS island_start,
       CAST(MAX(event_id) AS BIGINT) AS island_end,
       CAST(COUNT(*) AS BIGINT) AS island_len
FROM s GROUP BY user_id, grp
HAVING COUNT(*) >= 2
"""


@register("win_gaps_islands", oracle=_ISLANDS_ORACLE, tags=("window", "cdc"))
def win_gaps_islands(spark, sf_dir):
    """GAPS-AND-ISLANDS: reconstruct every maximal run of CONSECUTIVE
    change ids per key (the id - row_number() constant-difference
    trick) and report islands of length >= 2 — the inverse view of
    cdc_sequence_gap_detect: that query lists what's MISSING, this one
    lists what's intact, which is what a backfill planner consumes
    (re-snapshot the complement of the islands). One per-key window
    (the key shuffle only) + one keyed rollup; exact integers."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    s = ev.select(
        "user_id",
        "event_id",
        (F.col("event_id") - F.row_number().over(w)).alias("grp"),
    )
    return (
        s.groupBy("user_id", "grp")
        .agg(
            F.min("event_id").cast("long").alias("island_start"),
            F.max("event_id").cast("long").alias("island_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .filter(F.col("island_len") >= 2)
        .drop("grp")
    )


_ROLLING_MEDIAN_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events
), r AS (
  SELECT user_id, event_id, cents,
         row_number() OVER w AS rn,
         list_sort(list(cents) OVER (PARTITION BY user_id
                                     ORDER BY ts_us, event_id
                                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
           AS win
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id, event_id, CAST(win[3] AS BIGINT) AS med5_cents
FROM r WHERE rn >= 5
"""


@register("win_rolling_median", oracle=_ROLLING_MEDIAN_ORACLE, tags=("window",))
def win_rolling_median(spark, sf_dir):
    """EXACT rolling median of the last 5 values per user — the robust
    rolling smoother (tw_ewma_trailing and the SMA family are
    mean-based and outlier-dragged; the median is the order statistic
    the same dashboards switch to for spiky series). Spark has no
    median window function, so the frame is materialized per row
    (collect_list over ROWS 4 PRECEDING, a constant 5-element array),
    sorted JVM-side, and indexed — exact integers, no interpolation
    (odd frame), warm-up rows excluded by row_number. Per-row state is
    O(frame), so this is the bounded-frame pattern that scales: the
    window shuffles once on the key; frames never span partitions."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts_us"), F.col("event_id"))
    wf = w.rowsBetween(-4, 0)
    return (
        ev.select(
            "user_id",
            "event_id",
            (F.col("value").cast("decimal(12,2)") * 100).cast("long").alias("cents"),
            F.expr("ts DIV 1000").alias("ts_us"),
        )
        .select(
            "user_id",
            "event_id",
            F.row_number().over(w).alias("rn"),
            F.array_sort(F.collect_list("cents").over(wf)).alias("win"),
        )
        .filter(F.col("rn") >= 5)
        .select(
            "user_id",
            "event_id",
            F.element_at("win", 3).cast("long").alias("med5_cents"),
        )
    )


_RANK_SHIFT_ORACLE = """
WITH rev AS (
  SELECT EXTRACT(year FROM l_shipdate) AS yr, l_suppkey AS suppkey,
         CAST(SUM(round(CAST(l_extendedprice AS DECIMAL(15,2)) * 100))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY 1, 2
), rk AS (
  SELECT yr, suppkey, cents,
         row_number() OVER (PARTITION BY yr
                            ORDER BY cents DESC, suppkey) AS rnk
  FROM rev
), sh AS (
  SELECT yr, suppkey, rnk,
         lag(rnk) OVER (PARTITION BY suppkey ORDER BY yr) AS prev_rnk
  FROM rk
)
SELECT CAST(yr AS BIGINT) AS yr, suppkey,
       CAST(rnk AS BIGINT) AS rnk,
       CAST(prev_rnk AS BIGINT) AS prev_rnk,
       CAST(prev_rnk - rnk AS BIGINT) AS rank_gain
FROM sh WHERE prev_rnk IS NOT NULL AND ABS(prev_rnk - rnk) >= 10
"""


@register("win_rank_shift_leaderboard", oracle=_RANK_SHIFT_ORACLE, tags=("window",))
def win_rank_shift_leaderboard(spark, sf_dir):
    """Leaderboard MOVEMENT: each supplier's revenue rank per ship
    year, and its shift vs the previous year — the two-window
    composition (rank within period, lag across periods for the same
    entity) every "top movers" report is built from; emits only moves
    of >= 10 places. Revenue is exact integer cents; rank uses
    row_number with a total tiebreak so both engines agree on ties.
    Plan: one keyed rollup + two window passes, each partitioned
    (by year, then by supplier) — no single-partition window; rank
    within a year is the classic per-period sort a cluster handles
    per-partition after one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy(
            F.year("l_shipdate").cast("long").alias("yr"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.sum(F.round(dec("l_extendedprice", MONEY) * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    wr = W.partitionBy("yr").orderBy(F.desc("cents"), F.asc("suppkey"))
    ws = W.partitionBy("suppkey").orderBy("yr")
    return (
        rev.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .withColumn("prev_rnk", F.lag("rnk").over(ws).cast("long"))
        .filter(
            F.col("prev_rnk").isNotNull()
            & (F.abs(F.col("prev_rnk") - F.col("rnk")) >= 10)
        )
        .select(
            "yr",
            "suppkey",
            "rnk",
            "prev_rnk",
            (F.col("prev_rnk") - F.col("rnk")).cast("long").alias("rank_gain"),
        )
    )


_RUNNING_DISTINCT_ORACLE = """
WITH fs AS (
  SELECT event_type, user_id,
         MIN(strftime(date_trunc('day', ts), '%Y-%m-%d')) AS first_day
  FROM events GROUP BY event_type, user_id
), daily AS (
  SELECT event_type, first_day AS day, CAST(COUNT(*) AS BIGINT) AS n_new
  FROM fs GROUP BY event_type, first_day
)
SELECT event_type, day, n_new,
       CAST(SUM(n_new) OVER (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_distinct_users
FROM daily
"""


@register("win_running_distinct_users", oracle=_RUNNING_DISTINCT_ORACLE, tags=("window", "agg"))
def win_running_distinct_users(spark, sf_dir):
    """CUMULATIVE DISTINCT user count per event type by day — the
    "uniques to date" growth curve. The naive formulation (distinct
    over an unbounded window frame) carries a per-row set that grows
    with history; the scale-correct identity used here is FIRST-TOUCH
    DEDUP: a user counts on exactly their first day, so the curve is a
    plain running SUM of per-day first-appearance counts — state
    O(days), not O(users), and exact. Two keyed rollups + one
    windowed cumulative sum partitioned by series."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    fs = ev.groupBy("event_type", "user_id").agg(
        F.min(
            F.date_format(F.date_trunc("day", F.col("etime")), "yyyy-MM-dd")
        ).alias("day")
    )
    daily = fs.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return daily.select(
        "event_type",
        "day",
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("cumulative_distinct_users"),
    )


_SKYLINE_ORACLE = """
WITH o AS (
  SELECT o_orderkey,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(round(CAST(o_totalprice AS DECIMAL(15,2)) * 100) AS BIGINT)
           AS cents,
         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day_num
  FROM orders
), s AS (
  SELECT o_orderkey, yr, cents, CAST(day_num AS BIGINT) AS day_num,
         MAX(day_num) OVER (PARTITION BY yr
                            ORDER BY cents DESC, day_num DESC, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_day_before
  FROM o
)
SELECT o_orderkey, yr, cents, day_num
FROM s
WHERE best_day_before IS NULL OR day_num > best_day_before
"""


@register("win_skyline_pareto", oracle=_SKYLINE_ORACLE, tags=("window", "topk"))
def win_skyline_pareto(spark, sf_dir):
    """2-D SKYLINE (Pareto frontier; Börzsönyi et al., ICDE 2001):
    orders not dominated in (price, recency) — no other order is both
    more expensive AND newer. The classic multi-criteria shortlist
    operator, computed by the sort-scan identity: ordered by price
    descending, a point is on the frontier iff its date beats the
    running max of every earlier (i.e. higher-priced) point — ONE
    window pass instead of the naive O(n²) dominance join. Total
    tiebreak (price, date, key) makes equal-price chains
    deterministic in both engines; exact integers throughout. The
    skyline is computed PER ORDER-YEAR (the "best of each period"
    report), so the window partitions on a real key and distributes;
    a single GLOBAL skyline at 100 TB would instead range-repartition
    by price and merge the |partitions|-sized per-range frontiers (the
    global_index two-pass shape) — documented, not needed here."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.round(dec("o_totalprice", MONEY) * 100).cast("long").alias("cents"),
        F.unix_date(F.col("o_orderdate").cast("date")).cast("long").alias("day_num"),
    )
    w = (
        W.partitionBy("yr")
        .orderBy(F.desc("cents"), F.desc("day_num"), F.asc("o_orderkey"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    s = o.withColumn("best_day_before", F.max("day_num").over(w))
    return s.filter(
        F.col("best_day_before").isNull()
        | (F.col("day_num") > F.col("best_day_before"))
    ).select("o_orderkey", "yr", "cents", "day_num")
