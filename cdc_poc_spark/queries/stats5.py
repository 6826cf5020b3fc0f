"""Round-10 wave 8 — Mood's median test, Poisson overdispersion,
seasonal (weekday-stratified) Mann-Kendall, SMA crossover signals,
log-loss proper scoring, the regression-metrics eval family
(MAE/RMSE/R²), discrete power-law degree MLE, and per-label
silhouette for embedding clusters.

Engine capability per the north star; the standing exactness
discipline: exact integer counts/cents, DECIMAL(38)/HUGEINT moments,
per-term micro-quantized ln/s values summed as exact BIGINTs
(summation-order-free), truncating shared integer division, one float
expression at the edge, round(6).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..tables import VAL, dec, load_table
from . import register
from .profiling import _COORDER_EDGES_CTE, _coorder_part_edges
from .stats3 import _DAILY_SQL, _daily

# ---------------------------------------------------------------------------
# Mood's median test across event types.
# ---------------------------------------------------------------------------

_MOOD_ORACLE = """
WITH b AS (
  SELECT event_type AS g,
         CAST(round(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS x
  FROM events
), roll AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY x
), med AS (
  SELECT x AS med_c FROM (
    SELECT x, SUM(c) OVER (ORDER BY x) AS cum,
           (SELECT SUM(c) FROM roll) AS n
    FROM roll
  ) WHERE cum >= (n + 1) // 2 ORDER BY x LIMIT 1
), cells AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CASE WHEN x > med.med_c THEN 1 ELSE 0 END) AS BIGINT) AS o_above
  FROM b CROSS JOIN med GROUP BY g
), tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(o_above) AS BIGINT) AS col_above,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM cells
)
SELECT tot.n AS n_total, med.med_c AS median_cents,
       CAST(tot.k - 1 AS BIGINT) AS df,
       CAST(SUM(
         CAST(round(1000000.0
           * CAST(CAST(o_above * tot.n - n_g * tot.col_above AS HUGEINT)
                  * (o_above * tot.n - n_g * tot.col_above) AS DOUBLE)
           / (CAST(tot.n AS DOUBLE) * n_g * tot.col_above)) AS BIGINT)
         + CAST(round(1000000.0
           * CAST(CAST((n_g - o_above) * tot.n - n_g * (tot.n - tot.col_above)
                       AS HUGEINT)
                  * ((n_g - o_above) * tot.n - n_g * (tot.n - tot.col_above))
                  AS DOUBLE)
           / (CAST(tot.n AS DOUBLE) * n_g * (tot.n - tot.col_above)))
           AS BIGINT)) AS BIGINT) AS chi2_micro
FROM cells CROSS JOIN tot CROSS JOIN med
GROUP BY tot.n, med.med_c, tot.k
"""


@register("agg_mood_median_test", oracle=_MOOD_ORACLE, tags=("agg", "stats"))
def agg_mood_median_test(spark, sf_dir):
    """MOOD's median test: does each event type put the same share of
    its values above the GRAND lower median? The k-group location
    test that needs only above/below counts — maximally robust, the
    contingency complement of Kruskal-Wallis (ranks) and ANOVA
    (means). χ² over the 2×k table with the exact-median split.

    Exactness: the grand median is an exact lower-median order
    statistic over the VALUE ROLLUP (distinct cents — a bounded
    value-domain relation, the agg_weighted_median window pattern,
    whitelisted); every cell's (O·N − r·c)² numerator is exact
    DECIMAL-cast; each of the 2k χ² terms is micro-quantized to an
    exact BIGINT so the sum is order-free. df = k−1 exact.

    Scale: one value rollup + one conditional-count aggregate per
    group; the window touches only distinct values."""
    b = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        F.round(dec("value", VAL) * 100).cast("long").alias("x"),
    )
    roll = b.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cum = roll.select(
        "x",
        F.sum("c").over(W.orderBy("x").rowsBetween(W.unboundedPreceding, 0)).alias(
            "cum"
        ),
        F.sum("c").over(W.partitionBy()).alias("n"),
    )
    med = (
        cum.filter(F.expr("cum >= (n + 1) DIV 2"))
        .orderBy("x")
        .limit(1)
        .select(F.col("x").alias("med_c"))
    )
    cells = (
        b.crossJoin(F.broadcast(med))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum((F.col("x") > F.col("med_c")).cast("long")).alias("o_above"),
        )
    )
    tot = cells.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("o_above").cast("long").alias("col_above"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    term_above = (
        "CAST(round(1000000.0"
        " * CAST(CAST(o_above * n - n_g * col_above AS DECIMAL(38,0))"
        " * (o_above * n - n_g * col_above) AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * n_g * col_above)) AS BIGINT)"
    )
    term_below = (
        "CAST(round(1000000.0"
        " * CAST(CAST((n_g - o_above) * n - n_g * (n - col_above)"
        " AS DECIMAL(38,0))"
        " * ((n_g - o_above) * n - n_g * (n - col_above)) AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * n_g * (n - col_above))) AS BIGINT)"
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(med))
        .groupBy("n", "med_c", "k")
        .agg(
            F.sum(F.expr(f"{term_above} + {term_below}"))
            .cast("long")
            .alias("chi2_micro")
        )
        .select(
            F.col("n").alias("n_total"),
            F.col("med_c").alias("median_cents"),
            F.expr("CAST(k - 1 AS BIGINT)").alias("df"),
            "chi2_micro",
        )
    )


# ---------------------------------------------------------------------------
# Poisson overdispersion test on daily event counts.
# ---------------------------------------------------------------------------

_POISSON_ORACLE = """
WITH d AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY date_trunc('day', ts)
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(COUNT(*) * SUM(c * c) - SUM(c) * SUM(c) AS BIGINT) AS disp_num
  FROM d
)
SELECT n_days, n_events, disp_num,
       round(CAST(disp_num AS DOUBLE) / n_events, 6) AS chi2,
       round(CAST(disp_num AS DOUBLE) / ((n_days - 1.0) * n_events), 6)
         AS dispersion_index
FROM m
"""


@register("agg_poisson_dispersion_test", oracle=_POISSON_ORACLE, tags=("agg", "stats", "timeseries"))
def agg_poisson_dispersion_test(spark, sf_dir):
    """POISSON overdispersion (conditional χ²/Fisher index) on daily
    event COUNTS: under a homogeneous Poisson arrival process the
    variance equals the mean; D = s²/c̄ > 1 flags burstiness, the
    arrival-process twin of tw_interarrival_stats. χ² = Σ(c−c̄)²/c̄ =
    (nΣc² − (Σc)²)/Σc with df = n−1.

    Exactness: the dispersion numerator nΣc² − (Σc)² is an exact
    BIGINT from the day-count rollup; χ² and the index are single
    float divisions, round(6). Scale: one map-side-combinable
    day-count rollup + one aggregate; NO window anywhere."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    d = (
        ev.groupBy(F.date_trunc("day", "etime").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("n_events"),
        F.expr(
            "CAST(COUNT(*) * SUM(c * c) - SUM(c) * SUM(c) AS BIGINT)"
        ).alias("disp_num"),
        F.expr(
            "round(CAST(COUNT(*) * SUM(c * c) - SUM(c) * SUM(c) AS DOUBLE)"
            " / SUM(c), 6)"
        ).alias("chi2"),
        F.expr(
            "round(CAST(COUNT(*) * SUM(c * c) - SUM(c) * SUM(c) AS DOUBLE)"
            " / ((COUNT(*) - 1.0) * SUM(c)), 6)"
        ).alias("dispersion_index"),
    )


# ---------------------------------------------------------------------------
# Seasonal (weekday-stratified) Mann-Kendall.
# ---------------------------------------------------------------------------

_SEASONAL_MK_ORACLE = """
WITH d AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT)
           AS day_idx,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY date_trunc('day', ts)
), r AS (
  SELECT cents, (day_idx + 4) % 7 AS wd,
         row_number() OVER (PARTITION BY (day_idx + 4) % 7
                            ORDER BY day_idx) AS t
  FROM d
), s AS (
  SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                       WHEN b.cents < a.cents THEN -1 ELSE 0 END)
              AS BIGINT) AS s_total
  FROM r a JOIN r b ON a.wd = b.wd AND b.t > a.t
), tie AS (
  SELECT wd, CAST(SUM(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT) AS tie_w
  FROM (SELECT wd, cents, COUNT(*) AS tg FROM r GROUP BY wd, cents
        HAVING COUNT(*) > 1)
  GROUP BY wd
), var18 AS (
  SELECT CAST(SUM(nw.n_w * (nw.n_w - 1) * (2 * nw.n_w + 5)
               - COALESCE(tie.tie_w, 0)) AS BIGINT) AS var_s_x18,
         CAST(SUM(nw.n_w) AS BIGINT) AS n_days
  FROM (SELECT wd, CAST(COUNT(*) AS BIGINT) AS n_w FROM r GROUP BY wd) nw
  LEFT JOIN tie ON tie.wd = nw.wd
)
SELECT var18.n_days, s.s_total, var18.var_s_x18,
       round(CASE WHEN s.s_total > 0 THEN (s.s_total - 1)
                  WHEN s.s_total < 0 THEN (s.s_total + 1) ELSE 0 END
             / sqrt(var18.var_s_x18 / 18.0), 6) AS z_score
FROM s CROSS JOIN var18
"""


@register("tw_seasonal_mann_kendall", oracle=_SEASONAL_MK_ORACLE, tags=("timeseries", "stats"))
def tw_seasonal_mann_kendall(spark, sf_dir):
    """SEASONAL Mann-Kendall (Hirsch & Slack 1984): the trend test
    computed WITHIN each weekday stratum and summed — a weekly cycle
    can bury a real trend in plain MK (Monday-vs-Friday pairs carry
    seasonality, not trend); stratifying compares only like-with-like
    days. S = Σ_w S_w, Var·18 = Σ_w [n_w(n_w−1)(2n_w+5) − ties_w],
    z with the standard continuity correction.

    Weekday = (epoch_day + 4) % 7 — the same epoch-Thursday
    convention the retention/seasonal queries pin (integer micros,
    no locale-dependent dayofweek()).

    Exactness: S, the per-stratum tie terms, and 18·Var are exact
    BIGINTs; z is one float. The pairwise relation is Σ_w days_w² ≈
    days²/7 — bounded by the calendar. Windows partition BY WEEKDAY
    (the final scalar aggregate is the plan's one SinglePartition —
    whitelisted)."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    d = (
        ev.select(
            F.expr("CAST(ts_us DIV 86400000000 AS BIGINT)").alias("day_idx"),
            F.round(dec("value", VAL) * 100).cast("long").alias("c0"),
        )
        .groupBy("day_idx")
        .agg(F.sum("c0").cast("long").alias("cents"))
    )
    r = d.select(
        "cents",
        F.expr("(day_idx + 4) % 7").alias("wd"),
        F.row_number()
        .over(W.partitionBy(F.expr("(day_idx + 4) % 7")).orderBy("day_idx"))
        .alias("t"),
    )
    a = r.select(
        F.col("wd").alias("wa"), F.col("cents").alias("ca"), F.col("t").alias("ta")
    )
    bb = r.select(
        F.col("wd").alias("wb"), F.col("cents").alias("cb"), F.col("t").alias("tb")
    )
    s = (
        a.join(
            F.broadcast(bb),
            (F.col("wa") == F.col("wb")) & (F.col("tb") > F.col("ta")),
        )
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_total")
        )
    )
    ties = (
        r.groupBy("wd", "cents")
        .agg(F.count(F.lit(1)).alias("tg"))
        .filter(F.col("tg") > 1)
        .groupBy("wd")
        .agg(
            F.sum(F.expr("tg * (tg - 1) * (2 * tg + 5)")).cast("long").alias(
                "tie_w"
            )
        )
    )
    var18 = (
        r.groupBy("wd")
        .agg(F.count(F.lit(1)).cast("long").alias("n_w"))
        .join(ties, "wd", "left")
        .agg(
            F.sum(
                F.expr(
                    "n_w * (n_w - 1) * (2 * n_w + 5) - COALESCE(tie_w, 0)"
                )
            )
            .cast("long")
            .alias("var_s_x18"),
            F.sum("n_w").cast("long").alias("n_days"),
        )
    )
    return s.crossJoin(F.broadcast(var18)).select(
        "n_days",
        "s_total",
        "var_s_x18",
        F.expr(
            "round((CASE WHEN s_total > 0 THEN s_total - 1"
            " WHEN s_total < 0 THEN s_total + 1 ELSE 0 END)"
            " / sqrt(var_s_x18 / 18.0), 6)"
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# SMA(5) x SMA(20) crossover signals.
# ---------------------------------------------------------------------------

_SMA_ORACLE = _DAILY_SQL + """
, s AS (
  SELECT t,
         SUM(cents) OVER (ORDER BY t ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
           AS s5,
         COUNT(*) OVER (ORDER BY t ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
           AS w5,
         SUM(cents) OVER (ORDER BY t ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
           AS s20,
         COUNT(*) OVER (ORDER BY t ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
           AS w20
  FROM r
), sig AS (
  SELECT t,
         CASE WHEN 4 * s5 > s20 THEN 1 WHEN 4 * s5 < s20 THEN -1 ELSE 0 END
           AS sgn
  FROM s WHERE w5 = 5 AND w20 = 20
), x AS (
  SELECT sgn, lag(sgn) OVER (ORDER BY t) AS prev FROM sig
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_valid_days,
       CAST(SUM(CASE WHEN prev < 0 AND sgn > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_golden_cross,
       CAST(SUM(CASE WHEN prev > 0 AND sgn < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_death_cross
FROM x
"""


@register("tw_sma_crossover_signals", oracle=_SMA_ORACLE, tags=("timeseries", "analytics"))
def tw_sma_crossover_signals(spark, sf_dir):
    """SMA(5)/SMA(20) CROSSOVER detector on daily revenue — the
    classic momentum signal (golden cross: short average breaks
    above long; death cross: below), joining tw_bollinger_bands and
    tw_ewma_trailing in the technical-indicator family but emitting
    the EVENT COUNTS, not the curves.

    Exactness: the comparison SMA5 vs SMA20 is cross-multiplied to
    4·Σ₅cents vs Σ₂₀cents — exact BIGINTs, no division anywhere;
    signals and cross counts are exact integers. ZERO float ops.
    Frames run over the bounded day relation (whitelisted); only
    days with FULL 5- and 20-day windows are signal-eligible
    (pinned)."""
    r = _daily(spark, sf_dir)
    w5 = W.orderBy("t").rowsBetween(-4, 0)
    w20 = W.orderBy("t").rowsBetween(-19, 0)
    s = r.select(
        "t",
        F.sum("cents").over(w5).alias("s5"),
        F.count(F.lit(1)).over(w5).alias("c5"),
        F.sum("cents").over(w20).alias("s20"),
        F.count(F.lit(1)).over(w20).alias("c20"),
    ).filter((F.col("c5") == 5) & (F.col("c20") == 20))
    sig = s.select(
        "t",
        F.expr(
            "CASE WHEN 4 * s5 > s20 THEN 1 WHEN 4 * s5 < s20 THEN -1"
            " ELSE 0 END"
        ).alias("sgn"),
    )
    x = sig.select("sgn", F.lag("sgn").over(W.orderBy("t")).alias("prev"))
    return x.agg(
        F.count(F.lit(1)).cast("long").alias("n_valid_days"),
        F.sum(F.when((F.col("prev") < 0) & (F.col("sgn") > 0), 1).otherwise(0))
        .cast("long")
        .alias("n_golden_cross"),
        F.sum(F.when((F.col("prev") > 0) & (F.col("sgn") < 0), 1).otherwise(0))
        .cast("long")
        .alias("n_death_cross"),
    )


# ---------------------------------------------------------------------------
# Log-loss (cross-entropy) of the calibrated score.
# ---------------------------------------------------------------------------

_LOGLOSS_ORACLE = """
WITH b AS (
  SELECT CAST(round(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents,
         CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS y
  FROM events
), mx AS (
  SELECT MAX(cents) AS max_c FROM b
), roll AS (
  SELECT cents, CAST(SUM(y) AS BIGINT) AS n1,
         CAST(SUM(1 - y) AS BIGINT) AS n0
  FROM b GROUP BY cents
), terms AS (
  SELECT
    CAST(SUM(n1 + n0) AS BIGINT) AS n_total,
    CAST(SUM(n1) AS BIGINT) AS n_pos,
    CAST(SUM(n1 * CAST(round(1000000 * ln((cents + 1.0) / (max_c + 2.0)))
                       AS BIGINT)
             + n0 * CAST(round(1000000 * ln((max_c + 1.0 - cents)
                                            / (max_c + 2.0))) AS BIGINT))
         AS BIGINT) AS total_micro
  FROM roll CROSS JOIN mx
)
SELECT n_total, n_pos,
       CAST((0 - total_micro) // n_total AS BIGINT) AS logloss_micro_nats,
       CAST(round(-1000000.0 * (CAST(n_pos AS DOUBLE) / n_total
                  * ln(CAST(n_pos AS DOUBLE) / n_total)
                  + (1.0 - CAST(n_pos AS DOUBLE) / n_total)
                  * ln(1.0 - CAST(n_pos AS DOUBLE) / n_total))) AS BIGINT)
         AS base_entropy_micro_nats
FROM terms
"""


@register("ml_log_loss_calibrated", oracle=_LOGLOSS_ORACLE, tags=("llm", "ml", "eval"))
def ml_log_loss_calibrated(spark, sf_dir):
    """LOG-LOSS (cross-entropy) of the Laplace-calibrated score p =
    (cents+1)/(max_c+2) against the purchase|signup label — the
    second PROPER SCORING RULE beside ml_brier_decomposition (Brier
    is quadratic and bounded; log-loss is the likelihood view and
    punishes confident errors without bound), with the label-prior
    entropy as the skill baseline (a model only adds value below it).

    Exactness: per-DISTINCT-CENTS ln p and ln(1−p) are micro-quantized
    to exact BIGINTs ONCE on the value rollup (distinct cents — a
    bounded value domain), then count-weighted and summed as exact
    integers (order-free); logloss = (−total) DIV N exact micro-nats.
    The Laplace clamp makes p ∈ (0,1) at the domain edges (pinned).

    Scale: one rollup on distinct cents + a broadcast 1-row max; the
    ln table is |distinct values| rows, never |rows|."""
    b = load_table(spark, sf_dir, "events").select(
        F.round(dec("value", VAL) * 100).cast("long").alias("cents"),
        F.col("event_type").isin("purchase", "signup").cast("int").alias("y"),
    )
    mx = b.agg(F.max("cents").alias("max_c"))
    roll = b.groupBy("cents").agg(
        F.sum("y").cast("long").alias("n1"),
        F.sum(1 - F.col("y")).cast("long").alias("n0"),
    )
    terms = (
        roll.crossJoin(F.broadcast(mx))
        .agg(
            F.sum(F.expr("n1 + n0")).cast("long").alias("n_total"),
            F.sum("n1").cast("long").alias("n_pos"),
            F.sum(
                F.expr(
                    "n1 * CAST(round(1000000 * ln((cents + 1.0) / (max_c + 2.0)))"
                    " AS BIGINT)"
                    " + n0 * CAST(round(1000000 * ln((max_c + 1.0 - cents)"
                    " / (max_c + 2.0))) AS BIGINT)"
                )
            )
            .cast("long")
            .alias("total_micro"),
        )
    )
    return terms.select(
        "n_total",
        "n_pos",
        F.expr("CAST((0 - total_micro) DIV n_total AS BIGINT)").alias(
            "logloss_micro_nats"
        ),
        F.expr(
            "CAST(round(-1000000.0 * (CAST(n_pos AS DOUBLE) / n_total"
            " * ln(CAST(n_pos AS DOUBLE) / n_total)"
            " + (1.0 - CAST(n_pos AS DOUBLE) / n_total)"
            " * ln(1.0 - CAST(n_pos AS DOUBLE) / n_total))) AS BIGINT)"
        ).alias("base_entropy_micro_nats"),
    )


# ---------------------------------------------------------------------------
# Regression eval metrics (MAE / RMSE / R²) for the group-mean baseline.
# ---------------------------------------------------------------------------

_REG_ORACLE = """
WITH b AS (
  SELECT event_type AS g,
         CAST(round(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS x
  FROM events
), gm AS (
  SELECT g, CAST(COUNT(*) AS HUGEINT) AS n_g,
         CAST(SUM(x) AS HUGEINT) AS s1_g
  FROM b GROUP BY g
), per_g AS (
  SELECT b.g,
         CAST(gm.n_g AS BIGINT) AS n_g,
         CAST(SUM(abs(gm.n_g * b.x - gm.s1_g)) // gm.n_g AS BIGINT) AS mae_num,
         CAST(SUM(CAST(gm.n_g * b.x - gm.s1_g AS HUGEINT)
                  * (gm.n_g * b.x - gm.s1_g)) // (gm.n_g * gm.n_g) AS HUGEINT)
           AS ss_res_g
  FROM b JOIN gm ON b.g = gm.g
  GROUP BY b.g, gm.n_g
), tot AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS s1,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2
  FROM b
), agg AS (
  SELECT CAST(SUM(per_g.mae_num) AS BIGINT) AS mae_sum,
         CAST(SUM(per_g.ss_res_g) AS HUGEINT) AS ss_res,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM per_g
)
SELECT CAST(tot.n AS BIGINT) AS n_total, agg.k AS k_groups,
       CAST(agg.mae_sum * 1000000 // tot.n AS BIGINT) AS mae_micro_cents,
       round(sqrt(CAST(agg.ss_res AS DOUBLE) / CAST(tot.n AS DOUBLE)), 6)
         AS rmse_cents,
       round(1.0 - CAST(agg.ss_res AS DOUBLE)
             / (CAST(tot.n * tot.s2 - tot.s1 * tot.s1 AS DOUBLE)
                / CAST(tot.n AS DOUBLE)), 6) AS r2
FROM agg CROSS JOIN tot
"""


@register("ml_regression_metrics", oracle=_REG_ORACLE, tags=("llm", "ml", "eval"))
def ml_regression_metrics(spark, sf_dir):
    """The REGRESSION eval family — MAE / RMSE / R² — for the
    group-mean baseline predictor (ŷ = mean of the row's event type;
    train == eval, pinned — it is the R² decomposition's in-sample
    form, where R² equals the variance explained BY the grouping).
    Closes the eval stack's third axis: classification
    (ml_classifier_metrics), ranking (ml_ndcg_at_k), now regression.

    Exactness: per-row scaled residual n_g·x − s1_g is an EXACT
    integer (group-mean denominator cleared); per-group Σ|r| and Σr²
    are exact HUGEINT/DECIMAL(38) sums, de-scaled by ONE truncating
    DIV per group (error < 1 cent resp. < 1 cent², documented);
    MAE is exact micro-cents; RMSE/R² are single float expressions
    over exact sums. SStot's n·Σx² − (Σx)² is exact.

    Scale: one group-moment aggregate broadcast back onto the scan,
    one keyed residual aggregate — two passes, no window."""
    b = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        F.round(dec("value", VAL) * 100).cast("long").alias("x"),
    )
    gm = b.groupBy("g").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_g"),
        F.sum("x").cast("decimal(38,0)").alias("s1_g"),
    )
    per_g = (
        b.join(F.broadcast(gm), "g")
        .groupBy("g", "n_g")
        .agg(
            F.expr(
                "CAST(SUM(abs(n_g * x - s1_g)) DIV n_g AS BIGINT)"
            ).alias("mae_num"),
            F.expr(
                "CAST(SUM(CAST(n_g * x - s1_g AS DECIMAL(38,0))"
                " * (n_g * x - s1_g)) DIV (n_g * n_g) AS DECIMAL(38,0))"
            ).alias("ss_res_g"),
        )
    )
    tot = b.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s1"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    agg = per_g.agg(
        F.sum("mae_num").cast("long").alias("mae_sum"),
        F.sum("ss_res_g").cast("decimal(38,0)").alias("ss_res"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        F.col("n").cast("long").alias("n_total"),
        F.col("k").alias("k_groups"),
        F.expr("CAST(mae_sum * 1000000 DIV CAST(n AS BIGINT) AS BIGINT)").alias(
            "mae_micro_cents"
        ),
        F.expr(
            "round(sqrt(CAST(ss_res AS DOUBLE) / CAST(n AS DOUBLE)), 6)"
        ).alias("rmse_cents"),
        F.expr(
            "round(1.0 - CAST(ss_res AS DOUBLE)"
            " / (CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6)"
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Discrete power-law MLE for the degree distribution.
# ---------------------------------------------------------------------------

_POWERLAW_ORACLE = _COORDER_EDGES_CTE + """
, tail AS (
  SELECT deg, CAST(COUNT(*) AS BIGINT) AS cnt FROM deg
  WHERE deg >= 2 GROUP BY deg
), m AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_tail,
         CAST(SUM(cnt * CAST(round(1000000 * ln(deg / 1.5)) AS BIGINT))
              AS BIGINT) AS sum_ln_micro
  FROM tail
)
SELECT n_tail, CAST(2 AS BIGINT) AS x_min, sum_ln_micro,
       round(1.0 + n_tail * 1e6 / sum_ln_micro, 6) AS alpha_hat
FROM m
"""


@register("graph_degree_powerlaw_mle", oracle=_POWERLAW_ORACLE, tags=("graph", "analytics", "stats"))
def graph_degree_powerlaw_mle(spark, sf_dir):
    """POWER-LAW exponent MLE for the co-order degree distribution
    (Clauset-Shalizi-Newman 2009, continuous approximation with the
    xmin − 1/2 offset, xmin = 2): α̂ = 1 + n / Σ ln(d/(xmin−½)) —
    the scale-free-ness scalar that text_zipf_fit computes for token
    frequencies, now for GRAPH degrees (the two heavy-tail laws a
    pipeline report quotes side by side).

    Exactness: each distinct degree's ln term is micro-quantized to
    an exact BIGINT once on the |distinct degrees| rollup, then
    count-weighted and summed exactly (order-free); α̂ is one float,
    round(6).

    Scale: degree rollup (bounded by max degree) — the whole
    statistic costs one keyed count + one tiny aggregate."""
    e = _coorder_part_edges(spark, sf_dir).select("u", "v")
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    tail = (
        deg.filter(F.col("deg") >= 2)
        .groupBy("deg")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    m = tail.agg(
        F.sum("cnt").cast("long").alias("n_tail"),
        F.sum(
            F.expr(
                "cnt * CAST(round(1000000 * ln(deg / 1.5)) AS BIGINT)"
            )
        )
        .cast("long")
        .alias("sum_ln_micro"),
    )
    return m.select(
        "n_tail",
        F.lit(2).cast("long").alias("x_min"),
        "sum_ln_micro",
        F.expr("round(1.0 + n_tail * 1e6 / sum_ln_micro, 6)").alias(
            "alpha_hat"
        ),
    )


# ---------------------------------------------------------------------------
# Per-label silhouette (milli-quantized, centroid-based).
# ---------------------------------------------------------------------------

_SILHOUETTE_ORACLE = """
WITH em AS (
  SELECT e.vec_id, e.label, p.pos,
         CAST(round(CAST(e.embedding[p.pos] AS DOUBLE) * 1000) AS BIGINT)
           AS val
  FROM embeddings e
  CROSS JOIN (SELECT CAST(range AS INT) AS pos FROM range(1, 65)) p
), nl AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_c
  FROM embeddings GROUP BY label
), cent AS (
  SELECT label AS clabel, pos, CAST(SUM(val) AS BIGINT) AS s
  FROM em GROUP BY label, pos
), dist AS (
  SELECT em.vec_id, em.label, cent.clabel,
         sqrt(CAST(SUM(CAST(nl.n_c * em.val - cent.s AS HUGEINT)
                       * (nl.n_c * em.val - cent.s)) AS DOUBLE))
           / CAST(nl.n_c AS DOUBLE) AS d
  FROM em
  JOIN cent ON cent.pos = em.pos
  JOIN nl ON nl.label = cent.clabel
  GROUP BY em.vec_id, em.label, cent.clabel, nl.n_c
), ab AS (
  SELECT vec_id, label,
         MIN(CASE WHEN clabel = label THEN d END) AS a,
         MIN(CASE WHEN clabel <> label THEN d END) AS b
  FROM dist GROUP BY vec_id, label
), srow AS (
  SELECT label,
         CAST(round(1000000 * (b - a) / greatest(a, b)) AS BIGINT) AS s_micro
  FROM ab
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(s_micro) // COUNT(*) AS BIGINT) AS mean_silhouette_micro
FROM srow GROUP BY label ORDER BY label
"""


@register("sim_silhouette_by_label", oracle=_SILHOUETTE_ORACLE, tags=("llm", "similarity", "eval"))
def sim_silhouette_by_label(spark, sf_dir):
    """Centroid-based SILHOUETTE per label (the simplified/medoid
    silhouette of Rousseeuw 1987): a = distance to the own-label
    centroid, b = distance to the nearest other centroid, s =
    (b−a)/max(a,b) — the cluster-separation health check for the
    embedding space (sim_triplet_margin_stats samples triplets; this
    scores EVERY vector against the full centroid structure).

    Exactness convention (PINNED): embeddings are milli-quantized
    (round(v·1000) — exact BIGINTs), centroids kept as exact
    (Σval, n) rationals, so the squared distance numerator
    Σ(n·x − s)² is an EXACT integer (~1e17 at the 10x probe — BIGINT
    safe); the sqrt and the s ratio are per-row scalar floats,
    micro-quantized back to exact BIGINTs before the per-label sum
    (order-free); the label mean is a truncating DIV.

    Scale: the centroid build is a 64·|labels|-row rollup; scoring
    is one scan x |labels| broadcast with a zip_with kernel — no
    explode of the corpus, no pairwise join."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000)"
            " AS BIGINT))"
        ).alias("xm"),
    )
    nl = emb.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n_c"))
    cent = (
        emb.select("label", F.posexplode("xm").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.sum("val").cast("long").alias("s"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, s))), x -> x.s)"
            ).alias("sarr")
        )
        .join(nl, "label")
        .select(
            F.col("label").alias("clabel"), "sarr", F.col("n_c")
        )
    )
    dist = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "label",
            "clabel",
            (
                F.sqrt(
                    F.expr(
                        "CAST(aggregate(zip_with(xm, sarr,"
                        " (x, s) -> (n_c * x - s) * (n_c * x - s)),"
                        " 0L, (acc, v) -> acc + v) AS DOUBLE)"
                    )
                )
                / F.col("n_c").cast("double")
            ).alias("d"),
        )
    )
    ab = dist.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("clabel") == F.col("label"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("d"))).alias("b"),
    )
    srow = ab.select(
        "label",
        F.expr(
            "CAST(round(1000000 * (b - a) / greatest(a, b)) AS BIGINT)"
        ).alias("s_micro"),
    )
    return (
        srow.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.expr("CAST(SUM(s_micro) DIV COUNT(*) AS BIGINT)").alias(
                "mean_silhouette_micro"
            ),
        )
        .orderBy("label")
    )
