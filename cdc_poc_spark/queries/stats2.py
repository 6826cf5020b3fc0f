"""Round-10 statistics wave — the nonparametric / paired / effect-size
tests that complete the engine's in-database statistics surface
(rounds 6-9 built: chi-square, KS, Mann-Whitney, Welch t, ANOVA F,
Spearman/Kendall, Cramér's V, kappa, odds-ratio CI, Brown-Forsythe,
G-test, Moran's I, Wilcoxon signed-rank, Kruskal-Wallis). The
reference has no aggregation surface at all (SURVEY §2 preamble);
every query here is engine capability per the north star, built on
the standing exactness discipline: integer cents, DECIMAL(38)/HUGEINT
moments, cross-multiplied comparisons instead of divisions, one float
expression at the end, round(6).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..tables import VAL, dec, load_table
from . import register

# ---------------------------------------------------------------------------
# Mann-Kendall trend test — the significance twin of tw_theil_sen_slope.
# ---------------------------------------------------------------------------

_MK_ORACLE = """
WITH d AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY date_trunc('day', ts)
), r AS (
  SELECT cents, row_number() OVER (ORDER BY day) AS t FROM d
), s AS (
  SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                       WHEN b.cents < a.cents THEN -1 ELSE 0 END)
              AS BIGINT) AS s_stat
  FROM r a JOIN r b ON b.t > a.t
), ties AS (
  SELECT COALESCE(CAST(SUM(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT), 0)
           AS tie_term
  FROM (SELECT COUNT(*) AS tg FROM d GROUP BY cents HAVING COUNT(*) > 1)
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM d
)
SELECT n.n_days, s.s_stat,
       CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tie_term
            AS BIGINT) AS var_s_x18,
       round(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                  WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                  ELSE 0 END
             / sqrt((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                     - ties.tie_term) / 18.0), 6) AS z_score
FROM n, s, ties
"""


@register("agg_mann_kendall_trend", oracle=_MK_ORACLE, tags=("agg", "stats", "timeseries"))
def agg_mann_kendall_trend(spark, sf_dir):
    """MANN-KENDALL trend test (Mann 1945, Kendall 1975) on the daily
    revenue series — the SIGNIFICANCE twin of tw_theil_sen_slope (that
    query estimates the robust slope; this one says whether a monotone
    trend exists at all): S = Σ_{i<j} sign(x_j − x_i) over day order,
    variance with the exact tie correction Var(S)·18 = n(n−1)(2n+5) −
    Σ_t t(t−1)(2t+5) carried as an exact integer, z with the standard
    continuity correction. Pairwise relation is DAYS² (30² here, never
    rows²) — the same bound that makes Theil-Sen scale. S, n, and the
    18·variance are exact integers; z is one float expression."""
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
    r = d.select(
        "cents", F.row_number().over(W.orderBy("day")).alias("t")
    )
    a = r.select(F.col("cents").alias("ca"), F.col("t").alias("ta"))
    b = r.select(F.col("cents").alias("cb"), F.col("t").alias("tb"))
    s = (
        a.join(F.broadcast(b), F.col("tb") > F.col("ta"))
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    ties = (
        d.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("tg"))
        .filter(F.col("tg") > 1)
        .agg(
            F.coalesce(
                F.sum(F.expr("tg * (tg - 1) * (2 * tg + 5)")), F.lit(0)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    var18 = F.expr(
        "CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS BIGINT)"
    )
    zc = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(F.lit(0))
    )
    return (
        n.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .select(
            "n_days",
            "s_stat",
            var18.alias("var_s_x18"),
            F.round(
                zc / F.sqrt(
                    (
                        F.col("n_days") * (F.col("n_days") - 1)
                        * (2 * F.col("n_days") + 5)
                        - F.col("tie_term")
                    )
                    / 18.0
                ),
                6,
            ).alias("z_score"),
        )
    )


# ---------------------------------------------------------------------------
# Friedman test — k correlated treatments over blocks.
# ---------------------------------------------------------------------------

_FRIEDMAN_ORACLE = """
WITH ut AS (
  SELECT user_id, event_type,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS total
  FROM events GROUP BY user_id, event_type
), blocks AS (
  SELECT user_id FROM ut GROUP BY user_id HAVING COUNT(*) = 5
), rk AS (
  SELECT ut.user_id, event_type,
         row_number() OVER (PARTITION BY ut.user_id
                            ORDER BY total, event_type) AS r
  FROM ut JOIN blocks ON ut.user_id = blocks.user_id
), rs AS (
  SELECT event_type, CAST(SUM(r) AS BIGINT) AS r_sum FROM rk GROUP BY event_type
), agg AS (
  SELECT CAST(SUM(CAST(r_sum AS HUGEINT) * r_sum) AS DECIMAL(38,0)) AS srr
  FROM rs
), b AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks FROM blocks
)
SELECT rs.event_type, rs.r_sum, b.n_blocks,
       round(12.0 * CAST(agg.srr AS DOUBLE) / (b.n_blocks * 5 * 6)
             - 3.0 * b.n_blocks * 6, 6) AS q_statistic
FROM rs, agg, b
"""


@register("agg_friedman_test", oracle=_FRIEDMAN_ORACLE, tags=("agg", "stats"))
def agg_friedman_test(spark, sf_dir):
    """FRIEDMAN test (Friedman 1937) — the k-correlated-samples rank
    test completing the nonparametric family's paired axis (Wilcoxon:
    2 paired; this: k paired): blocks are users observed in ALL k=5
    event types, each block ranks its per-type revenue totals 1..k
    (ties broken by event_type — the spearman pinned-tiebreak
    convention), Q = 12/(b·k(k+1)) Σ R_j² − 3b(k+1). Rank sums and
    Σ R_j² are exact integers (HUGEINT/DECIMAL38); Q is one float
    expression replicated per treatment row. Plan: one keyed rollup,
    one per-block (keyed) rank window, two 1-row reduces."""
    ev = load_table(spark, sf_dir, "events")
    ut = (
        ev.select(
            "user_id",
            "event_type",
            F.round(dec("value", VAL) * 100).cast("long").alias("c0"),
        )
        .groupBy("user_id", "event_type")
        .agg(F.sum("c0").cast("long").alias("total"))
    )
    blocks = ut.groupBy("user_id").agg(F.count(F.lit(1)).alias("k")).filter(
        F.col("k") == 5
    ).select("user_id")
    rk = ut.join(blocks, "user_id").withColumn(
        "r",
        F.row_number().over(
            W.partitionBy("user_id").orderBy("total", "event_type")
        ),
    )
    rs = rk.groupBy("event_type").agg(F.sum("r").cast("long").alias("r_sum"))
    agg = rs.agg(
        F.sum(F.col("r_sum").cast("decimal(38,0)") * F.col("r_sum")).alias("srr")
    )
    b = blocks.agg(F.count(F.lit(1)).cast("long").alias("n_blocks"))
    return (
        rs.crossJoin(F.broadcast(agg))
        .crossJoin(F.broadcast(b))
        .select(
            "event_type",
            "r_sum",
            "n_blocks",
            F.round(
                12.0 * F.col("srr").cast("double")
                / (F.col("n_blocks") * 5 * 6)
                - 3.0 * F.col("n_blocks") * 6,
                6,
            ).alias("q_statistic"),
        )
    )


# ---------------------------------------------------------------------------
# Cochran's Q — k correlated BINARY treatments.
# ---------------------------------------------------------------------------

_COCHRAN_ORACLE = """
WITH cnts AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, event_type
), tot AS (
  SELECT user_id, CAST(SUM(c) AS BIGINT) AS total_u,
         CAST(COUNT(*) AS BIGINT) AS k_u
  FROM cnts GROUP BY user_id
), x AS (
  SELECT cnts.user_id, event_type,
         CASE WHEN c * 5 > total_u THEN 1 ELSE 0 END AS x
  FROM cnts JOIN tot ON cnts.user_id = tot.user_id
), rows_u AS (
  SELECT user_id, CAST(SUM(x) AS BIGINT) AS r_u FROM x GROUP BY user_id
), cols_t AS (
  SELECT event_type, CAST(SUM(x) AS BIGINT) AS c_t FROM x GROUP BY event_type
), num AS (
  SELECT CAST(SUM(CAST(c_t AS HUGEINT) * c_t) AS BIGINT) AS scc,
         CAST(SUM(c_t) AS BIGINT) AS sc
  FROM cols_t
), den AS (
  SELECT CAST(SUM(r_u) AS BIGINT) AS sr,
         CAST(SUM(CAST(r_u AS HUGEINT) * r_u) AS BIGINT) AS srr
  FROM rows_u
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rows_u) AS n_users,
       CAST(5 AS BIGINT) AS k_treatments,
       num.scc, num.sc, den.sr, den.srr,
       round(4.0 * (5.0 * num.scc - CAST(num.sc AS DOUBLE) * num.sc)
             / (5.0 * den.sr - den.srr), 6) AS q_statistic
FROM num, den
"""


@register("agg_cochran_q", oracle=_COCHRAN_ORACLE, tags=("agg", "stats"))
def agg_cochran_q(spark, sf_dir):
    """COCHRAN'S Q (Cochran 1950) — the k-correlated BINARY-outcome
    test (the binary specialization Friedman generalizes): per user
    the binary outcome for event type t is 'above own average
    engagement' (count_t · k > total_u — an exact cross-multiplied
    comparison, scale-free so it discriminates at every SF). Q =
    (k−1)[k ΣC_t² − (ΣC_t)²] / (k ΣR_u − ΣR_u²) with every sum an
    exact integer (the moment columns are driver-hashed alongside Q).
    Plan: two keyed rollups + two 1-row reduces."""
    ev = load_table(spark, sf_dir, "events")
    cnts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = cnts.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("total_u")
    )
    x = cnts.join(tot, "user_id").select(
        "user_id",
        "event_type",
        F.when(F.col("c") * 5 > F.col("total_u"), 1).otherwise(0).alias("x"),
    )
    rows_u = x.groupBy("user_id").agg(F.sum("x").cast("long").alias("r_u"))
    cols_t = x.groupBy("event_type").agg(F.sum("x").cast("long").alias("c_t"))
    num = cols_t.agg(
        F.sum(F.col("c_t").cast("decimal(38,0)") * F.col("c_t"))
        .cast("long")
        .alias("scc"),
        F.sum("c_t").cast("long").alias("sc"),
    )
    den = rows_u.agg(
        F.sum("r_u").cast("long").alias("sr"),
        F.sum(F.col("r_u").cast("decimal(38,0)") * F.col("r_u"))
        .cast("long")
        .alias("srr"),
    )
    nu = rows_u.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    return (
        nu.crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(den))
        .select(
            "n_users",
            F.lit(5).cast("long").alias("k_treatments"),
            "scc",
            "sc",
            "sr",
            "srr",
            F.round(
                4.0
                * (5.0 * F.col("scc") - F.col("sc").cast("double") * F.col("sc"))
                / (5.0 * F.col("sr") - F.col("srr")),
                6,
            ).alias("q_statistic"),
        )
    )


# ---------------------------------------------------------------------------
# McNemar's test — paired binary before/after.
# ---------------------------------------------------------------------------

_MCNEMAR_ORACLE = """
WITH bounds AS (
  SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid FROM events
), u AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase'
                  AND epoch_us(ts) <  mid THEN 1 ELSE 0 END) AS x1,
         MAX(CASE WHEN event_type = 'purchase'
                  AND epoch_us(ts) >= mid THEN 1 ELSE 0 END) AS x2
  FROM events, bounds GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN x1 = 1 AND x2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
       CAST(SUM(CASE WHEN x1 = 0 AND x2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
       round(CASE WHEN SUM(CASE WHEN x1 <> x2 THEN 1 ELSE 0 END) = 0 THEN 0.0
             ELSE POWER(ABS(SUM(CASE WHEN x1 = 1 AND x2 = 0 THEN 1 ELSE 0 END)
                            - SUM(CASE WHEN x1 = 0 AND x2 = 1 THEN 1 ELSE 0 END))
                        - 1, 2)
                  / (SUM(CASE WHEN x1 = 1 AND x2 = 0 THEN 1 ELSE 0 END)
                     + SUM(CASE WHEN x1 = 0 AND x2 = 1 THEN 1 ELSE 0 END))
             END, 6) AS chi2_cc
FROM u
"""


@register("agg_mcnemar_paired", oracle=_MCNEMAR_ORACLE, tags=("agg", "stats"))
def agg_mcnemar_paired(spark, sf_dir):
    """McNEMAR'S paired test (McNemar 1947): did per-user purchase
    behavior CHANGE between the first and second half of the observed
    window (midpoint = exact integer micros mean of min/max ts)? Only
    the discordant cells matter: b = purchased-then-stopped, c =
    started-purchasing; χ²_cc = (|b−c|−1)²/(b+c) with the standard
    continuity correction (pinned; 0 when b+c=0). b, c exact integers
    under the driver hash; one float expression. Plan: one 1-row
    bounds reduce broadcast into one keyed rollup."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    bounds = ev.agg(
        F.expr("CAST((MIN(ts_us) + MAX(ts_us)) DIV 2 AS BIGINT)").alias("mid")
    )
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") < F.col("mid")),
                    1,
                ).otherwise(0)
            ).alias("x1"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") >= F.col("mid")),
                    1,
                ).otherwise(0)
            ).alias("x2"),
        )
    )
    bb = F.sum(F.when((F.col("x1") == 1) & (F.col("x2") == 0), 1).otherwise(0))
    cc = F.sum(F.when((F.col("x1") == 0) & (F.col("x2") == 1), 1).otherwise(0))
    return u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        bb.cast("long").alias("b"),
        cc.cast("long").alias("c"),
        F.round(
            F.when(bb + cc == 0, F.lit(0.0)).otherwise(
                F.pow(F.abs(bb - cc) - 1, 2) / (bb + cc)
            ),
            6,
        ).alias("chi2_cc"),
    )


# ---------------------------------------------------------------------------
# Cliff's delta — ordinal effect size, rank-computed (never pairwise).
# ---------------------------------------------------------------------------

_CLIFF_ORACLE = """
WITH b AS (
  SELECT event_type,
         CAST(round(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS y
  FROM events WHERE event_type IN ('purchase', 'click')
), v AS (
  SELECT y,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS cb
  FROM b GROUP BY y
), c AS (
  SELECT y, ca, cb,
         SUM(cb) OVER (ORDER BY y) AS cum_b_le
  FROM v
), t AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b FROM v
), p AS (
  SELECT
    CAST(SUM(CAST(ca AS HUGEINT) * (cum_b_le - cb)) AS DECIMAL(38,0)) AS gt,
    CAST(SUM(CAST(ca AS HUGEINT) * (t.n_b - cum_b_le)) AS DECIMAL(38,0)) AS lt,
    CAST(SUM(CAST(ca AS HUGEINT) * cb) AS DECIMAL(38,0)) AS tied
  FROM c, t
)
SELECT t.n_a, t.n_b,
       CAST(p.gt AS BIGINT) AS pairs_gt,
       CAST(p.lt AS BIGINT) AS pairs_lt,
       CAST(p.tied AS BIGINT) AS pairs_tied,
       round((CAST(p.gt AS DOUBLE) - CAST(p.lt AS DOUBLE))
             / (CAST(t.n_a AS DOUBLE) * t.n_b), 6) AS cliff_delta
FROM t, p
"""


@register("agg_cliff_delta", oracle=_CLIFF_ORACLE, tags=("agg", "stats"))
def agg_cliff_delta(spark, sf_dir):
    """CLIFF'S DELTA (Cliff 1993) — the ordinal effect size behind
    Mann-Whitney (δ = P(a>b) − P(a<b)): purchase vs click prices.
    Computed WITHOUT materializing the n_a·n_b pairs: collapse to
    distinct values with per-group counts, one global_cumsum over the
    value order gives every value's count-below, and the pair counts
    are exact integer dot products — #(a>b) = Σ ca·cumB_lt, #(a<b) =
    Σ ca·(n_b − cumB_le), ties = Σ ca·cb, all DECIMAL(38)-exact and
    driver-hashed alongside δ (one float expression). Plan: one value
    rollup + two-pass cumsum + one 1-row reduce — rank algebra, never
    a pairwise relation."""
    from ..operators.scale import global_cumsum

    ev = load_table(spark, sf_dir, "events")
    b = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_type",
        F.round(dec("value", VAL) * 100).cast("long").alias("y"),
    )
    v = b.groupBy("y").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    c = global_cumsum(v, "cb", ["y"], "cum_b_le")
    t = v.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    p = c.crossJoin(F.broadcast(t)).agg(
        F.sum(
            F.col("ca").cast("decimal(38,0)") * (F.col("cum_b_le") - F.col("cb"))
        ).alias("gt"),
        F.sum(
            F.col("ca").cast("decimal(38,0)") * (F.col("n_b") - F.col("cum_b_le"))
        ).alias("lt"),
        F.sum(F.col("ca").cast("decimal(38,0)") * F.col("cb")).alias("tied"),
    )
    return (
        t.crossJoin(F.broadcast(p))
        .select(
            "n_a",
            "n_b",
            F.col("gt").cast("long").alias("pairs_gt"),
            F.col("lt").cast("long").alias("pairs_lt"),
            F.col("tied").cast("long").alias("pairs_tied"),
            F.round(
                (F.col("gt").cast("double") - F.col("lt").cast("double"))
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("cliff_delta"),
        )
    )


# ---------------------------------------------------------------------------
# Grubbs' max-outlier test.
# ---------------------------------------------------------------------------

_GRUBBS_ORACLE = """
WITH b AS (
  SELECT event_id,
         CAST(round(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS y
  FROM events
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(y AS HUGEINT)) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS syy
  FROM b
), dev AS (
  SELECT y AS outlier_cents,
         CAST(ABS(CAST(y AS HUGEINT) * n - CAST(sy AS HUGEINT)) AS BIGINT)
           AS dev_num
  FROM b, m
  ORDER BY ABS(CAST(y AS HUGEINT) * n - CAST(sy AS HUGEINT)) DESC, y ASC
  LIMIT 1
)
SELECT m.n, dev.outlier_cents, dev.dev_num,
       round(dev.dev_num
             / (m.n * sqrt((m.n * CAST(m.syy AS DOUBLE)
                            - CAST(m.sy AS DOUBLE) * CAST(m.sy AS DOUBLE))
                           / (CAST(m.n AS DOUBLE) * (m.n - 1)))), 6)
         AS g_statistic
FROM m, dev
"""


@register("agg_grubbs_outlier", oracle=_GRUBBS_ORACLE, tags=("agg", "stats"))
def agg_grubbs_outlier(spark, sf_dir):
    """GRUBBS' test (Grubbs 1950) — the max-studentized-deviation
    outlier statistic G = max|x − x̄|/s, completing the outlier trio
    (Tukey fences: quartile rule; MAD: robust rule; this: the normal-
    theory significance rule). The argmax is found on the EXACT
    integer |x·n − Σx| (cross-multiplied deviation — no float enters
    the ordering), tie-broken by value, via TakeOrderedAndProject;
    moments are DECIMAL(38) sums; G is one float expression. The
    outlier value and its exact deviation numerator are driver-hashed
    beside G."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_id",
        F.round(dec("value", VAL) * 100).cast("long").alias("y"),
    )
    m = b.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    dev = (
        b.crossJoin(F.broadcast(m))
        .select(
            F.col("y").alias("outlier_cents"),
            F.abs(
                F.col("y").cast("decimal(38,0)") * F.col("n") - F.col("sy")
            )
            .cast("long")
            .alias("dev_num"),
        )
        .orderBy(F.col("dev_num").desc(), F.col("outlier_cents").asc())
        .limit(1)
    )
    return (
        m.crossJoin(F.broadcast(dev))
        .select(
            "n",
            "outlier_cents",
            "dev_num",
            F.round(
                F.col("dev_num")
                / (
                    F.col("n")
                    * F.sqrt(
                        (
                            F.col("n") * F.col("syy").cast("double")
                            - F.col("sy").cast("double") * F.col("sy").cast("double")
                        )
                        / (F.col("n").cast("double") * (F.col("n") - 1))
                    )
                ),
                6,
            ).alias("g_statistic"),
        )
    )


# ---------------------------------------------------------------------------
# Hodges-Lehmann shift estimator — median of pairwise day-differences.
# ---------------------------------------------------------------------------

_HL_ORACLE = """
WITH d AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM events WHERE event_type IN ('purchase', 'view')
  GROUP BY event_type, date_trunc('day', ts)
), pr AS (
  SELECT a.cents - b.cents AS diff, a.day AS da, b.day AS db
  FROM (SELECT day, cents FROM d WHERE event_type = 'purchase') a,
       (SELECT day, cents FROM d WHERE event_type = 'view') b
), r AS (
  SELECT diff, row_number() OVER (ORDER BY diff, da, db) AS rk,
         COUNT(*) OVER () AS n
  FROM pr
)
SELECT CAST(MAX(n) AS BIGINT) AS n_pairs,
       CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN diff END) AS BIGINT)
         AS hl_shift_cents
FROM r
"""


@register("agg_hodges_lehmann_shift", oracle=_HL_ORACLE, tags=("agg", "stats"))
def agg_hodges_lehmann_shift(spark, sf_dir):
    """HODGES-LEHMANN shift estimator (1963) — the robust location
    difference between the purchase and view DAILY revenue series:
    the (lower) median of all pairwise day differences a_i − b_j. The
    pairwise relation is DAYS_a × DAYS_b (30×30 here — the Theil-Sen
    bound discipline, never rows²); diffs are exact integer cents and
    the median is an exact order statistic at rank (N+1) DIV 2 under
    the pinned (diff, day_a, day_b) total order. Both output columns
    are exact integers."""
    from ..tables import events_with_time

    ev = events_with_time(spark, sf_dir)
    d = (
        ev.filter(F.col("event_type").isin("purchase", "view"))
        .select(
            "event_type",
            F.date_format(F.date_trunc("day", "etime"), "yyyy-MM-dd").alias("day"),
            F.round(dec("value", VAL) * 100).cast("long").alias("c0"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c0").cast("long").alias("cents"))
    )
    a = d.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("da"), F.col("cents").alias("ca")
    )
    bb = d.filter(F.col("event_type") == "view").select(
        F.col("day").alias("db"), F.col("cents").alias("cb")
    )
    pr = a.crossJoin(F.broadcast(bb)).select(
        (F.col("ca") - F.col("cb")).alias("diff"), "da", "db"
    )
    r = pr.select(
        "diff",
        F.row_number().over(W.orderBy("diff", "da", "db")).alias("rk"),
    )
    n = pr.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    return (
        r.crossJoin(F.broadcast(n))
        .filter(F.col("rk") == F.expr("(n_pairs + 1) DIV 2"))
        .select("n_pairs", F.col("diff").cast("long").alias("hl_shift_cents"))
    )


# ---------------------------------------------------------------------------
# Ansari-Bradley — rank-based two-sample SCALE test.
# ---------------------------------------------------------------------------

_AB_ORACLE = """
WITH b AS (
  SELECT event_id, event_type,
         CAST(round(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS y
  FROM events WHERE event_type IN ('purchase', 'click')
), r AS (
  SELECT event_type,
         row_number() OVER (ORDER BY y, event_id) AS rk
  FROM b
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_a
  FROM b
)
SELECT t.n_a, CAST(t.n - t.n_a AS BIGINT) AS n_b,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                     THEN LEAST(rk, t.n + 1 - rk) ELSE 0 END)
            AS BIGINT) AS ab_statistic,
       CAST(CASE WHEN t.n % 2 = 0 THEN t.n_a * (t.n + 2)
                 ELSE t.n_a * (t.n + 1) * (t.n + 1) END AS BIGINT)
         AS expected_num,
       CAST(CASE WHEN t.n % 2 = 0 THEN 4 ELSE 4 * t.n END AS BIGINT)
         AS expected_den
FROM r, t
GROUP BY t.n_a, t.n
"""


@register("agg_ansari_bradley", oracle=_AB_ORACLE, tags=("agg", "stats"))
def agg_ansari_bradley(spark, sf_dir):
    """ANSARI-BRADLEY two-sample SCALE test (Ansari & Bradley 1960) —
    the rank-based dispersion comparison completing the scale family
    (Brown-Forsythe tests spread via median deviations; this one is
    fully distribution-free): pool purchase and click prices, rank
    under the (value, event_id) total order (pinned tiebreak in place
    of midranks — the spearman convention), score each observation
    min(rk, N+1−rk) (extremes score low, the middle scores high), and
    sum the scores of group A. AB, and the null-mean as the exact
    rational expected_num/expected_den (parity-split closed form), are
    ALL exact integers — no float anywhere. Plan: one two-pass global
    rank + one 1-row reduce."""
    from ..operators.scale import global_index

    ev = load_table(spark, sf_dir, "events")
    b = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        "event_type",
        F.round(dec("value", VAL) * 100).cast("long").alias("y"),
    )
    t = b.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
    )
    r = global_index(b, "rk0", ["y", "event_id"]).select(
        "event_type", (F.col("rk0") + 1).alias("rk")
    )
    return (
        r.crossJoin(F.broadcast(t))
        .groupBy("n_a", "n")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.least(F.col("rk"), F.col("n") + 1 - F.col("rk")),
                ).otherwise(0)
            )
            .cast("long")
            .alias("ab_statistic")
        )
        .select(
            "n_a",
            (F.col("n") - F.col("n_a")).cast("long").alias("n_b"),
            "ab_statistic",
            F.when(
                F.col("n") % 2 == 0, F.col("n_a") * (F.col("n") + 2)
            )
            .otherwise(F.col("n_a") * (F.col("n") + 1) * (F.col("n") + 1))
            .cast("long")
            .alias("expected_num"),
            F.when(F.col("n") % 2 == 0, F.lit(4))
            .otherwise(4 * F.col("n"))
            .cast("long")
            .alias("expected_den"),
        )
    )


# ---------------------------------------------------------------------------
# Anderson-Darling two-sample — the tail-sensitive EDF test.
# ---------------------------------------------------------------------------

_AD_ORACLE = """
WITH b AS (
  SELECT event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a,
         CAST(round(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS y
  FROM events WHERE event_type IN ('purchase', 'click')
), r AS (
  SELECT is_a, row_number() OVER (ORDER BY y, event_id) AS i,
         SUM(is_a) OVER (ORDER BY y, event_id) AS m_i
  FROM b
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tot, CAST(SUM(is_a) AS BIGINT) AS n_a
  FROM b
), s AS (
  SELECT CAST(SUM(CAST(m_i * t.n_tot - t.n_a * i AS HUGEINT)
                  * (m_i * t.n_tot - t.n_a * i) * 1000000
                  // (i * (t.n_tot - i))) AS DECIMAL(38,0)) AS terms
  FROM r, t WHERE i < t.n_tot
)
SELECT t.n_a, CAST(t.n_tot - t.n_a AS BIGINT) AS n_b,
       round(CAST(s.terms AS DOUBLE)
             / (1e6 * CAST(t.n_a AS DOUBLE) * (t.n_tot - t.n_a) * t.n_tot), 6)
         AS a2_statistic
FROM t, s
"""


@register("agg_anderson_darling_2samp", oracle=_AD_ORACLE, tags=("agg", "stats"))
def agg_anderson_darling_2samp(spark, sf_dir):
    """ANDERSON-DARLING two-sample test (Pettitt 1976 rank form) —
    the TAIL-SENSITIVE EDF comparison completing the family (KS sees
    the max gap, CvM-style averages; AD's 1/(i(N−i)) weight makes the
    tails count): A² = (1/(nm·N)) Σ_{i<N} (M_i·N − n·i)² / (i(N−i))
    with M_i the count of group A among the first i pooled
    observations under the pinned (value, event_id) total order. Every
    per-i term is an exact integer at the fixed 10⁶ scale (truncation
    < 1e-6/term — invisible at round(6)); M_i comes from the two-pass
    global_cumsum, never a single-partition window; A² is one float.
    Plan: two-pass rank + two-pass cumsum + one 1-row reduce."""
    from ..operators.scale import global_cumsum, global_index

    ev = load_table(spark, sf_dir, "events")
    b = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_a"),
        F.round(dec("value", VAL) * 100).cast("long").alias("y"),
    )
    t = b.agg(
        F.count(F.lit(1)).cast("long").alias("n_tot"),
        F.sum("is_a").cast("long").alias("n_a"),
    )
    idx = global_index(b, "i0", ["y", "event_id"])
    r = global_cumsum(idx, "is_a", ["y", "event_id"], "m_i").select(
        (F.col("i0") + 1).alias("i"), "m_i"
    )
    s = (
        r.crossJoin(F.broadcast(t))
        .filter(F.col("i") < F.col("n_tot"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(m_i * n_tot - n_a * i AS DECIMAL(38,0))"
                    " * (m_i * n_tot - n_a * i) * 1000000"
                    " DIV (i * (n_tot - i)) AS DECIMAL(38,0))"
                )
            ).alias("terms")
        )
    )
    return (
        t.crossJoin(F.broadcast(s))
        .select(
            "n_a",
            (F.col("n_tot") - F.col("n_a")).cast("long").alias("n_b"),
            F.round(
                F.col("terms").cast("double")
                / (
                    1e6
                    * F.col("n_a").cast("double")
                    * (F.col("n_tot") - F.col("n_a"))
                    * F.col("n_tot")
                ),
                6,
            ).alias("a2_statistic"),
        )
    )


# ---------------------------------------------------------------------------
# Cramér-von Mises two-sample — completing the EDF trio (KS / CvM / AD).
# ---------------------------------------------------------------------------

_CVM_ORACLE = """
WITH b AS (
  SELECT event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a,
         CAST(round(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS y
  FROM events WHERE event_type IN ('purchase', 'click')
), r AS (
  SELECT is_a, row_number() OVER (ORDER BY y, event_id) AS pooled,
         row_number() OVER (PARTITION BY is_a ORDER BY y, event_id) AS own
  FROM b
), t AS (
  SELECT CAST(SUM(is_a) AS BIGINT) AS n,
         CAST(SUM(1 - is_a) AS BIGINT) AS m
  FROM b
), u AS (
  SELECT
    CAST(SUM(CASE WHEN is_a = 1
                  THEN t.n * CAST(pooled - own AS HUGEINT) * (pooled - own)
                  ELSE 0 END) AS DECIMAL(38,0))
    + CAST(SUM(CASE WHEN is_a = 0
                    THEN t.m * CAST(pooled - own AS HUGEINT) * (pooled - own)
                    ELSE 0 END) AS DECIMAL(38,0)) AS u_stat
  FROM r, t
)
SELECT t.n AS n_a, t.m AS n_b,
       CAST(CAST(u.u_stat AS DECIMAL(38,0)) AS VARCHAR) AS u_stat,
       round(CAST(u.u_stat AS DOUBLE)
             / (CAST(t.n AS DOUBLE) * t.m * (t.n + t.m))
             - (4.0 * t.n * t.m - 1) / (6.0 * (t.n + t.m)), 6)
         AS cvm_t
FROM t, u
"""


@register("agg_cramer_von_mises", oracle=_CVM_ORACLE, tags=("agg", "stats"))
def agg_cramer_von_mises(spark, sf_dir):
    """CRAMÉR-VON MISES two-sample test (Anderson 1962 rank form) —
    the INTEGRATED EDF distance completing the trio (KS: max gap;
    AD: tail-weighted; CvM: unweighted integral): with pooled ranks
    r_i and within-sample ranks i under the pinned (value, event_id)
    total order, U = n Σ_A (r_i − i)² + m Σ_B (s_j − j)² and
    T = U/(nm·N) − (4nm − 1)/(6N). U is an exact DECIMAL(38) integer
    under the driver hash; T is one float expression. Plan: one
    two-pass pooled rank + one keyed within-sample rank window + one
    1-row reduce."""
    from ..operators.scale import global_index

    ev = load_table(spark, sf_dir, "events")
    b = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_a"),
        F.round(dec("value", VAL) * 100).cast("long").alias("y"),
    )
    pooled = global_index(b, "p0", ["y", "event_id"]).select(
        "is_a",
        "y",
        "event_id",
        (F.col("p0") + 1).alias("pooled"),
    )
    r = pooled.withColumn(
        "own",
        F.row_number().over(W.partitionBy("is_a").orderBy("y", "event_id")),
    )
    t = b.agg(
        F.sum("is_a").cast("long").alias("n"),
        F.sum(1 - F.col("is_a")).cast("long").alias("m"),
    )
    gap2 = F.expr(
        "CAST(pooled - own AS DECIMAL(38,0)) * (pooled - own)"
    )
    u = r.crossJoin(F.broadcast(t)).agg(
        (
            F.sum(F.when(F.col("is_a") == 1, F.col("n") * gap2).otherwise(F.lit(0)))
            + F.sum(
                F.when(F.col("is_a") == 0, F.col("m") * gap2).otherwise(F.lit(0))
            )
        ).alias("u_stat")
    )
    return (
        t.crossJoin(F.broadcast(u))
        .select(
            F.col("n").alias("n_a"),
            F.col("m").alias("n_b"),
            # exact integer wider than BIGINT at large SF — hashed as
            # the decimal's exact string (the DeLong rule)
            F.col("u_stat").cast("decimal(38,0)").cast("string").alias("u_stat"),
            F.round(
                F.col("u_stat").cast("double")
                / (F.col("n").cast("double") * F.col("m") * (F.col("n") + F.col("m")))
                - (4.0 * F.col("n") * F.col("m") - 1)
                / (6.0 * (F.col("n") + F.col("m"))),
                6,
            ).alias("cvm_t"),
        )
    )
