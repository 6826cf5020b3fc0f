"""Round-10 wave 7 — normality/effect-size/operating-point evaluation
(Jarque-Bera, Cohen's d + Hedges' g, best-F1 threshold selection),
randomness (turning-points test), graph centralization (Freeman), the
self-BLEU-2 corpus-diversity metric, and the binary-ANN recall
contract that twins sim_hamming_sign_topk with the exact-cosine truth.

Engine capability per the north star (the reference has none of this
surface); the standing exactness discipline throughout: exact
DECIMAL(38)/HUGEINT power sums (the summation-order-sensitive part),
scalar float combination at the edge only, truncating integer division
shared by both engines, round(6).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators import similarity
from ..operators.scale import spread
from ..tables import VAL, dec, load_table
from . import register
from .profiling import _COORDER_EDGES_CTE, _coorder_part_edges

# ---------------------------------------------------------------------------
# Jarque-Bera normality test per event type.
# ---------------------------------------------------------------------------

_JB_ORACLE = """
WITH c AS (
  SELECT event_type,
         CAST(round(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS x
  FROM events
), s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS s1,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS s2,
         CAST(SUM(CAST(x AS HUGEINT) * x * x) AS DOUBLE) AS s3,
         CAST(SUM(CAST(x AS HUGEINT) * x * x * x) AS DOUBLE) AS s4
  FROM c GROUP BY event_type
), m AS (
  SELECT event_type, n_events, n,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * pow(s1 / n, 3) AS m3,
         s4 / n - 4 * (s1 / n) * (s3 / n)
           + 6 * pow(s1 / n, 2) * (s2 / n) - 3 * pow(s1 / n, 4) AS m4
  FROM s
)
SELECT event_type, n_events,
       round(m3 / pow(m2, 1.5), 6) AS skewness,
       round(m4 / (m2 * m2), 6) AS kurtosis,
       round(n / 6.0 * (pow(m3 / pow(m2, 1.5), 2)
             + pow(m4 / (m2 * m2) - 3.0, 2) / 4.0), 6) AS jb_stat
FROM m ORDER BY event_type
"""


@register("agg_jarque_bera", oracle=_JB_ORACLE, tags=("agg", "stats"))
def agg_jarque_bera(spark, sf_dir):
    """JARQUE-BERA normality test (1980) per event type: JB = n/6 ·
    (S² + (K−3)²/4) from population skewness S and kurtosis K —
    the omnibus moment-based normality check that closes the
    distribution-shape axis (agg_moment_stats reports the moments;
    agg_ks_two_sample / anderson_darling compare two SAMPLES; this
    tests one sample against normality itself).

    Exactness: the order-sensitive part — the power sums Σx..Σx⁴ over
    cents — is exact HUGEINT/DECIMAL(38) (x⁴ ~ 1e20/row, Σ ~ 1e26 at
    the 10x probe: inside both engines' 128-bit range); central
    moments, S, K, JB are one scalar float expression per group from
    those exact sums, round(6).

    Scale: ONE map-side-combinable aggregate over the scan; output is
    |event types| rows."""
    c = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(dec("value", VAL) * 100).cast("long").alias("x"),
    )
    s = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("s1"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).cast("double").alias("s2"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x * x"))
        .cast("double")
        .alias("s3"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x * x * x"))
        .cast("double")
        .alias("s4"),
    )
    m = s.select(
        "event_type",
        "n_events",
        "n",
        F.expr("s2 / n - (s1 / n) * (s1 / n)").alias("m2"),
        F.expr("s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * pow(s1 / n, 3)").alias(
            "m3"
        ),
        F.expr(
            "s4 / n - 4 * (s1 / n) * (s3 / n)"
            " + 6 * pow(s1 / n, 2) * (s2 / n) - 3 * pow(s1 / n, 4)"
        ).alias("m4"),
    )
    return m.select(
        "event_type",
        "n_events",
        F.expr("round(m3 / pow(m2, 1.5), 6)").alias("skewness"),
        F.expr("round(m4 / (m2 * m2), 6)").alias("kurtosis"),
        F.expr(
            "round(n / 6.0 * (pow(m3 / pow(m2, 1.5), 2)"
            " + pow(m4 / (m2 * m2) - 3.0, 2) / 4.0), 6)"
        ).alias("jb_stat"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Cohen's d / Hedges' g effect size (purchase vs click).
# ---------------------------------------------------------------------------

_COHEN_ORACLE = """
WITH b AS (
  SELECT event_type,
         CAST(round(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS x
  FROM events WHERE event_type IN ('purchase', 'click')
), m AS (
  SELECT
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS HUGEINT) AS na,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN x END) AS HUGEINT) AS sa1,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(x AS HUGEINT) * x END)
         AS HUGEINT) AS sa2,
    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
    CAST(SUM(CASE WHEN event_type = 'click' THEN x END) AS HUGEINT) AS sb1,
    CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(x AS HUGEINT) * x END)
         AS HUGEINT) AS sb2
  FROM b
), d AS (
  SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
         CAST((sa1 * nb - sb1 * na) * 1000000 // (na * nb) AS BIGINT)
           AS mean_diff_micro_cents,
         (CAST(sa1 AS DOUBLE) / CAST(na AS DOUBLE)
          - CAST(sb1 AS DOUBLE) / CAST(nb AS DOUBLE))
         / sqrt((CAST(na * sa2 - sa1 * sa1 AS DOUBLE) / CAST(na AS DOUBLE)
                 + CAST(nb * sb2 - sb1 * sb1 AS DOUBLE) / CAST(nb AS DOUBLE))
                / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0)) AS dd,
         CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd
  FROM m
)
SELECT n_a, n_b, mean_diff_micro_cents,
       round(dd, 6) AS cohens_d,
       round(dd * (1.0 - 3.0 / (4.0 * (nad + nbd) - 9.0)), 6) AS hedges_g,
       round(dd - 1.96 * sqrt((nad + nbd) / (nad * nbd)
             + dd * dd / (2.0 * (nad + nbd))), 6) AS ci_lo,
       round(dd + 1.96 * sqrt((nad + nbd) / (nad * nbd)
             + dd * dd / (2.0 * (nad + nbd))), 6) AS ci_hi
FROM d
"""


@register("ml_cohens_d_effect", oracle=_COHEN_ORACLE, tags=("llm", "ml", "stats"))
def ml_cohens_d_effect(spark, sf_dir):
    """COHEN's d with the HEDGES' g small-sample correction and the
    standard-normal 95% CI for the purchase-vs-click value gap — the
    PARAMETRIC effect size completing the pair with agg_cliff_delta
    (the rank/ordinal effect size): pooled-SD standardized mean
    difference, g = d·(1 − 3/(4N−9)), se² = N/(n_a·n_b) + d²/(2N).

    Exactness: the mean difference is emitted as an EXACT micro-cents
    integer ((Σa·n_b − Σb·n_a)·1e6 DIV n_a·n_b); the pooled-variance
    numerators n·Σx²−(Σx)² are exact HUGEINT/DECIMAL(38); d/g/CI are
    one scalar float chain from those sums, round(6).

    Scale: ONE conditional aggregate over the filtered scan."""
    b = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "event_type",
            F.round(dec("value", VAL) * 100).cast("long").alias("x"),
        )
    )
    xh = F.expr("CAST(x AS DECIMAL(38,0))")
    is_a = F.col("event_type") == "purchase"
    m = b.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("decimal(38,0)").alias("na"),
        F.sum(F.when(is_a, F.col("x"))).cast("decimal(38,0)").alias("sa1"),
        F.sum(F.when(is_a, xh * F.col("x"))).cast("decimal(38,0)").alias("sa2"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("decimal(38,0)").alias("nb"),
        F.sum(F.when(~is_a, F.col("x"))).cast("decimal(38,0)").alias("sb1"),
        F.sum(F.when(~is_a, xh * F.col("x"))).cast("decimal(38,0)").alias("sb2"),
    )
    d = m.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.expr(
            "CAST((sa1 * nb - sb1 * na) * 1000000 DIV (na * nb) AS BIGINT)"
        ).alias("mean_diff_micro_cents"),
        F.expr(
            "(CAST(sa1 AS DOUBLE) / CAST(na AS DOUBLE)"
            " - CAST(sb1 AS DOUBLE) / CAST(nb AS DOUBLE))"
            " / sqrt((CAST(na * sa2 - sa1 * sa1 AS DOUBLE) / CAST(na AS DOUBLE)"
            " + CAST(nb * sb2 - sb1 * sb1 AS DOUBLE) / CAST(nb AS DOUBLE))"
            " / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0))"
        ).alias("dd"),
        F.col("na").cast("double").alias("nad"),
        F.col("nb").cast("double").alias("nbd"),
    )
    return d.select(
        "n_a",
        "n_b",
        "mean_diff_micro_cents",
        F.expr("round(dd, 6)").alias("cohens_d"),
        F.expr("round(dd * (1.0 - 3.0 / (4.0 * (nad + nbd) - 9.0)), 6)").alias(
            "hedges_g"
        ),
        F.expr(
            "round(dd - 1.96 * sqrt((nad + nbd) / (nad * nbd)"
            " + dd * dd / (2.0 * (nad + nbd))), 6)"
        ).alias("ci_lo"),
        F.expr(
            "round(dd + 1.96 * sqrt((nad + nbd) / (nad * nbd)"
            " + dd * dd / (2.0 * (nad + nbd))), 6)"
        ).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Best-F1 operating-point selection.
# ---------------------------------------------------------------------------

_BEST_F1_ORACLE = """
WITH b AS (
  SELECT CAST(round(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents,
         CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS y
  FROM events
), mx AS (
  SELECT MAX(cents) AS max_c FROM b
), per_bin AS (
  SELECT LEAST(9, cents * 10 // (max_c + 1)) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sum_y
  FROM b, mx GROUP BY LEAST(9, cents * 10 // (max_c + 1))
), sweep AS (
  SELECT t.t,
         CAST(SUM(CASE WHEN p.bin >= t.t THEN p.sum_y ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN p.bin >= t.t THEN p.n - p.sum_y ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN p.bin < t.t THEN p.sum_y ELSE 0 END) AS BIGINT) AS fn
  FROM (SELECT CAST(range AS BIGINT) AS t FROM range(1, 10)) t
  CROSS JOIN per_bin p
  GROUP BY t.t
), scored AS (
  SELECT t AS best_threshold_bin, tp, fp, fn,
         CAST(2 * tp * 1000000 // (2 * tp + fp + fn) AS BIGINT) AS f1_micro
  FROM sweep
)
SELECT * FROM scored ORDER BY f1_micro DESC, best_threshold_bin LIMIT 1
"""


@register("ml_best_f1_threshold", oracle=_BEST_F1_ORACLE, tags=("llm", "ml", "eval"))
def ml_best_f1_threshold(spark, sf_dir):
    """Best-F1 OPERATING POINT over the decile-threshold sweep (predict
    positive at score bin ≥ t, t = 1..9, on the calibration binning):
    ml_pr_curve_points draws the whole curve — this query answers the
    deployment question: which single threshold should the classifier
    ship with, and what are its confusion counts there?

    Exactness: tp/fp/fn exact BIGINTs from the 10-row per-bin rollup;
    F1 = 2·tp·1e6 DIV (2tp+fp+fn) exact truncating micro; the argmax
    (ties → lowest threshold) is an ORDER BY over 9 rows —
    TakeOrderedAndProject, never a sort of data. ZERO float ops.

    Scale: one per-bin aggregate over the scan; the sweep is a 9x10
    broadcast join on tiny relations."""
    b = load_table(spark, sf_dir, "events").select(
        F.round(dec("value", VAL) * 100).cast("long").alias("cents"),
        F.col("event_type").isin("purchase", "signup").cast("int").alias("y"),
    )
    mx = b.agg(F.max("cents").alias("max_c"))
    per_bin = (
        b.crossJoin(F.broadcast(mx))
        .select(F.expr("LEAST(9, cents * 10 DIV (max_c + 1))").alias("bin"), "y")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("sum_y"),
        )
    )
    ts = spark.range(1, 10).select(F.col("id").alias("t"))
    sweep = (
        F.broadcast(ts)
        .crossJoin(per_bin)
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("bin") >= F.col("t"), F.col("sum_y")).otherwise(0))
            .cast("long")
            .alias("tp"),
            F.sum(
                F.when(
                    F.col("bin") >= F.col("t"), F.col("n") - F.col("sum_y")
                ).otherwise(0)
            )
            .cast("long")
            .alias("fp"),
            F.sum(F.when(F.col("bin") < F.col("t"), F.col("sum_y")).otherwise(0))
            .cast("long")
            .alias("fn"),
        )
    )
    scored = sweep.select(
        F.col("t").alias("best_threshold_bin"),
        "tp",
        "fp",
        "fn",
        F.expr("CAST(2 * tp * 1000000 DIV (2 * tp + fp + fn) AS BIGINT)").alias(
            "f1_micro"
        ),
    )
    return scored.orderBy(
        F.desc("f1_micro"), F.asc("best_threshold_bin")
    ).limit(1)


# ---------------------------------------------------------------------------
# Turning-points randomness test on the daily series.
# ---------------------------------------------------------------------------

_TP_ORACLE = """
WITH d AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY date_trunc('day', ts)
), r AS (
  SELECT cents, row_number() OVER (ORDER BY day) AS t FROM d
), s AS (
  SELECT cents - lag(cents) OVER (ORDER BY t) AS d1,
         lead(cents) OVER (ORDER BY t) - cents AS d2
  FROM r
), m AS (
  SELECT CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS n_days,
         CAST(SUM(CASE WHEN d1 IS NOT NULL AND d2 IS NOT NULL
                        AND ((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0))
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
  FROM s
)
SELECT n_days, n_turning,
       CAST(2 * (n_days - 2) AS BIGINT) AS expected_x3,
       CAST(16 * n_days - 29 AS BIGINT) AS var_x90,
       round((n_turning - 2.0 * (n_days - 2) / 3.0)
             / sqrt((16.0 * n_days - 29.0) / 90.0), 6) AS z_score
FROM m
"""


@register("tw_turning_points_test", oracle=_TP_ORACLE, tags=("timeseries", "stats"))
def tw_turning_points_test(spark, sf_dir):
    """TURNING-POINTS randomness test (Kendall): count strict local
    extrema of the daily revenue series (sign(Δ_t)·sign(Δ_{t+1}) < 0);
    under i.i.d. randomness E[T] = 2(n−2)/3, Var[T] = (16n−29)/90 —
    the local-oscillation complement of tw_runs_profile (runs test
    watches level crossings; this watches direction flips, catching
    over-smooth AND over-jagged series).

    Exactness: T, 3·E, 90·Var exact integers; z one float, round(6).
    Lag/lead windows over the bounded day relation (whitelisted)."""
    from .stats3 import _daily

    r = _daily(spark, sf_dir)
    s = r.select(
        (F.col("cents") - F.lag("cents").over(W.orderBy("t"))).alias("d1"),
        (F.lead("cents").over(W.orderBy("t")) - F.col("cents")).alias("d2"),
    )
    n = r.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    m = (
        s.agg(
            F.sum(
                F.when(
                    F.col("d1").isNotNull()
                    & F.col("d2").isNotNull()
                    & (
                        ((F.col("d1") > 0) & (F.col("d2") < 0))
                        | ((F.col("d1") < 0) & (F.col("d2") > 0))
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_turning")
        )
    ).crossJoin(F.broadcast(n))
    return m.select(
        "n_days",
        "n_turning",
        F.expr("CAST(2 * (n_days - 2) AS BIGINT)").alias("expected_x3"),
        F.expr("CAST(16 * n_days - 29 AS BIGINT)").alias("var_x90"),
        F.expr(
            "round((n_turning - 2.0 * (n_days - 2) / 3.0)"
            " / sqrt((16.0 * n_days - 29.0) / 90.0), 6)"
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Freeman degree centralization of the co-order graph.
# ---------------------------------------------------------------------------

_CENTRAL_ORACLE = _COORDER_EDGES_CTE + """
SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(deg) // 2 AS BIGINT) AS n_edges,
       CAST(MAX(deg) AS BIGINT) AS d_max,
       CAST(COUNT(*) * MAX(deg) - SUM(deg) AS BIGINT) AS central_num,
       CAST(COUNT(*) * SUM(deg * deg) - SUM(deg) * SUM(deg) AS BIGINT)
         AS var_num,
       round(CAST(COUNT(*) * MAX(deg) - SUM(deg) AS DOUBLE)
             / ((COUNT(*) - 1.0) * (COUNT(*) - 2.0)), 6)
         AS freeman_centralization,
       round(CAST(COUNT(*) * SUM(deg * deg) - SUM(deg) * SUM(deg) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * COUNT(*)), 6) AS degree_variance
FROM deg
"""


@register("graph_degree_centralization", oracle=_CENTRAL_ORACLE, tags=("graph", "analytics"))
def graph_degree_centralization(spark, sf_dir):
    """FREEMAN degree centralization (1978) of the co-order graph:
    C = Σ(d_max − d_i) / ((n−1)(n−2)) — one scalar for "how
    star-like is this graph" (0 = regular, 1 = perfect star), plus
    the population degree variance — the concentration summary that
    sits above graph_degree_histogram and beside the assortativity /
    rich-club / k_nn(k) mixing lenses.

    Exactness: Σ(d_max−d) = n·d_max − Σd and the variance numerator
    n·Σd² − (Σd)² are exact BIGINTs; the two normalized scalars are
    single float divisions, round(6). Scale: one keyed degree count +
    ONE aggregate row."""
    e = _coorder_part_edges(spark, sf_dir).select("u", "v")
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    return deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.expr("CAST(SUM(deg) DIV 2 AS BIGINT)").alias("n_edges"),
        F.max("deg").cast("long").alias("d_max"),
        F.expr("CAST(COUNT(*) * MAX(deg) - SUM(deg) AS BIGINT)").alias(
            "central_num"
        ),
        F.expr(
            "CAST(COUNT(*) * SUM(deg * deg) - SUM(deg) * SUM(deg) AS BIGINT)"
        ).alias("var_num"),
        F.expr(
            "round(CAST(COUNT(*) * MAX(deg) - SUM(deg) AS DOUBLE)"
            " / ((COUNT(*) - 1.0) * (COUNT(*) - 2.0)), 6)"
        ).alias("freeman_centralization"),
        F.expr(
            "round(CAST(COUNT(*) * SUM(deg * deg) - SUM(deg) * SUM(deg)"
            " AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * COUNT(*)), 6)"
        ).alias("degree_variance"),
    )


# ---------------------------------------------------------------------------
# Self-BLEU-2 corpus diversity for a 20-doc sample.
# ---------------------------------------------------------------------------

_SELF_BLEU_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
), unic AS (
  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT doc_id, unnest(t) AS g FROM toks
  ) GROUP BY doc_id, g
), bic AS (
  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS g
    FROM toks WHERE len(t) >= 2
  ) GROUP BY doc_id, g
), unitop AS (
  SELECT g, MAX(CASE WHEN rk = 1 THEN c END) AS c1,
         MAX(CASE WHEN rk = 1 THEN doc_id END) AS d1,
         COALESCE(MAX(CASE WHEN rk = 2 THEN c END), 0) AS c2
  FROM (SELECT g, doc_id, c,
               row_number() OVER (PARTITION BY g ORDER BY c DESC, doc_id) AS rk
        FROM unic)
  WHERE rk <= 2 GROUP BY g
), bitop AS (
  SELECT g, MAX(CASE WHEN rk = 1 THEN c END) AS c1,
         MAX(CASE WHEN rk = 1 THEN doc_id END) AS d1,
         COALESCE(MAX(CASE WHEN rk = 2 THEN c END), 0) AS c2
  FROM (SELECT g, doc_id, c,
               row_number() OVER (PARTITION BY g ORDER BY c DESC, doc_id) AS rk
        FROM bic)
  WHERE rk <= 2 GROUP BY g
), p1 AS (
  SELECT u.doc_id, CAST(SUM(u.c) AS BIGINT) AS n_uni,
         CAST(SUM(LEAST(u.c, CASE WHEN u.doc_id = t.d1 THEN t.c2 ELSE t.c1 END))
              * 1000000 // SUM(u.c) AS BIGINT) AS p1_micro
  FROM unic u JOIN unitop t USING (g) WHERE u.doc_id < 20 GROUP BY u.doc_id
), p2 AS (
  SELECT b.doc_id, CAST(SUM(b.c) AS BIGINT) AS n_bi,
         CAST(SUM(LEAST(b.c, CASE WHEN b.doc_id = t.d1 THEN t.c2 ELSE t.c1 END))
              * 1000000 // SUM(b.c) AS BIGINT) AS p2_micro
  FROM bic b JOIN bitop t USING (g) WHERE b.doc_id < 20 GROUP BY b.doc_id
)
SELECT p1.doc_id, p1.n_uni, COALESCE(p2.n_bi, 0) AS n_bi, p1.p1_micro,
       COALESCE(p2.p2_micro, 0) AS p2_micro,
       CAST(round(sqrt(CAST(p1.p1_micro AS DOUBLE)
                       * COALESCE(p2.p2_micro, 0))) AS BIGINT)
         AS selfbleu2_micro
FROM p1 LEFT JOIN p2 ON p1.doc_id = p2.doc_id
ORDER BY p1.doc_id
"""


@register("text_self_bleu2", oracle=_SELF_BLEU_ORACLE, tags=("llm", "text", "eval"))
def text_self_bleu2(spark, sf_dir):
    """SELF-BLEU-2 (Zhu et al. 2018 "Texygen") for a fixed 20-doc
    sample against the REST of the corpus as references: geometric
    mean of clipped unigram and bigram precisions — high self-BLEU =
    the corpus repeats itself (the generation-diversity metric,
    complementing text_ngram_novelty_curve which measures global gram
    reuse without per-document clipping semantics).

    The clipped reference count for (doc d, gram g) is max over OTHER
    docs of g's count — computed RELATIONALLY as the per-gram top-2
    counts (rank by count desc, doc_id): ref_max = c2 if d is the
    top-1 holder else c1 (ties collapse correctly because a tied
    top-2 carries the same count). No per-doc scan of the corpus,
    no quadratic pair join — the gram-keyed top-2 window does it.

    Exactness: clipped counts and precisions are exact integers
    (p_n = Σclip·1e6 DIV Σc); the geometric mean is the single float
    op, rounded to an exact micro BIGINT.

    Scale: two (doc, gram)-keyed count relations + per-gram top-2
    windows (partitioned by gram — never single-partition); the
    sample filter prunes the p-side to 20 docs before the join."""
    toks = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x <> '')").alias("t"),
    )
    unic = (
        toks.select("doc_id", F.explode("t").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    bic = (
        toks.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> concat(t[i], ' ', t[i + 1]))"
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )

    def top2(cnts):
        wg = W.partitionBy("g").orderBy(F.desc("c"), F.asc("doc_id"))
        ranked = cnts.withColumn("rk", F.row_number().over(wg)).filter(
            F.col("rk") <= 2
        )
        return ranked.groupBy("g").agg(
            F.max(F.when(F.col("rk") == 1, F.col("c"))).alias("c1"),
            F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("d1"),
            F.coalesce(
                F.max(F.when(F.col("rk") == 2, F.col("c"))), F.lit(0)
            ).alias("c2"),
        )

    def prec(cnts, tops, n_col, p_col):
        return (
            cnts.filter(F.col("doc_id") < 20)
            .join(tops, "g")
            .groupBy("doc_id")
            .agg(
                F.sum("c").cast("long").alias(n_col),
                F.expr(
                    "CAST(SUM(LEAST(c, CASE WHEN doc_id = d1 THEN c2"
                    " ELSE c1 END)) * 1000000 DIV SUM(c) AS BIGINT)"
                ).alias(p_col),
            )
        )

    p1 = prec(unic, top2(unic), "n_uni", "p1_micro")
    p2 = prec(bic, top2(bic), "n_bi", "p2_micro")
    return (
        p1.join(p2, "doc_id", "left")
        .select(
            "doc_id",
            "n_uni",
            F.coalesce("n_bi", F.lit(0)).cast("long").alias("n_bi"),
            "p1_micro",
            F.coalesce("p2_micro", F.lit(0)).cast("long").alias("p2_micro"),
            F.expr(
                "CAST(round(sqrt(CAST(p1_micro AS DOUBLE)"
                " * COALESCE(p2_micro, 0))) AS BIGINT)"
            ).alias("selfbleu2_micro"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Binary-ANN recall contract vs exact cosine.
# ---------------------------------------------------------------------------

_HAMMING_RECALL_ORACLE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
), n AS (
  SELECT vec_id, vec,
         sqrt(list_sum(list_transform(vec, x -> x * x))) AS vnorm
  FROM e
), full_rank AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             round(list_sum(list_transform(range(1, len(q.vec) + 1),
                   i -> q.vec[i] * c.vec[i])) / (q.vnorm * c.vnorm), 5) DESC,
             c.vec_id) AS rank
    FROM n q, n c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
  ) WHERE rank <= 10
), packed AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(range(1, 33),
              i -> CASE WHEN embedding[i] > 0
                        THEN (CAST(1 AS BIGINT) << (i - 1))
                        ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS w0,
         CAST(list_sum(list_transform(range(33, 65),
              i -> CASE WHEN embedding[i] > 0
                        THEN (CAST(1 AS BIGINT) << (i - 33))
                        ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS w1
  FROM embeddings
), ham_rank AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)),
             c.vec_id) AS rank
    FROM packed q, packed c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
  ) WHERE rank <= 10
)
SELECT f.query_id,
       CAST(SUM(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1000
            AS BIGINT) AS recall_bp
FROM full_rank f
LEFT JOIN ham_rank h
  ON f.query_id = h.query_id AND f.neighbor_id = h.neighbor_id
GROUP BY f.query_id
ORDER BY f.query_id
"""


@register("sim_hamming_recall_topk", oracle=_HAMMING_RECALL_ORACLE, tags=("llm", "similarity", "eval"))
def sim_hamming_recall_topk(spark, sf_dir):
    """Recall@10 of the sign-bit Hamming ranking against exact cosine
    — the CONTRACT TWIN of sim_hamming_sign_topk, same pattern the
    LSH/IVF tiers carry (the pairs query shows the ranking; this one
    driver-hashes how much of the exact top-10 the 32x-compressed
    tier retains, per query, as exact integer basis points).

    Both rankings are deterministic (round(5) cosine / exact integer
    Hamming, id tie-breaks), so n_hits is an exact count. Scale: two
    broadcast-queries x one-scan rankings — the Hamming scan reads
    two BIGINTs per row instead of 64 floats; that 32x byte ratio is
    the pre-filter economics this contract prices."""
    emb = load_table(spark, sf_dir, "embeddings")
    full = similarity.cosine_topk(emb, n_queries=10, k=10).select(
        "query_id", "neighbor_id"
    )
    ham = similarity.hamming_topk(emb, n_queries=10, k=10).select(
        "query_id", F.col("neighbor_id").alias("h_neighbor")
    )
    hits = full.join(
        ham,
        (full.query_id == ham.query_id)
        & (full.neighbor_id == ham.h_neighbor),
        "left",
    ).select(full.query_id, "h_neighbor")
    return (
        hits.groupBy("query_id")
        .agg(
            F.sum(F.col("h_neighbor").isNotNull().cast("long")).alias("n_hits"),
            (F.sum(F.col("h_neighbor").isNotNull().cast("long")) * 1000)
            .cast("long")
            .alias("recall_bp"),
        )
        .orderBy("query_id")
    )
