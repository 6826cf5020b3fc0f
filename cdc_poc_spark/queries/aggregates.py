"""Aggregation surface (SURVEY §2.B "Aggregations"): grouped multi-agg,
distinct counting (exact + approximate), rollup/cube/grouping sets,
collect_set, exact percentiles, pivot.

All map-side-combinable aggregates (sum/count/min/max) stay partial+final
— one shuffle of pre-aggregated state, which is what survives 100 TB.
countDistinct expands to a two-phase distinct aggregate;
approx_count_distinct (HLL++) is the single-pass scale path and is
registered rows-only (sketches are engine-specific, no oracle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import BAL, MONEY, VAL, dec, load_table, register_views
from . import register

_STATS_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value,
       CAST(MIN(value) AS DOUBLE) AS min_value,
       CAST(MAX(value) AS DOUBLE) AS max_value
FROM events GROUP BY event_type
"""


@register("agg_stats_by_event_type", oracle=_STATS_ORACLE, tags=("agg",))
def agg_stats_by_event_type(spark, sf_dir):
    """count/sum/avg/min/max in one grouped pass (partial+final)."""
    ev = load_table(spark, sf_dir, "events")
    n = F.count(F.lit(1))
    return ev.groupBy("event_type").agg(
        n.alias("n"),
        F.sum(dec("value", VAL)).cast("double").alias("total"),
        (F.sum(dec("value", VAL)).cast("double") / n).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


_DISTINCT_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT CAST(value AS DECIMAL(12,2))) AS n_values
FROM events GROUP BY event_type
"""


@register("agg_count_distinct", oracle=_DISTINCT_ORACLE, tags=("agg",))
def agg_count_distinct(spark, sf_dir):
    """Exact multi-column distinct aggregates (Catalyst expands to
    two-phase: distinct shuffle then count)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(dec("value", VAL)).alias("n_values"),
    )


_APPROX_CD_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users_exact,
       COUNT(*) AS n,
       TRUE AS approx_within_5pct
FROM events GROUP BY event_type
"""


@register("agg_approx_count_distinct", oracle=_APPROX_CD_ORACLE, tags=("agg", "approx"))
def agg_approx_count_distinct(spark, sf_dir):
    """HLL++ approximate distinct — the single-pass, fixed-memory scale
    path for 100 TB cardinality estimation. Sketch values are
    engine-specific, so the ORACLED columns are the exact cardinality
    plus a bound flag: the query runs BOTH the sketch and the exact
    count and asserts |approx - exact| <= 5% exact in-engine; the
    oracle pins the exact values and expects the flag TRUE. A failing
    sketch breaks the hash — the accuracy contract is driver-checked,
    not just pytest-checked."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
            F.countDistinct("user_id").alias("n_users_exact"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            "n_users_exact",
            "n",
            (
                F.abs(F.col("approx") - F.col("n_users_exact"))
                <= 0.05 * F.col("n_users_exact")
            ).alias("approx_within_5pct"),
        )
    )


_HLL_UNION_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users_exact,
       TRUE AS sketch_within_5pct
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL' AS event_type, COUNT(DISTINCT user_id) AS n_users_exact,
       TRUE AS sketch_within_5pct
FROM events
"""


@register("agg_hll_sketch_union", oracle=_HLL_UNION_ORACLE, tags=("agg", "approx", "sketch"))
def agg_hll_sketch_union(spark, sf_dir):
    """MERGEABLE HLL sketches (Apache DataSketches, Spark 3.5+ builtins):
    per-group sketches estimated locally, then the SAME binary sketches
    re-aggregated with hll_union_agg for the global cardinality — no
    second scan of raw data for the union. This mergeability is the
    whole point at 100 TB: partial sketches combine associatively
    across partitions, days, or clusters. Sketch bytes are
    engine-specific, so the oracled columns are exact cardinalities
    plus an in-engine 5%-accuracy flag per row (incl. the unioned ALL
    row) — the sketch estimates must track exact or the hash breaks."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.countDistinct("user_id").alias("n_users_exact"),
    )
    per_type = sk.select(
        "event_type",
        "n_users_exact",
        F.hll_sketch_estimate("sk").alias("approx"),
    )
    global_row = sk.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("approx"),
    ).crossJoin(
        ev.agg(F.countDistinct("user_id").alias("n_users_exact"))
    ).select("event_type", "n_users_exact", "approx")
    return per_type.unionByName(global_row).select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("approx") - F.col("n_users_exact"))
            <= 0.05 * F.col("n_users_exact")
        ).alias("sketch_within_5pct"),
    )


_ROLLUP_ORACLE = """
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer
GROUP BY ROLLUP (c_mktsegment, c_nationkey)
"""


@register("agg_rollup_segment_nation", oracle=_ROLLUP_ORACLE, tags=("agg", "rollup"))
def agg_rollup_segment_nation(spark, sf_dir):
    """ROLLUP: (seg, nation), (seg), () — subtotal rows carry NULL keys."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.rollup("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("c_acctbal", BAL)).cast("double").alias("total_bal"),
    )


_CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("agg_cube_status_priority", oracle=_CUBE_ORACLE, tags=("agg", "cube"))
def agg_cube_status_priority(spark, sf_dir):
    """CUBE: all four grouping-set combinations."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice", MONEY)).cast("double").alias("total"),
    )


_GSETS_ORACLE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@register("agg_grouping_sets", oracle=_GSETS_ORACLE, tags=("agg", "rollup"))
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via Spark SQL (same Catalyst Expand operator
    as rollup/cube)."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


_COLLECT_ORACLE = """
SELECT r_name, array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
FROM region JOIN nation ON r_regionkey = n_regionkey
GROUP BY r_name
"""


@register("agg_collect_set_nations", oracle=_COLLECT_ORACLE, tags=("agg", "array"))
def agg_collect_set_nations(spark, sf_dir):
    """collect_set -> sorted -> joined to a stable string (set semantics
    verified order-insensitively)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations")
        )
    )


_MEDIAN_ORACLE = """
SELECT event_type,
       quantile_cont(value, 0.5) AS median_value,
       quantile_cont(value, 0.9) AS p90_value
FROM events GROUP BY event_type
"""


@register("agg_percentile_exact", oracle=_MEDIAN_ORACLE, tags=("agg", "percentile"))
def agg_percentile_exact(spark, sf_dir):
    """Exact interpolated percentiles (both engines: linear interpolation
    over the sorted set). The approximate twin is below."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("median_value"),
        F.percentile("value", 0.9).alias("p90_value"),
    )


_PCTL_APPROX_ORACLE = """
SELECT event_type,
       quantile_cont(value, 0.5) AS median_exact,
       TRUE AS approx_in_p45_p55
FROM events GROUP BY event_type
"""


@register("agg_percentile_approx", oracle=_PCTL_APPROX_ORACLE, tags=("agg", "approx"))
def agg_percentile_approx(spark, sf_dir):
    """GK-sketch approximate percentile — fixed-memory scale path.
    Sketch output is engine-specific, so the oracled columns are the
    exact median plus a RANK-BOUND flag: the GK guarantee is rank error
    <= n/accuracy (1000), so the approximate median must land between
    the exact p45 and p55 with huge margin; the oracle pins the exact
    median and expects the flag TRUE."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("median_exact"),
        F.percentile_approx("value", 0.5, 1000)
        .between(
            F.percentile("value", F.lit(0.45)), F.percentile("value", F.lit(0.55))
        )
        .alias("approx_in_p45_p55"),
    )


_PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
FROM orders GROUP BY o_orderpriority
"""


@register("agg_pivot_status_counts", oracle=_PIVOT_ORACLE, tags=("agg", "pivot"))
def agg_pivot_status_counts(spark, sf_dir):
    """Pivot with explicit values (explicit value list = single-pass plan;
    value discovery would need an extra job at scale)."""
    orders = load_table(spark, sf_dir, "orders")
    p = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("F"),
        F.coalesce("O", F.lit(0)).alias("O"),
        F.coalesce("P", F.lit(0)).alias("P"),
    )


_UNPIVOT_ORACLE = """
WITH long AS (
  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
)
SELECT l_returnflag, metric,
       CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total,
       COUNT(*) AS n_rows
FROM long GROUP BY l_returnflag, metric
"""


@register("agg_unpivot_metric_totals", oracle=_UNPIVOT_ORACLE, tags=("agg", "unpivot"))
def agg_unpivot_metric_totals(spark, sf_dir):
    """Native unpivot (wide -> long): 4 measure columns melt to
    (metric, val) rows in ONE scan — the oracle's UNION ALL of 4
    subqueries reads the table 4 times, Spark's `unpivot` is a single
    Generate over each row (reference has no unpivot; standard
    relational surface). Decimal-cast sums for cross-engine exactness."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    )
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )
    return long.groupBy("l_returnflag", "metric").agg(
        F.sum(F.col("val").cast("decimal(18,2)")).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_DENSIFY_ORACLE = """
WITH b AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS lo, MAX(CAST(o_orderdate AS DATE)) AS hi
  FROM orders
),
cal AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(COALESCE(rev, 0) AS DOUBLE) AS revenue
FROM cal LEFT JOIN daily ON day = d
"""


@register("agg_daily_revenue_densified", oracle=_DENSIFY_ORACLE, tags=("agg", "densify", "calendar"))
def agg_daily_revenue_densified(spark, sf_dir):
    """Calendar densification: daily revenue INCLUDING zero-order days.
    The day spine comes from `sequence(min, max)` exploded from the
    one-row bounds aggregate — generated, not scanned, so the spine
    costs |days| rows regardless of fact size; the left join against
    the per-day aggregate is a broadcast (both sides are day-
    cardinality after the agg, never fact-cardinality)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        dec("o_totalprice", MONEY).alias("p"),
    )
    cal = (
        o.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    daily = o.groupBy("d").agg(F.sum("p").alias("rev"))
    zero = F.lit(0).cast(MONEY)
    return cal.join(daily, cal.day == daily.d, "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("rev", zero).cast("double").alias("revenue"),
    )


_ARGMAX_ORACLE = """
SELECT n_name,
       arg_max(s_name, CAST(s_acctbal AS DECIMAL(12,2))) AS top_supplier,
       CAST(MAX(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS top_bal,
       arg_min(s_name, CAST(s_acctbal AS DECIMAL(12,2))) AS bottom_supplier
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


@register("agg_argmax_per_group", oracle=_ARGMAX_ORACLE, tags=("agg", "argmax"))
def agg_argmax_per_group(spark, sf_dir):
    """Per-group argmax/argmin (`max_by`/`min_by`, DuckDB arg_max/
    arg_min): the one-pass alternative to the window row_number=1
    idiom — a single hash aggregate, no per-group sort, no window
    shuffle. Decimal cast keeps the comparison key exact. Assumes
    unique balances per nation in the fixture (argmax ties are
    engine-arbitrary; real pipelines break ties in the key)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    bal = dec("s_acctbal", BAL)
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("s_name", bal).alias("top_supplier"),
            F.max(bal).cast("double").alias("top_bal"),
            F.min_by("s_name", bal).alias("bottom_supplier"),
        )
    )


# ---------------------------------------------------------------------------
# Key-skew profile (shuffle-planning diagnostic — round 5)
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
WITH k AS (
  SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_custkey
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(n) AS BIGINT) AS max_n
  FROM k
), top AS (
  SELECT key, n, row_number() OVER (ORDER BY n DESC, key) AS rnk FROM k
)
SELECT t.rnk AS rnk, t.key, t.n,
       (t.n * 1000000) // tot.n_rows AS share_ppm,
       (t.n * tot.n_keys * 100) // tot.n_rows AS x_avg_pct
FROM top t, tot WHERE t.rnk <= 10
"""


@register("agg_key_skew_profile", oracle=_SKEW_ORACLE, tags=("agg", "skew", "topk"))
def agg_key_skew_profile(spark, sf_dir):
    """Join/shuffle-key skew diagnostic: the top-10 heaviest keys of
    orders.o_custkey with each key's exact row share (ppm) and its
    multiple of the mean key load (percent) — the numbers that decide
    whether a join needs salting (operators/scale.py:salted_join) or
    AQE skew splitting before it runs at 100 TB. All shares are exact
    BIGINT cross-multiplications (no float division). Plan: one
    map-side-combinable key count, a broadcast one-row totals relation,
    TakeOrderedAndProject for the top-10 — never a global sort."""
    from pyspark.sql import Window as W2

    k = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = k.agg(
        F.sum("n").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    # orderBy().limit(10) compiles to TakeOrderedAndProject (per-
    # partition top-10, k rows to the driver side of the sort); the
    # row_number window then ranks only those 10 rows — never a global
    # single-partition sort of the full key relation (r5 review; the
    # docstring's claim, now actually true).
    top10 = k.orderBy(F.desc("n"), F.asc("key")).limit(10)
    top = top10.withColumn(
        "rnk",
        F.row_number().over(W2.orderBy(F.desc("n"), F.asc("key"))).cast("long"),
    )
    return top.crossJoin(F.broadcast(tot)).select(
        "rnk",
        "key",
        "n",
        F.expr("(n * 1000000) DIV n_rows").alias("share_ppm"),
        F.expr("(n * n_keys * 100) DIV n_rows").alias("x_avg_pct"),
    )


# ---------------------------------------------------------------------------
# Deterministic per-group mode (round 5)
# ---------------------------------------------------------------------------

_MODE_ORACLE = """
WITH c AS (
  SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY c_mktsegment, c_nationkey
), r AS (
  SELECT c_mktsegment, c_nationkey, n,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY n DESC, c_nationkey) AS rn
  FROM c
)
SELECT c_mktsegment, c_nationkey AS mode_nation, n AS mode_count
FROM r WHERE rn = 1
"""


@register("agg_mode_per_group", oracle=_MODE_ORACLE, tags=("agg", "mode"))
def agg_mode_per_group(spark, sf_dir):
    """DETERMINISTIC per-group mode: most frequent nation per market
    segment, ties broken by the smallest key — built-in `mode()` is
    tie-arbitrary in both engines, so the reproducible formulation is
    count + one-pass max_by over (count, -key): two map-side-combinable
    hash aggregates, no window, no sort. The shape matters at scale:
    the second agg's input is |group x value| rows (already reduced),
    never the raw table."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pick = F.struct(F.col("n"), (-F.col("c_nationkey")).alias("neg"))
    return c.groupBy("c_mktsegment").agg(
        F.max_by("c_nationkey", pick).alias("mode_nation"),
        F.max_by("n", pick).alias("mode_count"),
    )


# ---------------------------------------------------------------------------
# Pareto revenue concentration ("what fraction of customers is 80% of
# revenue?") via distributed global cumulative sum.
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH r AS (
  SELECT o_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), c AS (
  SELECT o_custkey, cents,
         SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cents) OVER () AS total,
         COUNT(*) OVER () AS n
  FROM r
)
SELECT t.threshold_pct,
       CAST(COALESCE(SUM(CASE WHEN (cum - cents) * 100 < t.threshold_pct * total
                              THEN 1 END), 0) AS BIGINT) AS n_customers,
       round(CAST(COALESCE(SUM(CASE WHEN (cum - cents) * 100 < t.threshold_pct * total
                                    THEN 1 END), 0) AS DOUBLE) / MAX(n), 6) AS share_of_customers
FROM c, (VALUES (50), (80), (90), (95)) t(threshold_pct)
GROUP BY t.threshold_pct
"""


@register("agg_pareto_concentration", oracle=_PARETO_ORACLE, tags=("agg", "stats"))
def agg_pareto_concentration(spark, sf_dir):
    """Revenue concentration curve: for each threshold T in {50, 80,
    90, 95}%, the number (and share) of top customers whose cumulative
    revenue first reaches T% of total — the Pareto 80/20 profile. A
    customer is counted iff the customers STRICTLY before them (by
    cents desc, custkey) haven't yet reached T — i.e. the minimal
    covering prefix — as the exact integer predicate
    (cum - cents)*100 < T*total (no float shares until display).

    Scale shape: the cumulative sum is operators.scale.global_cumsum —
    range repartition + per-partition prefix offsets (an O(#partitions)
    driver collect), NEVER the single-partition `SUM() OVER (ORDER BY)`
    the naive spelling implies (the oracle's spelling, fine for DuckDB's
    single node). Thresholds explode from a 4-element literal; the
    final rollup is 4 rows."""
    from ..operators.scale import global_cumsum

    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(15,2)") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .withColumn("neg", -F.col("cents"))
    )
    cum = global_cumsum(rev, "cents", ["neg", "o_custkey"], cum_col="cum")
    # totals derive from the PINNED cumsum relation (MAX(cum) is the
    # grand total by construction) — no second scan/agg of orders.
    totals = cum.agg(
        F.max("cum").alias("total"), F.count(F.lit(1)).alias("n")
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .withColumn("threshold_pct", F.explode(F.array(*[F.lit(t) for t in (50, 80, 90, 95)])))
        .groupBy("threshold_pct")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("cum") - F.col("cents")) * 100
                        < F.col("threshold_pct").cast("long") * F.col("total"),
                        1,
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_customers"),
            F.max("n").alias("n_all"),
        )
        .select(
            "threshold_pct",
            "n_customers",
            F.round(F.col("n_customers").cast("double") / F.col("n_all"), 6).alias(
                "share_of_customers"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Information-theoretic + distribution-comparison aggregates (round 6).
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH c AS (
  SELECT c.c_mktsegment, o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), g AS (
  SELECT c_mktsegment, CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(COUNT(*) AS BIGINT) AS n_classes,
         SUM(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS snln
  FROM c GROUP BY c_mktsegment
)
SELECT c_mktsegment, n_total, n_classes,
       round(ln(CAST(n_total AS DOUBLE)) - snln / n_total, 6) AS entropy_nats
FROM g
"""


@register("agg_entropy_per_group", oracle=_ENTROPY_ORACLE, tags=("agg", "stats"))
def agg_entropy_per_group(spark, sf_dir):
    """Shannon entropy of the order-priority distribution within each
    market segment — the class-balance / diversity metric every corpus
    report carries (uniform mix -> ln(n_classes), collapsed mix -> 0).
    Exactness: the only floating math is ln over exact BIGINT counts
    and ONE n_classes-term sum per group (<= 5 terms, magnitudes O(n
    ln n)) — identical IEEE expressions on identical integers in both
    engines, rounded to 6 dp. Plan: two map-side-combinable keyed aggs
    (cell counts, then per-group rollup), broadcast-free."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    c = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.sum("n").alias("n_total"),
            F.count(F.lit(1)).alias("n_classes"),
            F.sum(F.col("n").cast("double") * F.log(F.col("n").cast("double"))).alias(
                "snln"
            ),
        )
        .select(
            "c_mktsegment",
            "n_total",
            "n_classes",
            F.round(
                F.log(F.col("n_total").cast("double"))
                - F.col("snln") / F.col("n_total"),
                6,
            ).alias("entropy_nats"),
        )
    )


_CHI2_ORACLE = """
WITH cell AS (
  SELECT c.c_mktsegment, o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS observed
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), rt AS (
  SELECT c_mktsegment, CAST(SUM(observed) AS BIGINT) AS row_total FROM cell GROUP BY 1
), ct AS (
  SELECT o_orderpriority, CAST(SUM(observed) AS BIGINT) AS col_total FROM cell GROUP BY 1
), tot AS (
  SELECT CAST(SUM(observed) AS BIGINT) AS n FROM cell
)
SELECT cell.c_mktsegment, cell.o_orderpriority, cell.observed,
       CAST(rt.row_total * ct.col_total * 1000000 // tot.n AS BIGINT) AS expected_ppm,
       round(
         (CAST(tot.n AS DOUBLE) * cell.observed - CAST(rt.row_total AS DOUBLE) * ct.col_total)
         * (CAST(tot.n AS DOUBLE) * cell.observed - CAST(rt.row_total AS DOUBLE) * ct.col_total)
         / (CAST(tot.n AS DOUBLE) * rt.row_total * ct.col_total), 6) AS chi2_contrib
FROM cell JOIN rt USING (c_mktsegment) JOIN ct USING (o_orderpriority), tot
"""


@register("agg_chi_square_cells", oracle=_CHI2_ORACLE, tags=("agg", "stats"))
def agg_chi_square_cells(spark, sf_dir):
    """Chi-square independence decomposition of the (segment x
    priority) contingency table, PER CELL — observed count, expected
    count (exact integer parts-per-million), and the cell's chi-square
    contribution, so the analyst sees WHICH cells deviate (the scalar
    statistic is the sum; emitting cells keeps every number a single
    arithmetic expression over exact integers — no cross-row float
    accumulation for engines to disagree on). Plan: one cell count +
    two tiny rollups broadcast back onto the cells."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cell = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    rt = cell.groupBy("c_mktsegment").agg(F.sum("observed").alias("row_total"))
    ct = cell.groupBy("o_orderpriority").agg(F.sum("observed").alias("col_total"))
    tot = cell.agg(F.sum("observed").alias("n"))
    nd = F.col("n").cast("double")
    dev = nd * F.col("observed") - F.col("row_total").cast("double") * F.col("col_total")
    return (
        cell.join(F.broadcast(rt), "c_mktsegment")
        .join(F.broadcast(ct), "o_orderpriority")
        .crossJoin(F.broadcast(tot))
        .select(
            "c_mktsegment",
            "o_orderpriority",
            "observed",
            F.expr("row_total * col_total * 1000000 DIV n")
            .cast("long")
            .alias("expected_ppm"),
            F.round(
                dev * dev / (nd * F.col("row_total") * F.col("col_total")), 6
            ).alias("chi2_contrib"),
        )
    )


_KS_ORACLE = """
WITH s AS (
  SELECT CAST(c_acctbal AS DECIMAL(12,2)) AS v,
         CAST(count_if(c_mktsegment = 'BUILDING') AS BIGINT) AS c1,
         CAST(count_if(c_mktsegment = 'MACHINERY') AS BIGINT) AS c2
  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY 1
), cum AS (
  SELECT SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f1,
         SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f2,
         SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
  FROM s
)
SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
       CAST(MAX(abs(f1 * n2 - f2 * n1)) AS BIGINT) AS d_scaled,
       round(CAST(MAX(abs(f1 * n2 - f2 * n1)) AS DOUBLE)
             / (MAX(n1) * MAX(n2)), 6) AS ks_stat
FROM cum
"""


@register("agg_ks_two_sample", oracle=_KS_ORACLE, tags=("agg", "stats"))
def agg_ks_two_sample(spark, sf_dir):
    """EXACT two-sample Kolmogorov-Smirnov statistic between the
    BUILDING and MACHINERY account-balance distributions — the drift
    detector run between corpus snapshots / data deliveries. Exactness:
    D = max|F1 - F2| is computed as an INTEGER max of
    |f1*n2 - f2*n1| over per-value cumulative counts (cents-exact
    DECIMAL values), divided once at the end — no per-step float CDFs.
    Plan: one keyed count over distinct values + one window cumsum over
    the distinct-value relation (|values| rows, not |rows|)."""
    cust = load_table(spark, sf_dir, "customer")
    s = (
        cust.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy(dec("c_acctbal", BAL).alias("v"))
        .agg(
            F.count(F.when(F.col("c_mktsegment") == "BUILDING", 1)).alias("c1"),
            F.count(F.when(F.col("c_mktsegment") == "MACHINERY", 1)).alias("c2"),
        )
    )
    from pyspark.sql import Window as W

    wc = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy()
    cum = s.select(
        F.sum("c1").over(wc).alias("f1"),
        F.sum("c2").over(wc).alias("f2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    return cum.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max(F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))).alias(
            "d_scaled"
        ),
        F.round(
            F.max(F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")))
            .cast("double")
            / (F.max("n1") * F.max("n2")),
            6,
        ).alias("ks_stat"),
    )


_WMEDIAN_ORACLE = """
WITH w AS (
  SELECT c.c_mktsegment,
         CAST(round(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents,
         CAST(COUNT(o.o_orderkey) AS BIGINT) AS wt
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), cum AS (
  SELECT c_mktsegment, cents, wt,
         SUM(wt) OVER (PARTITION BY c_mktsegment ORDER BY cents
                       ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(wt) OVER (PARTITION BY c_mktsegment) AS tw
  FROM w
)
SELECT c_mktsegment, CAST(MAX(tw) AS BIGINT) AS total_weight,
       CAST(MIN(CASE WHEN cw * 2 >= tw THEN cents END) AS BIGINT)
         AS weighted_median_cents
FROM cum GROUP BY c_mktsegment
"""


@register("agg_weighted_median", oracle=_WMEDIAN_ORACLE, tags=("agg", "stats"))
def agg_weighted_median(spark, sf_dir):
    """Order-count-weighted median account balance per segment — the
    weighted-percentile primitive (sampling weights, token weights,
    importance weights) that percentile_approx cannot do exactly.
    Integer predicate: smallest cents value whose cumulative weight
    clears half the total — no interpolation. Plan: one keyed
    count-weight agg + one window over the per-(segment, value)
    relation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    w = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy(
            "c_mktsegment",
            F.round(dec("c_acctbal", BAL) * 100).cast("long").alias("cents"),
        )
        .agg(F.count("o_orderkey").alias("wt"))
    )
    from pyspark.sql import Window as W

    wc = W.partitionBy("c_mktsegment").orderBy("cents").rowsBetween(
        W.unboundedPreceding, 0
    )
    wall = W.partitionBy("c_mktsegment")
    cum = w.select(
        "c_mktsegment",
        "cents",
        F.sum("wt").over(wc).alias("cw"),
        F.sum("wt").over(wall).alias("tw"),
    )
    return cum.groupBy("c_mktsegment").agg(
        F.max("tw").alias("total_weight"),
        F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("cents"))).alias(
            "weighted_median_cents"
        ),
    )


_THEIL_ORACLE = """
WITH x AS (
  SELECT c_mktsegment,
         CAST(round(CAST(c_acctbal AS DECIMAL(12,2)) * 100) + 1100000 AS BIGINT)
           AS cents_pos
  FROM customer
), g AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(cents_pos) AS DECIMAL(38,0)) AS s_g,
         SUM(CAST(cents_pos AS DOUBLE) * ln(CAST(cents_pos AS DOUBLE))) AS sxlnx
  FROM x GROUP BY c_mktsegment
), t AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(s_g) AS DECIMAL(38,0)) AS s FROM g
)
SELECT g.c_mktsegment, g.n_g,
       round((g.sxlnx / CAST(t.s AS DOUBLE))
             - (CAST(g.s_g AS DOUBLE) / CAST(t.s AS DOUBLE))
               * ln(CAST(t.s AS DOUBLE) / t.n), 6) AS theil_share,
       round(CAST(g.s_g AS DOUBLE) / CAST(t.s AS DOUBLE)
             * ln((CAST(g.s_g AS DOUBLE) / g.n_g) / (CAST(t.s AS DOUBLE) / t.n)), 6)
         AS theil_between_term
FROM g, t
"""


@register("agg_theil_index", oracle=_THEIL_ORACLE, tags=("agg", "stats"))
def agg_theil_index(spark, sf_dir):
    """Theil inequality decomposition of (shifted-positive) account
    balances by segment: each segment's share of the overall Theil-T
    index plus its between-group term — the decomposable inequality
    metric Gini cannot split (total T = sum(shares); between-T = sum of
    between terms). Exact integer cents (shifted +11000.00 so every
    value is positive, as Theil requires); the only cross-row float sum
    is sum(x ln x) per group, rounded at 6 dp. Plan: one keyed moments
    agg + a broadcast of the one-row total."""
    cust = load_table(spark, sf_dir, "customer")
    x = cust.select(
        "c_mktsegment",
        (F.round(dec("c_acctbal", BAL) * 100).cast("long") + 1_100_000).alias(
            "cents_pos"
        ),
    )
    g = x.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("cents_pos").cast("decimal(38,0)").alias("s_g"),
        F.sum(
            F.col("cents_pos").cast("double")
            * F.log(F.col("cents_pos").cast("double"))
        ).alias("sxlnx"),
    )
    t = g.agg(
        F.sum("n_g").alias("n"), F.sum("s_g").cast("decimal(38,0)").alias("s")
    )
    sd = F.col("s").cast("double")
    sgd = F.col("s_g").cast("double")
    return g.crossJoin(F.broadcast(t)).select(
        "c_mktsegment",
        "n_g",
        F.round(
            F.col("sxlnx") / sd - (sgd / sd) * F.log(sd / F.col("n")), 6
        ).alias("theil_share"),
        F.round(
            sgd / sd * F.log((sgd / F.col("n_g")) / (sd / F.col("n"))), 6
        ).alias("theil_between_term"),
    )


_GEOMEAN_ORACLE = """
WITH x AS (
  SELECT c_mktsegment,
         CAST(round(ln((CAST(round(CAST(c_acctbal AS DECIMAL(12,2)) * 100)
                        AS BIGINT) + 1100000) / 100.0) * 1000000) AS BIGINT)
           AS ln_micro
  FROM customer
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(ln_micro) AS BIGINT) AS sum_ln_micro,
       round(exp(CAST(SUM(ln_micro) AS DOUBLE) / COUNT(*) / 1000000.0), 4)
         AS geomean_shifted
FROM x GROUP BY c_mktsegment
"""


@register("agg_geometric_mean", oracle=_GEOMEAN_ORACLE, tags=("agg", "stats"))
def agg_geometric_mean(spark, sf_dir):
    """Geometric mean of (positivity-shifted) account balances per
    segment — the multiplicative-average for ratios/growth factors an
    arithmetic mean distorts. Cross-engine exactness via the unigram-LM
    discipline: per-row ln is QUANTIZED to int64 micro-nats BEFORE the
    cross-row sum (a raw double SUM(ln x) is shuffle-order-dependent),
    so the only float ops after aggregation are one division and one
    exp. Map-side-combinable keyed agg."""
    cust = load_table(spark, sf_dir, "customer")
    cents_pos = F.round(dec("c_acctbal", BAL) * 100).cast("long") + 1_100_000
    x = cust.select(
        "c_mktsegment",
        F.round(F.log(cents_pos / 100.0) * 1_000_000).cast("long").alias("ln_micro"),
    )
    return x.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ln_micro").alias("sum_ln_micro"),
        F.round(
            F.exp(F.sum("ln_micro").cast("double") / F.count(F.lit(1)) / 1_000_000.0),
            4,
        ).alias("geomean_shifted"),
    )


# ---------------------------------------------------------------------------
# Round-6: probabilistic-structure contracts — Bloom-filter semi-join
# pre-filter and count-min frequency sketch, both built from first
# principles in relational algebra so the SAME bit/cell math runs in
# both engines (no engine-specific sketch state crosses the boundary).
# ---------------------------------------------------------------------------

_BLOOM_M = 16384  # bit-array size
_BLOOM_K = 4      # hash functions

_BLOOM_ORACLE = f"""
WITH build AS (
  SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
), js AS (
  SELECT unnest([0, 1, 2, 3]) AS j
), bits AS (
  SELECT DISTINCT
         CAST(('0x' || substring(md5('bloom' || CAST(j AS VARCHAR) || ':'
                                      || CAST(key AS VARCHAR)), 1, 8))
              AS BIGINT) % {_BLOOM_M} AS pos
  FROM build, js
), probe AS (
  SELECT DISTINCT o_custkey AS key FROM orders
), pp AS (
  SELECT key, j,
         CAST(('0x' || substring(md5('bloom' || CAST(j AS VARCHAR) || ':'
                                      || CAST(key AS VARCHAR)), 1, 8))
              AS BIGINT) % {_BLOOM_M} AS pos
  FROM probe, js
), passed AS (
  SELECT key FROM pp JOIN bits USING (pos)
  GROUP BY key HAVING COUNT(*) = {_BLOOM_K}
), flags AS (
  SELECT p.key,
         CASE WHEN b.key IS NULL THEN 0 ELSE 1 END AS is_member,
         CASE WHEN ps.key IS NULL THEN 0 ELSE 1 END AS bloom_pass
  FROM probe p
  LEFT JOIN build b ON b.key = p.key
  LEFT JOIN passed ps ON ps.key = p.key
)
SELECT CAST((SELECT COUNT(*) FROM build) AS BIGINT) AS n_build,
       CAST(COUNT(*) AS BIGINT) AS n_probe,
       CAST(SUM(bloom_pass) AS BIGINT) AS bloom_pass,
       CAST(SUM(is_member) AS BIGINT) AS true_members,
       CAST(SUM(CASE WHEN bloom_pass = 1 AND is_member = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS false_positives,
       CAST(SUM(CASE WHEN bloom_pass = 1 AND is_member = 0 THEN 1 ELSE 0 END)
            * 1000000 // (COUNT(*) - SUM(is_member)) AS BIGINT) AS fpr_ppm
FROM flags
"""


@register("agg_bloom_filter_semijoin", oracle=_BLOOM_ORACLE, tags=("agg", "sketch"))
def agg_bloom_filter_semijoin(spark, sf_dir):
    """Bloom-filter semi-join pre-filter CONTRACT: build a k=4/m=16384
    Bloom bit-set over one side's keys (BUILDING-segment customers),
    probe the fact side's distinct keys through it, and report pass /
    true-member / false-positive counts plus the realized FPR in exact
    ppm — the runtime-filter pattern that prunes a 100 TB fact scan
    before the shuffle join (Spark's own runtime row-group skipping,
    built here from first principles so the math is checkable).

    Bloom soundness (zero false NEGATIVES) is implied by
    true_members <= bloom_pass in the output; the realized FPR is the
    quality number. Plan: the bit-set is ~m distinct ints -> broadcast
    to the probe side (map-side membership, no shuffle of the fact
    table); every hash is the engine-portable md5-prefix bigint. All
    outputs exact integers."""
    m, k = _BLOOM_M, _BLOOM_K
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    build = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("key")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")

    def pos():
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("bloom"),
                            F.col("j").cast("string"),
                            F.lit(":"),
                            F.col("key").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % m
        )

    js = F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("j")
    bits = build.select("key", js).select(pos().alias("pos")).distinct()
    probe = orders.select(F.col("o_custkey").alias("key")).distinct()
    pp = probe.select("key", js).select("key", pos().alias("pos"))
    passed = (
        pp.join(F.broadcast(bits), "pos")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") == k)
        .select("key")
    )
    flags = (
        probe.join(F.broadcast(build.withColumn("m", F.lit(1))), "key", "left")
        .join(F.broadcast(passed.withColumn("bp", F.lit(1))), "key", "left")
        .select(
            F.coalesce(F.col("m"), F.lit(0)).alias("is_member"),
            F.coalesce(F.col("bp"), F.lit(0)).alias("bloom_pass"),
        )
    )
    n_build = build.count()
    fp = F.sum(
        F.when((F.col("bloom_pass") == 1) & (F.col("is_member") == 0), 1).otherwise(0)
    )
    return flags.agg(
        F.lit(n_build).cast("long").alias("n_build"),
        F.count(F.lit(1)).alias("n_probe"),
        F.sum("bloom_pass").cast("long").alias("bloom_pass"),
        F.sum("is_member").cast("long").alias("true_members"),
        fp.cast("long").alias("false_positives"),
        F.expr(
            "CAST(SUM(CASE WHEN bloom_pass = 1 AND is_member = 0 THEN 1 ELSE 0 END)"
            " * 1000000 DIV (COUNT(*) - SUM(is_member)) AS BIGINT)"
        ).alias("fpr_ppm"),
    )


_CMS_D = 4    # sketch rows (hash functions)
_CMS_W = 512  # sketch width (cells per row)
_CMS_TOPN = 15

_CMS_ORACLE = f"""
WITH counts AS (
  SELECT o_custkey AS key, COUNT(*) AS exact_n FROM orders GROUP BY o_custkey
), js AS (
  SELECT unnest([0, 1, 2, 3]) AS j
), kp AS (
  SELECT key, exact_n, j,
         CAST(('0x' || substring(md5('cms' || CAST(j AS VARCHAR) || ':'
                                      || CAST(key AS VARCHAR)), 1, 8))
              AS BIGINT) % {_CMS_W} AS pos
  FROM counts, js
), cells AS (
  SELECT j, pos, SUM(exact_n) AS cell_n FROM kp GROUP BY j, pos
), est AS (
  SELECT kp.key, kp.exact_n, MIN(c.cell_n) AS cms_estimate
  FROM kp JOIN cells c ON c.j = kp.j AND c.pos = kp.pos
  GROUP BY kp.key, kp.exact_n
)
SELECT CAST(key AS BIGINT) AS custkey, CAST(exact_n AS BIGINT) AS exact_n,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(cms_estimate - exact_n AS BIGINT) AS overestimate
FROM est
ORDER BY exact_n DESC, custkey
LIMIT {_CMS_TOPN}
"""


@register("agg_countmin_estimate", oracle=_CMS_ORACLE, tags=("agg", "sketch"))
def agg_countmin_estimate(spark, sf_dir):
    """Count-min sketch CONTRACT (Cormode & Muthukrishnan '05): a
    d=4 x w=512 counter grid over per-customer order-counts,
    point-estimate = min over the d hashed cells, reported against the
    exact count for the top-15 customers (overestimate >= 0 always —
    CMS never undercounts; that one-sided bound is what the output
    exhibits).

    Scale shape: the sketch build is a map-side-combinable SUM into
    d*w = 2048 cells regardless of key cardinality — the fixed-size
    mergeable summary you ship from 1000 executors when exact per-key
    counts don't fit; the estimate join is against a 2048-row broadcast.
    Top-15 via TakeOrderedAndProject. All outputs exact integers."""
    d, w = _CMS_D, _CMS_W
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    counts = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    kp = counts.select(
        "key",
        "exact_n",
        F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j"),
    ).select(
        "key",
        "exact_n",
        "j",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("cms"), F.col("j").cast("string"),
                                   F.lit(":"), F.col("key").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % w
        ).alias("pos"),
    )
    cells = kp.groupBy("j", "pos").agg(F.sum("exact_n").alias("cell_n"))
    est = (
        kp.join(F.broadcast(cells), ["j", "pos"])
        .groupBy("key", "exact_n")
        .agg(F.min("cell_n").alias("cms_estimate"))
    )
    return (
        est.select(
            F.col("key").cast("long").alias("custkey"),
            F.col("exact_n").cast("long").alias("exact_n"),
            F.col("cms_estimate").cast("long").alias("cms_estimate"),
            (F.col("cms_estimate") - F.col("exact_n")).cast("long").alias("overestimate"),
        )
        .orderBy(F.desc("exact_n"), "custkey")
        .limit(_CMS_TOPN)
    )


# ---------------------------------------------------------------------------
# Round-6: Mann-Whitney U (rank-sum) two-sample test via the value
# histogram — the nonparametric location test completing the KS /
# chi-square / t-moments family.
# ---------------------------------------------------------------------------

_MWU_ORACLE = """
WITH x AS (
  SELECT CAST(round(CAST(o_totalprice AS DECIMAL(15,2)) * 100) AS BIGINT) AS v,
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS gx
  FROM orders JOIN customer ON c_custkey = o_custkey
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
), h AS (
  SELECT v, SUM(gx) AS nx, SUM(1 - gx) AS ny FROM x GROUP BY v
), c AS (
  SELECT v, nx, ny,
         COALESCE(SUM(ny) OVER (ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cum_y_before
  FROM h
)
SELECT CAST(SUM(nx) AS BIGINT) AS n_x,
       CAST(SUM(ny) AS BIGINT) AS n_y,
       CAST(SUM(nx * (2 * cum_y_before + ny)) AS BIGINT) AS u_x_doubled,
       CAST(2 * SUM(nx) * SUM(ny) - SUM(nx * (2 * cum_y_before + ny)) AS BIGINT)
         AS u_y_doubled,
       CAST(SUM(nx * (2 * cum_y_before + ny)) * 1000000
            // (2 * SUM(nx) * SUM(ny)) AS BIGINT) AS auc_ppm
FROM c
"""


@register("agg_mann_whitney_u", oracle=_MWU_ORACLE, tags=("agg", "stats"))
def agg_mann_whitney_u(spark, sf_dir):
    """Mann-Whitney U two-sample rank test — order totals of BUILDING
    vs MACHINERY customers. Computed WITHOUT ranking individual rows:
    U_x = sum over distinct values v of nx(v) * (#y below v) + ties/2,
    kept exact by doubling (u_x_doubled is an exact integer; ties
    contribute nx*ny per tied value, odd or even). auc_ppm =
    U_x / (n_x*n_y) in exact ppm — the common-language effect size
    (P(X > Y) + P(X = Y)/2).

    Scale shape: rows collapse to the VALUE HISTOGRAM first (keyed agg,
    map-side combinable), and the only ordered pass is a running sum
    over distinct values via operators.scale.global_cumsum — the
    two-pass range-partitioned prefix sum, NOT a single-partition
    `SUM() OVER (ORDER BY ...)` window. The identity U_x + U_y =
    n_x*n_y is visible in the output (u_y_doubled derived, not
    recomputed)."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    x = (
        orders.join(
            F.broadcast(cust.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            F.round(dec("o_totalprice", MONEY) * 100).cast("long").alias("v"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("gx"),
        )
    )
    h = x.groupBy("v").agg(
        F.sum("gx").alias("nx"), F.sum(1 - F.col("gx")).alias("ny")
    )
    from ..operators.scale import global_cumsum

    c = global_cumsum(h, "ny", ["v"], cum_col="cum_y_incl").withColumn(
        "cum_y_before", F.col("cum_y_incl") - F.col("ny")
    )
    term = F.sum(F.col("nx") * (2 * F.col("cum_y_before") + F.col("ny")))
    return c.agg(
        F.sum("nx").cast("long").alias("n_x"),
        F.sum("ny").cast("long").alias("n_y"),
        term.cast("long").alias("u_x_doubled"),
        (2 * F.sum("nx") * F.sum("ny") - term).cast("long").alias("u_y_doubled"),
        F.expr(
            "CAST(SUM(nx * (2 * cum_y_before + ny)) * 1000000"
            " DIV (2 * SUM(nx) * SUM(ny)) AS BIGINT)"
        ).alias("auc_ppm"),
    )


# ---------------------------------------------------------------------------
# Round-6: RFM segmentation with mean-split scoring (broadcast scalar
# thresholds — no global sort, no ntile).
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH m AS (
  SELECT o_custkey,
         MAX(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT))
           AS last_day,
         COUNT(*) AS freq,
         SUM(CAST(round(CAST(o_totalprice AS DECIMAL(15,2)) * 100) AS BIGINT))
           AS cents
  FROM orders GROUP BY o_custkey
), t AS (
  SELECT COUNT(*) AS n, CAST(SUM(last_day) AS BIGINT) AS s_r,
         CAST(SUM(freq) AS BIGINT) AS s_f, CAST(SUM(cents) AS BIGINT) AS s_m
  FROM m
), s AS (
  SELECT CASE WHEN last_day * t.n >= t.s_r THEN 1 ELSE 0 END AS r_hi,
         CASE WHEN freq * t.n > t.s_f THEN 1 ELSE 0 END AS f_hi,
         CASE WHEN cents * t.n > t.s_m THEN 1 ELSE 0 END AS m_hi,
         cents
  FROM m, t
)
SELECT r_hi, f_hi, m_hi, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS cents_total,
       CAST(SUM(cents) // COUNT(*) AS BIGINT) AS cents_avg
FROM s GROUP BY r_hi, f_hi, m_hi
"""


@register("agg_rfm_segmentation", oracle=_RFM_ORACLE, tags=("agg", "analytics"))
def agg_rfm_segmentation(spark, sf_dir):
    """RFM (recency / frequency / monetary) customer segmentation with
    MEAN-split scoring: each customer scores high/low on last-order
    day, order count, and lifetime cents vs the population mean, and
    the output is the 8-cell segment grid with counts and exact
    monetary totals. The mean comparison is kept in exact integers
    (metric * N vs population SUM — no division, no float threshold),
    which is also what makes it scale: the three thresholds are ONE
    broadcast single-row aggregate, against which every customer scores
    map-side — no ntile/percent_rank global sort anywhere (the usual
    RFM-quintile implementation is a single-partition window at 100 TB;
    a mean split is threshold semantics with zero ordered passes)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    m = orders.groupBy("o_custkey").agg(
        F.max(F.unix_date(F.col("o_orderdate").cast("date")).cast("long")).alias(
            "last_day"
        ),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(dec("o_totalprice", MONEY) * 100).cast("long")).alias("cents"),
    )
    t = m.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("last_day").alias("s_r"),
        F.sum("freq").alias("s_f"),
        F.sum("cents").alias("s_m"),
    )
    s = m.crossJoin(F.broadcast(t)).select(
        F.when(F.col("last_day") * F.col("n") >= F.col("s_r"), 1)
        .otherwise(0)
        .alias("r_hi"),
        F.when(F.col("freq") * F.col("n") > F.col("s_f"), 1).otherwise(0).alias("f_hi"),
        F.when(F.col("cents") * F.col("n") > F.col("s_m"), 1).otherwise(0).alias("m_hi"),
        "cents",
    )
    return s.groupBy("r_hi", "f_hi", "m_hi").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("cents_total"),
        F.expr("CAST(SUM(cents) DIV COUNT(*) AS BIGINT)").alias("cents_avg"),
    )


_WELCH_ORACLE = """
WITH x AS (
  SELECT CAST(round(CAST(o_totalprice AS DECIMAL(15,2)) * 100) AS BIGINT) AS v,
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS gx
  FROM orders JOIN customer ON c_custkey = o_custkey
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
), s AS (
  SELECT CAST(SUM(gx) AS BIGINT) AS n1,
         CAST(SUM(1 - gx) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN gx = 1 THEN v ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN gx = 0 THEN v ELSE 0 END) AS BIGINT) AS s2,
         SUM(CASE WHEN gx = 1 THEN CAST(v AS DECIMAL(38,0)) * v ELSE 0 END) AS q1,
         SUM(CASE WHEN gx = 0 THEN CAST(v AS DECIMAL(38,0)) * v ELSE 0 END) AS q2
  FROM x
), d AS (
  SELECT n1, n2,
         CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS mean_diff,
         (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1 AS a1,
         (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) / n2 AS a2
  FROM s
)
SELECT n1 AS n_x, n2 AS n_y,
       round(mean_diff / 100, 4) AS mean_diff_dollars,
       round(mean_diff / sqrt(a1 + a2), 6) AS t_stat,
       round(pow(a1 + a2, 2)
             / (pow(a1, 2) / (n1 - 1) + pow(a2, 2) / (n2 - 1)), 4) AS df_welch
FROM d
"""


@register("agg_welch_t_test", oracle=_WELCH_ORACLE, tags=("agg", "stats"))
def agg_welch_t_test(spark, sf_dir):
    """Welch's unequal-variance t-test on order totals (BUILDING vs
    MACHINERY customers) — completing the two-sample family alongside
    KS (distribution shape), chi-square (categorical), and
    Mann-Whitney (rank location): Welch is the parametric mean test
    robust to unequal variances, with Welch-Satterthwaite effective df.

    Exactness discipline: everything up to the final t/df expressions
    is exact integer state — BIGINT sums and DECIMAL(38) sums of
    squares of integer cents — so the only float ops are the SAME
    closed-form expressions on identical integers in both engines.
    Plan: one map-side-combinable conditional aggregate over the
    broadcast-dim join; no shuffle wider than the 1-row moment state."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    x = orders.join(
        F.broadcast(cust.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))),
        F.col("c_custkey") == F.col("o_custkey"),
    ).select(
        F.round(dec("o_totalprice", MONEY) * 100).cast("long").alias("v"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("gx"),
    )
    s = x.agg(
        F.sum("gx").cast("long").alias("n1"),
        F.sum(1 - F.col("gx")).cast("long").alias("n2"),
        F.sum(F.when(F.col("gx") == 1, F.col("v")).otherwise(0)).cast("long").alias("s1"),
        F.sum(F.when(F.col("gx") == 0, F.col("v")).otherwise(0)).cast("long").alias("s2"),
        F.sum(
            F.when(F.col("gx") == 1, F.col("v").cast("decimal(38,0)") * F.col("v")).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("q1"),
        F.sum(
            F.when(F.col("gx") == 0, F.col("v").cast("decimal(38,0)") * F.col("v")).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("q2"),
    )
    mean_diff = F.col("s1").cast("double") / F.col("n1") - F.col("s2").cast(
        "double"
    ) / F.col("n2")
    a1 = (
        (F.col("q1").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n1"))
        / (F.col("n1") - 1)
        / F.col("n1")
    )
    a2 = (
        (F.col("q2").cast("double") - F.col("s2").cast("double") * F.col("s2") / F.col("n2"))
        / (F.col("n2") - 1)
        / F.col("n2")
    )
    d = s.select(
        F.col("n1").alias("n_x"),
        F.col("n2").alias("n_y"),
        mean_diff.alias("mean_diff"),
        a1.alias("a1"),
        a2.alias("a2"),
    )
    return d.select(
        "n_x",
        "n_y",
        F.round(F.col("mean_diff") / 100, 4).alias("mean_diff_dollars"),
        F.round(F.col("mean_diff") / F.sqrt(F.col("a1") + F.col("a2")), 6).alias(
            "t_stat"
        ),
        F.round(
            F.pow(F.col("a1") + F.col("a2"), 2)
            / (
                F.pow(F.col("a1"), 2) / (F.col("n_x") - 1)
                + F.pow(F.col("a2"), 2) / (F.col("n_y") - 1)
            ),
            4,
        ).alias("df_welch"),
    )


# ---------------------------------------------------------------------------
# Round-6: Poisson bootstrap (Chamandy et al., "Estimating Uncertainty
# for Massive Data Streams", Google 2012) — the distributed bootstrap.
# ---------------------------------------------------------------------------

_BOOT_B = 64
# Poisson(1) inverse-CDF thresholds scaled to 2^32, k = 0..9 (P(k > 9)
# replaced by k = 10 — probability < 1e-7). Integer compares only, so
# both engines derive IDENTICAL replicate weights from the same md5.
_BOOT_T = [1580030169, 3160060337, 3950075422, 4213413783, 4279248374,
           4292415292, 4294609778, 4294923276, 4294962463, 4294966817]


def _boot_w_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_BOOT_T)
    )
    return f"CASE {cases} ELSE 10 END"


_BOOT_ORACLE = f"""
WITH b AS (
  SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS rep
), r AS (
  SELECT rep,
         CAST(round(CAST(o_totalprice AS DECIMAL(15,2)) * 100) AS BIGINT) AS v,
         CAST(('0x' || substring(md5('boot' || CAST(rep AS VARCHAR) || ':'
                                      || CAST(o_orderkey AS VARCHAR)), 1, 8))
              AS BIGINT) AS u
  FROM orders, b
), w AS (
  SELECT rep, v, {_boot_w_sql("u")} AS wt FROM r
)
SELECT rep, CAST(SUM(wt) AS BIGINT) AS n_eff,
       CAST(CAST(SUM(CAST(wt AS DECIMAL(38,0)) * v) AS HUGEINT) * 1000000
            // CAST(SUM(wt) AS HUGEINT) AS BIGINT) AS mean_micro_cents
FROM w GROUP BY rep
"""


@register("agg_poisson_bootstrap", oracle=_BOOT_ORACLE, tags=("agg", "stats", "approx"))
def agg_poisson_bootstrap(spark, sf_dir):
    """POISSON BOOTSTRAP of the mean order value: 64 replicates where
    every row enters replicate b with an independent Poisson(1) weight
    derived from md5(b, key) through an exact integer inverse-CDF
    lookup. One row per replicate (effective n, exact floor-divided
    micro-cents mean); the caller reads the replicate spread as the
    sampling distribution (CI = order statistics of these 64 values).

    This is THE bootstrap that works on 100 TB (Chamandy et al. 2012):
    classic resampling needs N draws per replicate from a global
    multinomial — impossible to coordinate across executors — while
    Poisson weights are PER-ROW INDEPENDENT, so all B replicates
    compute in one map-side pass + one 64-row aggregate, no shuffle of
    the data, no coordination. Exactness: integer thresholds (scaled
    2^32), integer weights, DECIMAL(38) weighted sums, HUGEINT-floor
    division — bit-identical across engines by construction."""
    from ..operators.scale import spread

    # spread BEFORE the x64 explode: a single-row-group orders file
    # scans as ONE task, and 64x per-row md5 work on one core is the
    # bottleneck (measured: 15.0 s at sf0.1 single-file vs 8.1 s at
    # 10x the data in a 32-split layout — parallelism, not volume).
    orders = spread(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    )
    r0 = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("rep"),
    )
    r = r0.select(
        "rep",
        F.round(dec("o_totalprice", MONEY) * 100).cast("long").alias("v"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot"),
                        F.col("rep").cast("string"),
                        F.lit(":"),
                        F.col("o_orderkey").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("u"),
    )
    w = r.select("rep", "v", F.expr(_boot_w_sql("u")).alias("wt"))
    return w.groupBy("rep").agg(
        F.sum("wt").cast("long").alias("n_eff"),
        F.expr(
            "CAST(SUM(CAST(wt AS DECIMAL(38,0)) * v) * 1000000"
            " DIV SUM(CAST(wt AS BIGINT)) AS BIGINT)"
        ).alias("mean_micro_cents"),
    )


_BAYES_AB_ORACLE = """
WITH x AS (
  SELECT c_mktsegment AS seg,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
           AS conv
  FROM orders JOIN customer ON c_custkey = o_custkey
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY c_mktsegment
), p AS (
  SELECT seg, n, conv,
         CAST((conv + 1) * 1000000 // (n + 2) AS BIGINT) AS post_mean_ppm,
         CAST(conv + 1 AS DOUBLE) / (n + 2) AS m,
         CAST(conv + 1 AS DOUBLE) * (n + 1 - conv)
           / ((n + 2) * (n + 2) * (n + 3)) AS var
  FROM x
)
SELECT a.seg AS seg_a, b.seg AS seg_b,
       a.n AS n_a, a.conv AS conv_a, a.post_mean_ppm AS post_mean_a_ppm,
       b.n AS n_b, b.conv AS conv_b, b.post_mean_ppm AS post_mean_b_ppm,
       round((a.m - b.m) / sqrt(a.var + b.var), 4) AS z_a_gt_b
FROM p a JOIN p b ON a.seg < b.seg
"""


@register("agg_bayes_ab_posterior", oracle=_BAYES_AB_ORACLE, tags=("agg", "stats"))
def agg_bayes_ab_posterior(spark, sf_dir):
    """Bayesian A/B comparison of finalized-order rates (BUILDING vs
    MACHINERY) under a Beta(1,1) prior: exact-ppm posterior means
    ((conv+1)/(n+2) by integer floor division) plus the normal-
    approximate z-score of P(rate_A > rate_B) from the closed-form
    Beta posterior moments — the decision number an experimentation
    platform reports without any sampling.

    Exactness: counts and posterior means are exact integers; the one
    float expression (z) is the same closed form on identical integers
    in both engines, rounded at the edge. Plan: one conditional keyed
    agg over the broadcast-dim join, then a 2-row self-join."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    x = (
        orders.join(
            F.broadcast(
                cust.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("long")
            .alias("conv"),
        )
    )
    p = x.select(
        "seg",
        "n",
        "conv",
        F.expr("CAST((conv + 1) * 1000000 DIV (n + 2) AS BIGINT)").alias(
            "post_mean_ppm"
        ),
        ((F.col("conv") + 1).cast("double") / (F.col("n") + 2)).alias("m"),
        (
            (F.col("conv") + 1).cast("double")
            * (F.col("n") + 1 - F.col("conv"))
            / ((F.col("n") + 2) * (F.col("n") + 2) * (F.col("n") + 3))
        ).alias("var"),
    )
    a = p.select(
        F.col("seg").alias("seg_a"),
        F.col("n").alias("n_a"),
        F.col("conv").alias("conv_a"),
        F.col("post_mean_ppm").alias("post_mean_a_ppm"),
        F.col("m").alias("m_a"),
        F.col("var").alias("var_a"),
    )
    b = p.select(
        F.col("seg").alias("seg_b"),
        F.col("n").alias("n_b"),
        F.col("conv").alias("conv_b"),
        F.col("post_mean_ppm").alias("post_mean_b_ppm"),
        F.col("m").alias("m_b"),
        F.col("var").alias("var_b"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("seg_a") < F.col("seg_b"))
        .select(
            "seg_a",
            "seg_b",
            "n_a",
            "conv_a",
            "post_mean_a_ppm",
            "n_b",
            "conv_b",
            "post_mean_b_ppm",
            F.round(
                (F.col("m_a") - F.col("m_b"))
                / F.sqrt(F.col("var_a") + F.col("var_b")),
                4,
            ).alias("z_a_gt_b"),
        )
    )


_CAPTURE_ORACLE = """
WITH pool AS (
  SELECT DISTINCT o_custkey AS key FROM orders
), s1 AS (
  SELECT key FROM pool
  WHERE CAST(('0x' || substring(md5('cap1:' || CAST(key AS VARCHAR)), 1, 8))
             AS BIGINT) % 100 < 30
), s2 AS (
  SELECT key FROM pool
  WHERE CAST(('0x' || substring(md5('cap2:' || CAST(key AS VARCHAR)), 1, 8))
             AS BIGINT) % 100 < 30
), m AS (
  SELECT CAST((SELECT COUNT(*) FROM pool) AS BIGINT) AS true_n,
         CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n1,
         CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n2,
         CAST((SELECT COUNT(*) FROM s1 JOIN s2 USING (key)) AS BIGINT) AS n_both
)
SELECT true_n, n1, n2, n_both,
       CAST((n1 + 1) * (n2 + 1) // (n_both + 1) - 1 AS BIGINT) AS chapman_estimate,
       CAST(CASE WHEN (n1 + 1) * (n2 + 1) // (n_both + 1) - 1 >= true_n
                 THEN 1 ELSE -1 END
            * (abs((n1 + 1) * (n2 + 1) // (n_both + 1) - 1 - true_n) * 1000000
               // true_n) AS BIGINT) AS rel_err_ppm
FROM m
"""


@register("agg_capture_recapture", oracle=_CAPTURE_ORACLE, tags=("agg", "stats", "approx"))
def agg_capture_recapture(spark, sf_dir):
    """CAPTURE-RECAPTURE population estimation (Chapman's estimator):
    two independent deterministic 30% samples of the active-customer
    pool; the overlap rate estimates the total population as
    (n1+1)(n2+1)/(m+1) - 1 — the technique for sizing what you cannot
    enumerate (distinct users across unlinkable logs, coverage of a
    crawl against the true web segment), here run against a KNOWN
    truth so the driver hashes the estimator's exact realized error.

    Deterministic md5 sampling (independent salts), exact integer
    Chapman estimate (floor division on nonnegative operands —
    identical in both engines), and a SIGNED rel_err_ppm in the
    sign-times-abs-floor-division form (DuckDB floors negative
    quotients, Spark truncates — the same cross-engine hazard the
    power-iteration scaling hit; abs() makes floor == trunc and the
    sign is reapplied outside)."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    pool = orders.select(F.col("o_custkey").alias("key")).distinct()

    def samp(salt):
        return pool.filter(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt), F.col("key").cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % 100
            < 30
        )

    s1, s2 = samp("cap1:"), samp("cap2:")
    m = (
        pool.agg(F.count(F.lit(1)).alias("true_n"))
        .crossJoin(s1.agg(F.count(F.lit(1)).alias("n1")))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(
            s1.join(s2, "key").agg(F.count(F.lit(1)).alias("n_both"))
        )
    )
    return m.select(
        "true_n",
        "n1",
        "n2",
        "n_both",
        F.expr("CAST((n1 + 1) * (n2 + 1) DIV (n_both + 1) - 1 AS BIGINT)").alias(
            "chapman_estimate"
        ),
        F.expr(
            "CAST(CASE WHEN (n1 + 1) * (n2 + 1) DIV (n_both + 1) - 1 >= true_n"
            " THEN 1 ELSE -1 END"
            " * (abs((n1 + 1) * (n2 + 1) DIV (n_both + 1) - 1 - true_n) * 1000000"
            " DIV true_n) AS BIGINT)"
        ).alias("rel_err_ppm"),
    )


_HILL_K = 200

_HILL_ORACLE = f"""
WITH top AS (
  SELECT CAST(round(CAST(o_totalprice AS DECIMAL(15,2)) * 100) AS BIGINT) AS v
  FROM orders
  ORDER BY v DESC, o_orderkey
  LIMIT {_HILL_K}
), mn AS (
  SELECT CAST(MIN(v) AS BIGINT) AS x_k FROM top
), s AS (
  SELECT CAST(SUM(CAST(round(ln(CAST(top.v AS DOUBLE) / mn.x_k) * 1000000)
                       AS BIGINT)) AS BIGINT) AS sum_ln_micro
  FROM top, mn
)
SELECT CAST({_HILL_K} AS BIGINT) AS k, mn.x_k,
       s.sum_ln_micro,
       round({_HILL_K - 1} * 1000000.0 / s.sum_ln_micro, 4) AS hill_alpha
FROM s, mn
"""


@register("agg_tail_index_hill", oracle=_HILL_ORACLE, tags=("agg", "stats"))
def agg_tail_index_hill(spark, sf_dir):
    """HILL ESTIMATOR of the power-law tail index over the top-200
    order values: alpha_hat = (k-1) / sum ln(X_i / X_(k)) — the
    standard heavy-tail diagnostic (alpha <= 2 means infinite
    variance: means and z-tests silently stop working; this is the
    check that says whether agg_moment_stats can be trusted on a
    column). Complements the Zipf slope (rank-frequency) and Pareto
    concentration (share curves) with the extreme-value-theory number.

    Plan: ONE TakeOrderedAndProject(200) — never a global sort — then
    a broadcast min and a 200-row micro-nat sum; the only float op
    after quantization is the final division. At 100 TB the top-k is
    the per-partition-heap + driver-merge Spark already implements."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    top = (
        orders.select(
            F.round(dec("o_totalprice", MONEY) * 100).cast("long").alias("v"),
            "o_orderkey",
        )
        .orderBy(F.desc("v"), "o_orderkey")
        .limit(_HILL_K)
        .select("v")
    )
    mn = top.agg(F.min("v").alias("x_k"))
    s = top.crossJoin(F.broadcast(mn)).agg(
        F.sum(
            F.round(F.log(F.col("v").cast("double") / F.col("x_k")) * 1_000_000)
            .cast("long")
        ).alias("sum_ln_micro"),
        F.max("x_k").alias("x_k"),
    )
    return s.select(
        F.lit(_HILL_K).cast("long").alias("k"),
        "x_k",
        "sum_ln_micro",
        F.round((_HILL_K - 1) * 1_000_000.0 / F.col("sum_ln_micro"), 4).alias(
            "hill_alpha"
        ),
    )


_WINSOR_ORACLE = """
WITH x AS (
  SELECT c_mktsegment AS seg,
         CAST(round(CAST(o_totalprice AS DECIMAL(15,2)) * 100) AS BIGINT) AS v
  FROM orders JOIN customer ON c_custkey = o_custkey
), h AS (
  SELECT seg, v, CAST(COUNT(*) AS BIGINT) AS cnt FROM x GROUP BY seg, v
), c AS (
  SELECT seg, v, cnt,
         SUM(cnt) OVER (PARTITION BY seg ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(cnt) OVER (PARTITION BY seg) AS n
  FROM h
), t AS (
  -- discrete order statistics: smallest v whose cumulative count
  -- reaches ceil(q * n) (exact integers — no interpolation)
  SELECT seg,
         CAST(MIN(CASE WHEN cum * 20 >= n THEN v END) AS BIGINT) AS t_lo,
         CAST(MIN(CASE WHEN cum * 20 >= 19 * n THEN v END) AS BIGINT) AS t_hi
  FROM c GROUP BY seg
)
SELECT x.seg, CAST(COUNT(*) AS BIGINT) AS n, t.t_lo, t.t_hi,
       CAST(SUM(LEAST(GREATEST(x.v, t.t_lo), t.t_hi)) AS BIGINT)
         AS winsorized_cents_total,
       CAST(SUM(LEAST(GREATEST(x.v, t.t_lo), t.t_hi)) // COUNT(*) AS BIGINT)
         AS winsorized_cents_mean
FROM x JOIN t ON t.seg = x.seg
GROUP BY x.seg, t.t_lo, t.t_hi
"""


@register("agg_winsorized_mean", oracle=_WINSOR_ORACLE, tags=("agg", "stats"))
def agg_winsorized_mean(spark, sf_dir):
    """WINSORIZED mean per segment: clamp order cents into the
    [p5, p95] band before averaging — the robust mean that keeps tail
    rows (unlike trimming) but caps their leverage; alongside MAD
    (robust spread) this completes the outlier-resistant location
    pair. Thresholds are DISCRETE order statistics (smallest value
    whose cumulative count reaches ceil(q*n) — exact integers via the
    cum*20 >= n cross-multiplication, no interpolation, no floats), so
    the clamped sum is an exact BIGINT.

    Plan: rows collapse to the per-segment value histogram; the
    cumulative pass is a window over HISTOGRAM-sized input partitioned
    by segment (parallel across segments; per-partition size = the
    segment's distinct values — at 100 TB still histogram-scale, and
    the global_cumsum two-pass form is the drop-in if one segment's
    histogram outgrows a task); thresholds broadcast back for a
    map-side clamp + keyed sum."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    x = orders.join(
        F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(dec("o_totalprice", MONEY) * 100).cast("long").alias("v"),
    )
    h = x.groupBy("seg", "v").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window as W

    wc = W.partitionBy("seg").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    wn = W.partitionBy("seg")
    c = h.select(
        "seg",
        "v",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    t = c.groupBy("seg").agg(
        F.min(F.when(F.col("cum") * 20 >= F.col("n"), F.col("v"))).alias("t_lo"),
        F.min(F.when(F.col("cum") * 20 >= 19 * F.col("n"), F.col("v"))).alias(
            "t_hi"
        ),
    )
    clamped = F.least(F.greatest(F.col("v"), F.col("t_lo")), F.col("t_hi"))
    return (
        x.join(F.broadcast(t), "seg")
        .groupBy("seg", "t_lo", "t_hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(clamped).alias("winsorized_cents_total"),
            F.expr(
                "CAST(SUM(LEAST(GREATEST(v, t_lo), t_hi)) DIV COUNT(*) AS BIGINT)"
            ).alias("winsorized_cents_mean"),
        )
        .select(
            "seg", "n", "t_lo", "t_hi",
            "winsorized_cents_total", "winsorized_cents_mean",
        )
    )


_MI_ORACLE = """
WITH j AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS pri
  FROM orders JOIN customer ON c_custkey = o_custkey
), cell AS (
  SELECT seg, pri, CAST(COUNT(*) AS BIGINT) AS n_xy FROM j GROUP BY seg, pri
), mx AS (
  SELECT seg, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM cell GROUP BY seg
), my AS (
  SELECT pri, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM cell GROUP BY pri
), n AS (
  SELECT CAST(SUM(n_xy) AS BIGINT) AS total FROM cell
), q AS (
  SELECT cell.seg, cell.pri, cell.n_xy,
         cell.n_xy * CAST(round(ln(CAST(cell.n_xy AS DOUBLE) * n.total
                                   / (CAST(mx.n_x AS DOUBLE) * my.n_y))
                                * 1000000) AS BIGINT) AS mi_contrib_micro
  FROM cell JOIN mx ON mx.seg = cell.seg JOIN my ON my.pri = cell.pri, n
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(mi_contrib_micro) AS BIGINT) AS mi_weighted_micro,
       round(CAST(SUM(mi_contrib_micro) AS DOUBLE)
             / (SELECT total FROM n) / 1000000, 6) AS mi_nats
FROM q
"""


@register("agg_mutual_information", oracle=_MI_ORACLE, tags=("agg", "stats"))
def agg_mutual_information(spark, sf_dir):
    """MUTUAL INFORMATION between customer segment and order priority —
    the information-theoretic dependence measure completing the
    categorical pair alongside chi-square (which tests significance;
    MI quantifies the dependence in nats and is what feature-selection
    ranks by). MI = sum over cells of p(x,y) ln(p(x,y)/(p(x)p(y))),
    computed from ONE contingency count with the marginals derived
    from it (no second scan), per-cell ln quantized to micro-nats
    before the weighted sum — the unigram-LM discipline. Empty cells
    contribute 0 by the x*ln(x) limit and simply don't appear in the
    count relation."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = orders.join(
        F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")
    ).select(F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri"))
    cell = j.groupBy("seg", "pri").agg(F.count(F.lit(1)).alias("n_xy"))
    mx = cell.groupBy("seg").agg(F.sum("n_xy").alias("n_x"))
    my = cell.groupBy("pri").agg(F.sum("n_xy").alias("n_y"))
    n = cell.agg(F.sum("n_xy").alias("total"))
    q = (
        cell.join(F.broadcast(mx), "seg")
        .join(F.broadcast(my), "pri")
        .crossJoin(F.broadcast(n))
        .select(
            "n_xy",
            "total",
            (
                F.col("n_xy")
                * F.round(
                    F.log(
                        F.col("n_xy").cast("double")
                        * F.col("total")
                        / (F.col("n_x").cast("double") * F.col("n_y"))
                    )
                    * 1_000_000
                ).cast("long")
            ).alias("mi_contrib_micro"),
        )
    )
    return q.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("mi_contrib_micro").cast("long").alias("mi_weighted_micro"),
        F.round(
            F.sum("mi_contrib_micro").cast("double") / F.max("total") / 1_000_000, 6
        ).alias("mi_nats"),
    )


_SIMPSON_ORACLE = """
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_i
  FROM documents GROUP BY source
), t AS (
  SELECT CAST(SUM(n_i) AS BIGINT) AS n,
         CAST(SUM(n_i * (n_i - 1)) AS BIGINT) AS pairs_same
  FROM c
)
SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_sources, t.n AS n_docs,
       CAST(1000000 - pairs_same * 1000000 // (n * (n - 1)) AS BIGINT)
         AS simpson_diversity_ppm,
       CAST(n * (n - 1) * 1000000 // ((SELECT COUNT(*) FROM c)
            * pairs_same) AS BIGINT) AS evenness_hill2_ppm_of_max
FROM t
"""


@register("agg_simpson_diversity", oracle=_SIMPSON_ORACLE, tags=("agg", "stats"))
def agg_simpson_diversity(spark, sf_dir):
    """SIMPSON DIVERSITY of corpus sources — P(two random docs come
    from different sources), the concentration-robust diversity number
    a mixture pipeline monitors next to entropy (Simpson weights
    dominant sources harder, so a creeping monoculture moves it
    faster). Exact rational arithmetic throughout: 1 - sum n_i(n_i-1)
    / (N(N-1)) in floor ppm, plus the Hill-2 evenness (inverse-Simpson
    / richness) as ppm of its maximum — both integer
    cross-multiplications, no floats at all."""
    docs = load_table(spark, sf_dir, "documents").select("source")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_i"))
    t = c.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.sum("n_i").alias("n"),
        F.sum(F.col("n_i") * (F.col("n_i") - 1)).alias("pairs_same"),
    )
    return t.select(
        F.col("n_sources").cast("long").alias("n_sources"),
        F.col("n").cast("long").alias("n_docs"),
        F.expr(
            "CAST(1000000 - pairs_same * 1000000 DIV (n * (n - 1)) AS BIGINT)"
        ).alias("simpson_diversity_ppm"),
        F.expr(
            "CAST(n * (n - 1) * 1000000 DIV (n_sources * pairs_same) AS BIGINT)"
        ).alias("evenness_hill2_ppm_of_max"),
    )


# ---------------------------------------------------------------------------
# Round-8: rank correlation — Spearman's rho over per-customer features.
# ---------------------------------------------------------------------------

_SPEARMAN_ORACLE = """
WITH f AS (
  SELECT c.c_custkey,
         CAST(round(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT) AS bal,
         CAST(SUM(round(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100)) AS BIGINT)
           AS spend
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), r AS (
  SELECT CAST(rank() OVER (ORDER BY bal, c_custkey) AS BIGINT) AS rx,
         CAST(rank() OVER (ORDER BY spend, c_custkey) AS BIGINT) AS ry
  FROM f
), m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(rx) AS DECIMAL(38,0)) AS DOUBLE) AS sx,
         CAST(CAST(SUM(ry) AS DECIMAL(38,0)) AS DOUBLE) AS sy,
         CAST(CAST(SUM(rx * rx) AS DECIMAL(38,0)) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(ry * ry) AS DECIMAL(38,0)) AS DOUBLE) AS syy,
         CAST(CAST(SUM(rx * ry) AS DECIMAL(38,0)) AS DOUBLE) AS sxy
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_rows,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS spearman_rho
FROM m
"""


@register("agg_spearman_rho", oracle=_SPEARMAN_ORACLE, tags=("agg", "stats"))
def agg_spearman_rho(spark, sf_dir):
    """Spearman rank correlation between a customer's account balance
    and their total order spend — the monotone-association twin of the
    Pearson query (agg_corr_regression): rank both features, then
    Pearson on the RANKS. Tie/determinism contract: SQL rank() with a
    deterministic key tiebreak (custkey) in BOTH engines — documented
    in place of midrank averaging, which would put engine-specific
    float ties inside the ranking itself. Exactness: features are
    integer cents; ranks are integers; every moment is an exact
    DECIMAL(38) sum (order-invariant under shuffle); rho is ONE
    deterministic IEEE expression at the end (the OLS float rule).
    Plan: one join + groupBy for features; the two total orders run as
    the TWO-PASS DISTRIBUTED RANK (operators/scale.py:global_index —
    range-repartition + per-partition offsets, an O(#partitions)
    driver collect), never `rank() OVER ()`'s single-partition window
    (the unique custkey tiebreak makes rank == row_number == global
    index + 1, so the SQL rank() oracle is exactly equivalent); one
    1-row reduce at the end."""
    from ..operators.scale import global_index

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    f = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", dec("c_acctbal", BAL).alias("balq"))
        .agg(
            F.sum(F.round(dec("o_totalprice", MONEY) * 100).cast("long")).alias(
                "spend"
            )
        )
        .select(
            "c_custkey",
            F.round(F.col("balq") * 100).cast("long").alias("bal"),
            "spend",
        )
    )
    ranked = global_index(
        global_index(f, "rx0", ["bal", "c_custkey"]), "ry0",
        ["spend", "c_custkey"],
    )
    r = ranked.select(
        (F.col("rx0") + 1).cast("long").alias("rx"),
        (F.col("ry0") + 1).cast("long").alias("ry"),
    )
    m = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        # decimal BEFORE both the product and the sum (ADVICE r8): with
        # rx ~ n the long product rx*rx overflows at n > 3e9 and the
        # long partial sums sooner still; accumulating in DECIMAL(38)
        # keeps the moments exact at any SF, matching the docstring.
        F.sum(F.col("rx").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.col("ry").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum(F.col("rx").cast("decimal(38,0)") * F.col("rx")).cast("double").alias("sxx"),
        F.sum(F.col("ry").cast("decimal(38,0)") * F.col("ry")).cast("double").alias("syy"),
        F.sum(F.col("rx").cast("decimal(38,0)") * F.col("ry")).cast("double").alias("sxy"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Round-8: Kendall's tau-a over a bounded distinct-value relation.
# ---------------------------------------------------------------------------

_KENDALL_ORACLE = """
WITH f AS (
  SELECT n.n_name,
         CAST(SUM(round(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100)) AS BIGINT)
           AS bal,
         CAST(COUNT(*) AS BIGINT) AS n_cust
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1
), p AS (
  SELECT CASE WHEN (a.bal - b.bal) * (a.n_cust - b.n_cust) > 0 THEN 1 ELSE 0 END AS conc,
         CASE WHEN (a.bal - b.bal) * (a.n_cust - b.n_cust) < 0 THEN 1 ELSE 0 END AS disc
  FROM f a JOIN f b ON a.n_name < b.n_name
), s AS (
  SELECT CAST(SUM(conc) AS BIGINT) AS c, CAST(SUM(disc) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM p
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM f) AS n_groups,
       c AS concordant, d AS discordant,
       round(CAST(c - d AS DOUBLE) / n_pairs, 6) AS kendall_tau_a
FROM s
"""


@register("agg_kendall_tau", oracle=_KENDALL_ORACLE, tags=("agg", "stats"))
def agg_kendall_tau(spark, sf_dir):
    """Kendall's tau-a between per-nation total balance and customer
    count — the O(n^2)-pairs rank statistic made scale-safe by the
    collapse-first rule: the pairwise join runs over the GROUPED
    relation (25 nations -> 300 pairs at every SF), never over raw
    rows; the raw scan collapses to exact integer group features in
    one map-side-combinable pass. Concordant/discordant are exact
    integer sign tests (cross-multiplied, no division); tau-a divides
    once at the end (ties count against association — documented
    tau-a, not tau-b, keeping the arithmetic integer-exact)."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    f = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.round(dec("c_acctbal", BAL) * 100).cast("long")).alias("bal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )
    a = f.select(
        F.col("n_name").alias("na"), F.col("bal").alias("ba"), F.col("n_cust").alias("ca")
    )
    b = f.select(
        F.col("n_name").alias("nb"), F.col("bal").alias("bb"), F.col("n_cust").alias("cb")
    )
    p = a.join(b, F.col("na") < F.col("nb")).select(
        F.when((F.col("ba") - F.col("bb")) * (F.col("ca") - F.col("cb")) > 0, 1)
        .otherwise(0)
        .alias("conc"),
        F.when((F.col("ba") - F.col("bb")) * (F.col("ca") - F.col("cb")) < 0, 1)
        .otherwise(0)
        .alias("disc"),
    )
    s = p.agg(
        F.sum("conc").alias("c"),
        F.sum("disc").alias("d"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    return s.crossJoin(f.agg(F.count(F.lit(1)).alias("n_groups"))).select(
        "n_groups",
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.round((F.col("c") - F.col("d")).cast("double") / F.col("n_pairs"), 6).alias(
            "kendall_tau_a"
        ),
    )


# ---------------------------------------------------------------------------
# Round-8: Cramér's V — effect size for the chi-square contingency.
# ---------------------------------------------------------------------------

_CRAMERS_ORACLE = """
WITH cell AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
         CAST(COUNT(*) AS BIGINT) AS observed
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), rt AS (
  SELECT seg, CAST(SUM(observed) AS BIGINT) AS row_total FROM cell GROUP BY 1
), ct AS (
  SELECT pri, CAST(SUM(observed) AS BIGINT) AS col_total FROM cell GROUP BY 1
), tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM cell),
chi AS (
  SELECT SUM(
           (CAST(tot.n AS DOUBLE) * cell.observed
              - CAST(rt.row_total AS DOUBLE) * ct.col_total)
           * (CAST(tot.n AS DOUBLE) * cell.observed
              - CAST(rt.row_total AS DOUBLE) * ct.col_total)
           / (CAST(tot.n AS DOUBLE) * rt.row_total * ct.col_total)
         ) AS chi2,
         CAST(MAX(tot.n) AS BIGINT) AS n
  FROM cell JOIN rt USING (seg) JOIN ct USING (pri), tot
), dims AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS r,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS c
)
SELECT chi.n AS n_rows, dims.r AS n_segments, dims.c AS n_priorities,
       round(chi.chi2, 6) AS chi2,
       round(sqrt(chi.chi2 / (chi.n * (CASE WHEN dims.r < dims.c
                                            THEN dims.r ELSE dims.c END - 1))), 6)
         AS cramers_v
FROM chi, dims
"""


@register("agg_cramers_v", oracle=_CRAMERS_ORACLE, tags=("agg", "stats"))
def agg_cramers_v(spark, sf_dir):
    """Cramér's V — the [0,1] EFFECT SIZE the chi-square statistic
    (agg_chi_square_cells) lacks: chi2 grows with n, V normalizes by
    n*(min(r,c)-1) so "is segment associated with order priority"
    answers the same at every SF. Same determinism discipline as the
    chi-square cells: exact integer cell/margin counts, the chi2 sum
    as one double expression with identical operation order per cell
    (sum order is immaterial here because each cell contribution is
    identically computed and the final round(6) absorbs the ~1e-12
    association order-noise of a 25-term sum — verified stable across
    both engines), one sqrt at the end. Plan: one join + three
    map-side-combinable rollups of a 25-cell relation."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cell = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    rt = cell.groupBy("seg").agg(F.sum("observed").alias("row_total"))
    ct = cell.groupBy("pri").agg(F.sum("observed").alias("col_total"))
    tot = cell.agg(F.sum("observed").alias("n"))
    joined = (
        cell.join(F.broadcast(rt), "seg")
        .join(F.broadcast(ct), "pri")
        .crossJoin(F.broadcast(tot))
    )
    term = (
        F.col("n").cast("double") * F.col("observed")
        - F.col("row_total").cast("double") * F.col("col_total")
    )
    chi = joined.agg(
        F.sum(
            term * term
            / (F.col("n").cast("double") * F.col("row_total") * F.col("col_total"))
        ).alias("chi2"),
        F.max("n").alias("n"),
    )
    dims = rt.agg(F.count(F.lit(1)).alias("r")).crossJoin(
        ct.agg(F.count(F.lit(1)).alias("c"))
    )
    return chi.crossJoin(F.broadcast(dims)).select(
        F.col("n").alias("n_rows"),
        F.col("r").alias("n_segments"),
        F.col("c").alias("n_priorities"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * (F.least("r", "c") - F.lit(1)))
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Round-8: one-way ANOVA F — does the group mean differ across segments?
# ---------------------------------------------------------------------------

_ANOVA_ORACLE = """
WITH b AS (
  SELECT c_mktsegment AS seg,
         CAST(round(CAST(c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT) AS y
  FROM customer
), g AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy
  FROM b GROUP BY 1
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS s,
         CAST(CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS DOUBLE) AS syy,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM g) AS k
  FROM b
), terms AS (
  -- centered per-group term: d_g = sy_g * n - s * n_g is EXACT
  -- (HUGEINT), so each SSB term is a nonnegative double with no
  -- cancellation; the 5-term sum's order noise is then O(ulp of the
  -- CENTERED magnitude), absorbed by round(4)
  SELECT CAST((g.sy * t.n - t.s * g.n_g) * (g.sy * t.n - t.s * g.n_g)
              AS DOUBLE)
         / (CAST(g.n_g AS DOUBLE) * t.n * t.n) AS term
  FROM g, t
), agg AS (
  SELECT t.n, t.k,
         t.syy - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n AS sst,
         (SELECT SUM(term) FROM terms) AS ssb
  FROM t
)
SELECT n AS n_rows, k AS n_groups,
       round(ssb / sst, 6) AS eta_squared,
       round((ssb / (k - 1)) / ((sst - ssb) / (n - k)), 6) AS f_stat
FROM agg
"""


@register("agg_anova_f", oracle=_ANOVA_ORACLE, tags=("agg", "stats"))
def agg_anova_f(spark, sf_dir):
    """One-way ANOVA F statistic for account balance across market
    segments — the k-group generalization of agg_welch_t_test (which
    compares two). Decomposition SST = SSB + SSW from exact integer
    moments only: per-group (n, sum) and global (n, sum, sum-of-
    squares) as DECIMAL(38) sums of integer cents — the data-sized
    work is two map-side-combinable aggregations; the F ratio is a
    1-row double expression with identical operation order in both
    engines. SSB uses the CENTERED form Σ d_g²/(n_g·n²) with
    d_g = sy_g·n − s·n_g exact in DECIMAL(38): every term is a
    nonnegative double, so the k-term sum is cancellation-free; the
    reported statistics are the scale-free RATIOS eta² = SSB/SST and
    F, whose order noise is relative (~1e-13, under round(6) at any
    SF). (The naive Σ sy_g²/n_g − s²/n form and the raw SS columns
    were both caught by the full sweep: absolute ulp noise at 1e11+
    magnitudes crosses fixed decimal rounding.)"""
    cust = load_table(spark, sf_dir, "customer")
    b = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.round(dec("c_acctbal", BAL) * 100).cast("long").alias("y"),
    )
    # decimal BEFORE the product/sum (ADVICE r8): y*y ~ 1e12 makes the
    # long partial sum overflow at ~9e6 rows; DECIMAL(38) accumulation
    # keeps the moments exact at any SF, matching the docstring.
    g = b.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
    )
    t = b.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).cast("double").alias("syy"),
    )
    # centered per-group SSB term: d_g = sy_g * n - s * n_g is EXACT
    # DECIMAL(38), so each term is a nonnegative double and the k-term
    # sum carries no cancellation (the first formulation summed
    # ~1e13-magnitude sy^2/n_g terms whose summation-ORDER noise
    # exceeded round(4) — caught by the full sweep when the 32-thread
    # session reordered the 5-row aggregation; see PLANS.md r8)
    d = (
        F.col("sy") * F.col("n").cast("decimal(38,0)")
        - F.col("s") * F.col("n_g").cast("decimal(38,0)")
    )
    terms = g.crossJoin(F.broadcast(t)).select(
        (
            (d * d).cast("double")
            / (F.col("n_g").cast("double") * F.col("n") * F.col("n"))
        ).alias("term")
    )
    gsum = terms.agg(F.sum("term").alias("ssb"))
    kcnt = g.agg(F.count(F.lit(1)).alias("k"))
    s = (
        t.crossJoin(F.broadcast(gsum))
        .crossJoin(F.broadcast(kcnt))
        .select(
            F.col("n").cast("double").alias("n"),
            "k",
            (
                F.col("syy")
                - F.col("s").cast("double") * F.col("s").cast("double")
                / F.col("n")
            ).alias("sst"),
            "ssb",
        )
    )
    return s.select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("k").alias("n_groups"),
        # eta^2 and F are RATIOS: their summation-order noise is
        # relative (~1e-13), so round(6) is safe at every SF — unlike
        # the raw SS columns, whose ABSOLUTE ulp grows with n and
        # crosses any fixed decimal rounding (measured: the 5-term SSB
        # sum differed in the 4th decimal at 3e11 magnitude between
        # the test session and the sweep session)
        F.round(F.col("ssb") / F.col("sst"), 6).alias("eta_squared"),
        F.round(
            (F.col("ssb") / (F.col("k") - 1))
            / ((F.col("sst") - F.col("ssb")) / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Round-8: Wilson score interval — the binomial CI ops dashboards size
# alarms with.
# ---------------------------------------------------------------------------

_WILSON_Z = 1.96  # 95% two-sided


_WILSON_ORACLE = f"""
WITH b AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN CAST(value AS DECIMAL(12,2)) >= 50 THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM events GROUP BY 1
)
SELECT event_type, n, k,
       round(CAST(k AS DOUBLE) / n, 6) AS p_hat,
       round((CAST(k AS DOUBLE) / n + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
              - {_WILSON_Z} * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n
                        + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
             / (1 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS wilson_low,
       round((CAST(k AS DOUBLE) / n + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
              + {_WILSON_Z} * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n
                        + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
             / (1 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS wilson_high
FROM b
"""


@register("agg_wilson_interval", oracle=_WILSON_ORACLE, tags=("agg", "stats"))
def agg_wilson_interval(spark, sf_dir):
    """Wilson score 95% confidence interval for a per-group binomial
    rate (share of events with value >= 50, per event type) — the
    interval production dashboards SHOULD use instead of the normal
    approximation, because it stays inside [0,1] and behaves at small
    n and extreme p (Wilson 1927; the default in every competent A/B
    stack). Inputs are exact integers (n, k) from one map-side-
    combinable rollup; the interval is a per-row closed-form double
    expression with IDENTICAL operation order in both engines, rounded
    at 6 (the OLS float rule). Complements agg_bayes_ab_posterior
    (Bayesian) and agg_welch_t_test (means) with the frequentist
    proportion CI."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(dec("value", VAL) >= 50, 1).otherwise(0)).alias("k"),
    )
    z = _WILSON_Z
    p = F.col("k").cast("double") / F.col("n")
    center = p + z * z / (2 * F.col("n"))
    margin = z * F.sqrt(
        p * (1 - p) / F.col("n") + z * z / (4.0 * F.col("n") * F.col("n"))
    )
    denom = 1 + z * z / F.col("n")
    return b.select(
        "event_type",
        "n",
        "k",
        F.round(p, 6).alias("p_hat"),
        F.round((center - margin) / denom, 6).alias("wilson_low"),
        F.round((center + margin) / denom, 6).alias("wilson_high"),
    )


# ---------------------------------------------------------------------------
# Round-8: bitmap-exact distinct counting — COUNT(DISTINCT) without the
# two-phase expansion, mergeable like a sketch but EXACT.
# ---------------------------------------------------------------------------

_BITMAP_ORACLE = """
SELECT c_mktsegment,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


@register("agg_bitmap_distinct", oracle=_BITMAP_ORACLE, tags=("agg", "sketch", "sql"))
def agg_bitmap_distinct(spark, sf_dir):
    """EXACT distinct counting via Spark 3.5+ BITMAP aggregates
    (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg
    / bitmap_or_agg / bitmap_count): per (group, bucket-of-32768-ids)
    the member ids pack into a 4 KB bitmap, partials OR together —
    giving COUNT(DISTINCT) the merge behavior of a sketch (map-side
    combinable, re-aggregable across partitions, unions for free)
    while staying EXACT, unlike HLL. This is the scale path for
    distinct-heavy rollups: classic COUNT(DISTINCT) expands to a
    two-phase distinct aggregate that shuffles every (group, id) pair;
    the bitmap shuffles |groups| x |id-range/32768| fixed-size blobs.
    The oracle is the plain COUNT(DISTINCT) — bit-equality proves the
    bitmap path exact. n_orders rides along from the same scan (a
    second measure over the bitmap plan is free)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    per_bucket = j.groupBy(
        "c_mktsegment", F.expr("bitmap_bucket_number(o_custkey)").alias("bkt")
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("b"),
        F.count(F.lit(1)).alias("n"),
    )
    return per_bucket.groupBy("c_mktsegment").agg(
        F.expr("CAST(SUM(bitmap_count(b)) AS BIGINT)").alias(
            "n_distinct_customers"
        ),
        F.sum("n").cast("long").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Round-8: approx_percentile rank-error contract vs the exact median.
# ---------------------------------------------------------------------------

_APCT_ACC = 1000  # GK accuracy parameter: rank error <= n / accuracy

_APCT_ORACLE = """
WITH b AS (
  SELECT event_type,
         CAST(round(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS y
  FROM events
), r AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type ORDER BY y) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM b
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN y END) AS BIGINT)
         AS exact_p50_cents,
       TRUE AS approx_rank_ok
FROM r GROUP BY event_type
"""


@register("agg_approx_percentile_contract", oracle=_APCT_ORACLE, tags=("agg", "sketch", "stats"))
def agg_approx_percentile_contract(spark, sf_dir):
    """approx_percentile's Greenwald-Khanna guarantee, CHECKED: per
    event type, the sketch's p50 (accuracy={_APCT_ACC}) must sit within
    rank n/{_APCT_ACC} (+1 slack for the discrete boundary) of the true
    median position. The sketch value itself is partition-order-
    dependent (measured: repartitioning moves it — which is WHY it
    cannot be hash-compared directly), so the driver-checked columns
    are the EXACT median (lower median, rank (n+1) DIV 2 — value-exact
    vs the oracle's identical rank rule) plus the rank-error flag the
    engine computes by exactly ranking its own sketch output — the
    same sketch-contract pattern as HLL/CMS/Bloom. This is the query
    that licenses approx_percentile in a 100 TB rollup: one pass, no
    per-group sort, a PROVEN rank bound instead of a hoped-for one."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.round(dec("value", VAL) * 100).cast("long").alias("y"),
    )
    stats = b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"approx_percentile(y, 0.5, {_APCT_ACC})").alias("ap"),
    )
    # exact lower median via per-group rank (keyed window, bounded skew)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("y")
    ranked = b.withColumn("rk", F.row_number().over(w))
    med = (
        ranked.join(
            stats.select("event_type", "n"), "event_type"
        )
        .filter(F.col("rk") == F.expr("(n + 1) DIV 2"))
        .select("event_type", F.col("y").alias("exact_p50_cents"))
    )
    # exact rank window of the sketch's answer
    ranks = (
        b.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("y") < F.col("ap"), 1).otherwise(0)).alias(
                "r_lo"
            ),
            F.sum(F.when(F.col("y") <= F.col("ap"), 1).otherwise(0)).alias(
                "r_hi"
            ),
        )
    )
    target = F.expr("(n + 1) DIV 2")
    slack = F.expr(f"n DIV {_APCT_ACC} + 1")
    return (
        stats.join(med, "event_type")
        .join(ranks, "event_type")
        .select(
            "event_type",
            "n",
            "exact_p50_cents",
            (
                (F.col("r_lo") <= target + slack)
                & (F.col("r_hi") >= target - slack)
            ).alias("approx_rank_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Round-8: deterministic-sample mean with the Hoeffding error bound
# checked against the full-scan truth.
# ---------------------------------------------------------------------------

_HOEFF_ORACLE = """
WITH b AS (
  SELECT CAST(round(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS y,
         event_id
  FROM events
), full_m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(y) AS DECIMAL(38,0)) AS DOUBLE) AS s,
         CAST(MIN(y) AS DOUBLE) AS lo, CAST(MAX(y) AS DOUBLE) AS hi
  FROM b
), samp_m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_s,
         CAST(CAST(SUM(y) AS DECIMAL(38,0)) AS DOUBLE) AS s_s
  FROM b WHERE event_id % 10 = 0
)
SELECT full_m.n AS n_full, samp_m.n_s AS n_sample,
       round(full_m.s / full_m.n, 4) AS true_mean_cents,
       round(samp_m.s_s / samp_m.n_s, 4) AS sample_mean_cents,
       abs(samp_m.s_s / samp_m.n_s - full_m.s / full_m.n)
         <= (full_m.hi - full_m.lo)
            * sqrt(ln(2.0 / 0.001) / (2.0 * samp_m.n_s))
         AS within_hoeffding_999
FROM full_m, samp_m
"""


@register("agg_sampled_mean_hoeffding", oracle=_HOEFF_ORACLE, tags=("agg", "stats", "scale"))
def agg_sampled_mean_hoeffding(spark, sf_dir):
    """Estimation-with-guarantee — the 100 TB pattern where a 10%
    deterministic sample (event_id % 10, reproducible in any engine)
    answers a mean query and the HOEFFDING bound prices the error:
    |sample mean - true mean| <= (hi - lo) * sqrt(ln(2/δ) / (2 n_s))
    at δ = 0.001. The query computes BOTH sides exactly (full-scan
    truth + sampled estimate, exact DECIMAL(38) sums) and the flag
    checks the realized error against the bound — on this fixture a
    fixed fact, and the one-in-a-thousand honesty caveat is the
    contract's stated δ. This is the query shape that licenses
    sample-first exploration on a corpus where the full scan costs
    hours: the bound needs only the value range, never a distribution
    assumption."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        F.round(dec("value", VAL) * 100).cast("long").alias("y"), "event_id"
    )
    full_m = b.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("decimal(38,0)").cast("double").alias("s"),
        F.min("y").cast("double").alias("lo"),
        F.max("y").cast("double").alias("hi"),
    )
    samp_m = b.filter(F.pmod("event_id", F.lit(10)) == 0).agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum("y").cast("decimal(38,0)").cast("double").alias("s_s"),
    )
    return full_m.crossJoin(F.broadcast(samp_m)).select(
        F.col("n").alias("n_full"),
        F.col("n_s").alias("n_sample"),
        F.round(F.col("s") / F.col("n"), 4).alias("true_mean_cents"),
        F.round(F.col("s_s") / F.col("n_s"), 4).alias("sample_mean_cents"),
        (
            F.abs(F.col("s_s") / F.col("n_s") - F.col("s") / F.col("n"))
            <= (F.col("hi") - F.col("lo"))
            * F.sqrt(F.log(F.lit(2.0) / 0.001) / (2.0 * F.col("n_s")))
        ).alias("within_hoeffding_999"),
    )


# ---------------------------------------------------------------------------
# Round-9: agreement / association / concentration / resampling stats.
# ---------------------------------------------------------------------------

_KAPPA_ORACLE = """
WITH r AS (
  SELECT CASE WHEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) < 30000
              THEN 'low'
              WHEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) < 70000
              THEN 'mid' ELSE 'high' END AS rater_a,
         CASE WHEN CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS BIGINT) < 33
              THEN 'low'
              WHEN CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS BIGINT) < 66
              THEN 'mid' ELSE 'high' END AS rater_b
  FROM events
), cells AS (
  SELECT rater_a, rater_b, CAST(COUNT(*) AS BIGINT) AS c
  FROM r GROUP BY 1, 2
), base AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN rater_a = rater_b THEN c ELSE 0 END) AS BIGINT)
           AS agree
  FROM cells
), chance AS (
  SELECT CAST(SUM(ra.s_a * rb.s_b) AS BIGINT) AS chance_x
  FROM (SELECT rater_a AS cls, SUM(c) AS s_a FROM cells GROUP BY 1) ra
  JOIN (SELECT rater_b AS cls, SUM(c) AS s_b FROM cells GROUP BY 1) rb
    USING (cls)
)
SELECT n, agree,
       CAST((n * agree - chance_x) * 1000000
            // (n * n - chance_x) AS BIGINT) AS kappa_ppm
FROM base, chance
"""


@register("agg_cohens_kappa", oracle=_KAPPA_ORACLE, tags=("agg", "stats"))
def agg_cohens_kappa(spark, sf_dir):
    """Cohen's κ inter-rater agreement (Cohen 1960) between two
    independent 3-way labelings of each event — the value tercile
    (fixed cent thresholds) vs the props-k tercile (fixed k
    thresholds): the agreement-beyond-chance statistic every
    labeling-quality / weak-supervision pipeline reports when two
    annotators or heuristics label the same corpus. Exactness: with
    integer cell counts, κ = (n·Σdiag − Σᵢ rowᵢ·colᵢ) / (n² − Σᵢ
    rowᵢ·colᵢ) is a ratio of exact integers — emitted as an exact ppm
    integer division, ZERO float ops (the marginal product replaces
    p_o/p_e divisions algebraically). The fixture's two labelings are
    INDEPENDENT by construction, so κ sits just below zero — which is
    what makes the division semantics part of the contract: Spark DIV
    and DuckDB // both truncate toward zero on negatives where
    Python's // floors (pinned by tests/test_round9_refs2.py, which
    found the off-by-one on its first run). Fixed thresholds (not
    quantiles) keep the labeling itself exact. Plan: one
    |classes|²-cell rollup, then broadcast-sized algebra."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(dec("value", VAL) * 100).cast("long")
    kf = F.regexp_extract("props", '"k": *([0-9]+)', 1).cast("long")
    band = lambda c, lo, hi: (  # noqa: E731
        F.when(c < lo, F.lit("low")).when(c < hi, F.lit("mid")).otherwise(F.lit("high"))
    )
    cells = (
        ev.select(
            band(cents, 30000, 70000).alias("rater_a"),
            band(kf, 33, 66).alias("rater_b"),
        )
        .groupBy("rater_a", "rater_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    base = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("rater_a") == F.col("rater_b"), F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("agree"),
    )
    ra = cells.groupBy(F.col("rater_a").alias("cls")).agg(F.sum("c").alias("s_a"))
    rb = cells.groupBy(F.col("rater_b").alias("cls")).agg(F.sum("c").alias("s_b"))
    chance = (
        ra.join(rb, "cls")
        .agg(F.sum(F.col("s_a") * F.col("s_b")).cast("long").alias("chance_x"))
    )
    return (
        base.crossJoin(F.broadcast(chance))
        .select(
            "n",
            "agree",
            F.expr(
                "CAST((n * agree - chance_x) * 1000000"
                " DIV (n * n - chance_x) AS BIGINT)"
            ).alias("kappa_ppm"),
        )
    )


_ODDS_RATIO_ORACLE = """
WITH t AS (
  SELECT CASE WHEN CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS BIGINT)
              >= 50 THEN 1 ELSE 0 END AS exposed,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS outcome
  FROM events
), c AS (
  SELECT CAST(SUM(exposed * outcome) AS BIGINT) AS a,
         CAST(SUM(exposed * (1 - outcome)) AS BIGINT) AS b,
         CAST(SUM((1 - exposed) * outcome) AS BIGINT) AS c,
         CAST(SUM((1 - exposed) * (1 - outcome)) AS BIGINT) AS d
  FROM t
)
SELECT a, b, c, d,
       round(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6) AS odds_ratio,
       round(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                 - 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6) AS or_ci_lo,
       round(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                 + 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6) AS or_ci_hi
FROM c
"""


@register("agg_odds_ratio_ci", oracle=_ODDS_RATIO_ORACLE, tags=("agg", "stats"))
def agg_odds_ratio_ci(spark, sf_dir):
    """2x2 ODDS RATIO with the Woolf logit confidence interval
    (exposure: props k >= 50; outcome: purchase) — the effect-size +
    uncertainty pair every A/B readout and epidemiological table
    reports (agg_wilson_interval covers one proportion; this is the
    two-group comparison). The 2x2 cells are ONE exact-integer
    map-side-combinable aggregation; OR = ad/bc and the CI
    exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d)) are single deterministic
    IEEE expressions over those four integers (the OLS float rule) —
    no cross-row float accumulation anywhere."""
    ev = load_table(spark, sf_dir, "events")
    exposed = (
        F.regexp_extract("props", '"k": *([0-9]+)', 1).cast("long") >= 50
    ).cast("long")
    outcome = (F.col("event_type") == "purchase").cast("long")
    cells = ev.select(exposed.alias("e"), outcome.alias("o")).agg(
        F.sum(F.col("e") * F.col("o")).cast("long").alias("a"),
        F.sum(F.col("e") * (1 - F.col("o"))).cast("long").alias("b"),
        F.sum((1 - F.col("e")) * F.col("o")).cast("long").alias("c"),
        F.sum((1 - F.col("e")) * (1 - F.col("o"))).cast("long").alias("d"),
    )
    lor = F.log(
        F.col("a").cast("double") * F.col("d") / (F.col("b").cast("double") * F.col("c"))
    )
    se = F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c") + 1.0 / F.col("d")
    )
    return cells.select(
        "a", "b", "c", "d",
        F.round(
            F.col("a").cast("double") * F.col("d")
            / (F.col("b").cast("double") * F.col("c")),
            6,
        ).alias("odds_ratio"),
        F.round(F.exp(lor - 1.96 * se), 6).alias("or_ci_lo"),
        F.round(F.exp(lor + 1.96 * se), 6).alias("or_ci_hi"),
    )


_HHI_ORACLE = """
WITH rev AS (
  SELECT n.n_name,
         CAST(SUM(round(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100))
              AS DECIMAL(38,0)) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nations,
         SUM(cents * cents) AS ssq,
         SUM(cents) AS tot
  FROM rev
)
SELECT n_nations,
       round(CAST(ssq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 9)
         AS hhi,
       round((CAST(ssq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
              - 1.0 / n_nations) / (1.0 - 1.0 / n_nations), 9) AS hhi_normalized
FROM m
"""


@register("agg_herfindahl_index", oracle=_HHI_ORACLE, tags=("agg", "stats"))
def agg_herfindahl_index(spark, sf_dir):
    """Herfindahl-Hirschman concentration of revenue across nations —
    THE market-concentration scalar (complementing Gini/Theil/Pareto,
    which rank inequality of a distribution; HHI is the squared-share
    sum regulators threshold). Exactness: HHI = Σsᵢ² = Σcᵢ² / (Σcᵢ)²
    — both Σcᵢ² and Σcᵢ are exact DECIMAL(38) integer sums
    (order-invariant), the division is ONE float op at the end; the
    naive Σ(float share)² would be a 25-term order-dependent float
    sum. Normalized variant rescales to [0,1] by the 1/n floor. Plan:
    one dim-broadcast join tree + two 1-row reduces."""
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.round(dec("o_totalprice", MONEY) * 100).cast("long"))
            .cast("decimal(38,0)")
            .alias("cents")
        )
    )
    m = rev.agg(
        F.count(F.lit(1)).cast("long").alias("n_nations"),
        F.sum(F.col("cents") * F.col("cents")).alias("ssq"),
        F.sum("cents").alias("tot"),
    )
    hhi = F.col("ssq").cast("double") / (
        F.col("tot").cast("double") * F.col("tot").cast("double")
    )
    return m.select(
        "n_nations",
        F.round(hhi, 9).alias("hhi"),
        F.round(
            (hhi - 1.0 / F.col("n_nations")) / (1.0 - 1.0 / F.col("n_nations")), 9
        ).alias("hhi_normalized"),
    )


_JACKKNIFE_ORACLE = """
WITH li AS (
  SELECT l_returnflag AS flag,
         CAST(round(CAST(l_extendedprice AS DECIMAL(15,2)) * 100) AS BIGINT)
           AS y,
         CAST(round(CAST(l_quantity AS DECIMAL(8,1)) * 10) AS BIGINT) AS x
  FROM lineitem
), tot AS (
  SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x) AS BIGINT) AS sx
  FROM li GROUP BY flag
), q AS (
  -- exact integer quantization (ppb, floor): a float round here is
  -- the one place the engines can disagree (Spark rounds the shortest
  -- decimal repr, DuckDB the binary value — with thousands of
  -- arbitrary quotients a few land on the disputed boundary)
  SELECT li.flag, tot.n,
         CAST((CAST(tot.sy - li.y AS HUGEINT) * 1000000000)
              // (tot.sx - li.x) AS BIGINT) AS qi
  FROM li JOIN tot USING (flag)
), m AS (
  -- HUGEINT accumulation: DECIMAL(38)*BIGINT silently promotes to
  -- DOUBLE in DuckDB (precision would exceed 38) — HUGEINT keeps the
  -- moments exact like Spark's decimal(38,0) sums
  SELECT flag, ANY_VALUE(n) AS n,
         CAST(SUM(CAST(qi AS HUGEINT)) AS DECIMAL(38,0)) AS sq,
         CAST(SUM(CAST(qi AS HUGEINT) * qi) AS DECIMAL(38,0)) AS sqq
  FROM q GROUP BY flag
)
SELECT flag, n,
       round((CAST(sqq AS DOUBLE)
              - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n)
             * (n - 1) / n / 1e18, 9) AS jk_var_ratio
FROM m
"""


@register("agg_jackknife_ratio_variance", oracle=_JACKKNIFE_ORACLE, tags=("agg", "stats"))
def agg_jackknife_ratio_variance(spark, sf_dir):
    """JACKKNIFE variance of the RATIO estimator R = Σprice/Σquantity
    per return flag (Quenouille/Tukey; the delete-one resampling twin
    of agg_poisson_bootstrap's replicate weighting) — the standard
    uncertainty estimate for a statistic that is NOT a mean, where the
    plain s²/n formula is wrong. Leave-one-out ratios have the closed
    form R₍₋ᵢ₎ = (Sy−yᵢ)/(Sx−xᵢ), so no resampled passes are needed:
    one broadcast of per-group totals, one per-row expression. Each
    R₍₋ᵢ₎ is quantized ONCE to integer ppb by EXACT integer floor
    division ((Sy−yᵢ)·10⁹ DIV (Sx−xᵢ), all positive so floor==trunc —
    a float round() here is where the engines can disagree on the
    shortest-repr boundary, found by this query's first sf0.001 run),
    so the variance moments are exact DECIMAL(38) sums and the estimate
    (n−1)/n · Σ(qᵢ−q̄)² is ONE final float expression. Plan: two keyed
    aggregations + one broadcast join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(dec("l_extendedprice", MONEY) * 100).cast("long").alias("y"),
        F.round(dec("l_quantity", "decimal(8,1)") * 10).cast("long").alias("x"),
    )
    tot = li.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("x").cast("long").alias("sx"),
    )
    q = li.join(F.broadcast(tot), "flag").select(
        "flag",
        "n",
        F.expr(
            "CAST((CAST(sy - y AS DECIMAL(38,0)) * 1000000000)"
            " DIV (sx - x) AS BIGINT)"
        ).alias("qi"),
    )
    m = q.groupBy("flag").agg(
        F.any_value("n").alias("n"),
        F.sum(F.col("qi").cast("decimal(38,0)")).alias("sq"),
        F.sum(F.col("qi").cast("decimal(38,0)") * F.col("qi")).alias("sqq"),
    )
    return m.select(
        "flag",
        "n",
        F.round(
            (
                F.col("sqq").cast("double")
                - F.col("sq").cast("double") * F.col("sq").cast("double") / F.col("n")
            )
            * (F.col("n") - 1)
            / F.col("n")
            / 1e18,
            9,
        ).alias("jk_var_ratio"),
    )


_BROWN_FORSYTHE_ORACLE = """
WITH b AS (
  SELECT c_mktsegment AS seg,
         CAST(round(CAST(c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT) AS y
  FROM customer
), med AS (
  SELECT seg, CAST(round(2 * quantile_cont(y, 0.5)) AS BIGINT) AS med2
  FROM b GROUP BY seg
), z AS (
  SELECT b.seg, ABS(2 * b.y - med.med2) AS z
  FROM b JOIN med USING (seg)
), g AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CAST(z AS HUGEINT)) AS DECIMAL(38,0)) AS sz
  FROM z GROUP BY seg
), t AS (
  -- HUGEINT products: DECIMAL(38)*BIGINT promotes to DOUBLE in DuckDB;
  -- n*szz - s^2 stays an exact integer so sst is ONE float division
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(z AS HUGEINT)) AS DECIMAL(38,0)) AS s,
         CAST(COUNT(*) * SUM(CAST(z AS HUGEINT) * z)
              - SUM(CAST(z AS HUGEINT)) * SUM(CAST(z AS HUGEINT))
              AS DECIMAL(38,0)) AS nszz_s2
  FROM z
), terms AS (
  SELECT (CAST(g.sz * t.n - t.s * g.n_g AS DOUBLE)
          * CAST(g.sz * t.n - t.s * g.n_g AS DOUBLE))
         / (CAST(g.n_g AS DOUBLE) * t.n * t.n) AS term
  FROM g, t
), agg2 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(term) AS ssb FROM terms
)
SELECT t.n, agg2.k,
       round(CAST(t.nszz_s2 AS DOUBLE) / t.n, 4) AS sst,
       round(agg2.ssb / (CAST(t.nszz_s2 AS DOUBLE) / t.n), 6) AS eta_sq,
       round((agg2.ssb / (agg2.k - 1))
             / ((CAST(t.nszz_s2 AS DOUBLE) / t.n - agg2.ssb)
                / (t.n - agg2.k)), 6) AS bf_f_stat
FROM t, agg2
"""


@register("agg_brown_forsythe", oracle=_BROWN_FORSYTHE_ORACLE, tags=("agg", "stats"))
def agg_brown_forsythe(spark, sf_dir):
    """BROWN-FORSYTHE homogeneity-of-variance test across market
    segments (Brown & Forsythe 1974): one-way ANOVA run on the
    absolute deviations from each group's MEDIAN — the robust
    pre-check every parametric group comparison (agg_anova_f,
    agg_welch_t_test) assumes or must route around. Exactness:
    deviations are |2y − 2·median| — doubled so the interpolated
    median's only possible fraction (.5 between two even-count cents)
    becomes an exact integer — then the F statistic reuses
    agg_anova_f's cancellation-free centered SSB (each term a
    nonnegative double from exact DECIMAL(38) moments; reported
    quantities are the scale-free ratios). Plan: one exact-median
    aggregation per group (Spark percentile / DuckDB quantile_cont
    agree exactly on integer inputs), one broadcast join, two
    map-side-combinable moment rollups."""
    cust = load_table(spark, sf_dir, "customer")
    b = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.round(dec("c_acctbal", BAL) * 100).cast("long").alias("y"),
    )
    med = b.groupBy("seg").agg(
        F.round(2 * F.expr("percentile(y, 0.5)")).cast("long").alias("med2")
    )
    z = b.join(F.broadcast(med), "seg").select(
        "seg", F.abs(2 * F.col("y") - F.col("med2")).alias("z")
    )
    g = z.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(F.col("z").cast("decimal(38,0)")).alias("sz"),
    )
    t = z.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("z").cast("decimal(38,0)")).alias("s"),
        (
            F.count(F.lit(1))
            * F.sum(F.col("z").cast("decimal(38,0)") * F.col("z"))
            - F.sum(F.col("z").cast("decimal(38,0)"))
            * F.sum(F.col("z").cast("decimal(38,0)"))
        )
        .cast("decimal(38,0)")
        .alias("nszz_s2"),
    )
    d = (
        F.col("sz") * F.col("n").cast("decimal(38,0)")
        - F.col("s") * F.col("n_g").cast("decimal(38,0)")
    )
    terms = g.crossJoin(F.broadcast(t)).select(
        (
            (d * d).cast("double")
            / (F.col("n_g").cast("double") * F.col("n") * F.col("n"))
        ).alias("term")
    )
    agg2 = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"), F.sum("term").alias("ssb")
    )
    sst = F.col("nszz_s2").cast("double") / F.col("n")
    return (
        t.crossJoin(F.broadcast(agg2))
        .select(
            "n",
            "k",
            F.round(sst, 4).alias("sst"),
            F.round(F.col("ssb") / sst, 6).alias("eta_sq"),
            F.round(
                (F.col("ssb") / (F.col("k") - 1))
                / ((sst - F.col("ssb")) / (F.col("n") - F.col("k"))),
                6,
            ).alias("bf_f_stat"),
        )
    )


_TUKEY_ORACLE = """
WITH b AS (
  SELECT c_mktsegment AS seg,
         CAST(round(CAST(c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT) AS y
  FROM customer
), q AS (
  SELECT seg,
         CAST(round(4 * quantile_cont(y, 0.25)) AS BIGINT) AS q1x4,
         CAST(round(4 * quantile_cont(y, 0.75)) AS BIGINT) AS q3x4
  FROM b GROUP BY seg
)
SELECT b.seg,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN 16 * b.y < 4 * q.q1x4 - 6 * (q.q3x4 - q.q1x4)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
       CAST(SUM(CASE WHEN 16 * b.y > 4 * q.q3x4 + 6 * (q.q3x4 - q.q1x4)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers,
       round((4.0 * q.q1x4 - 6 * (q.q3x4 - q.q1x4)) / 16, 4) AS fence_lo_cents,
       round((4.0 * q.q3x4 + 6 * (q.q3x4 - q.q1x4)) / 16, 4) AS fence_hi_cents
FROM b JOIN q USING (seg)
GROUP BY b.seg, q.q1x4, q.q3x4
"""


@register("agg_tukey_fences_outliers", oracle=_TUKEY_ORACLE, tags=("agg", "stats"))
def agg_tukey_fences_outliers(spark, sf_dir):
    """Tukey IQR-fence outlier counts per segment (the boxplot rule:
    outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR]) — the quartile-based robust
    screen beside the MAD screen (agg_robust_outliers_mad); quartiles
    are interpolated, so on integer cents 4·Q is an EXACT integer, and
    the fence comparison is cleared of ALL fractions by scaling both
    sides to sixteenths: outlier_low ⟺ 16y < 4·q1x4 − 6·iqrx4 — an
    exact integer predicate that cannot flip on a float boundary (the
    Bollinger-band rule applied to quartiles). The reported fence
    positions are single float divisions of exact integers. Plan: one
    exact-percentile rollup per group, one broadcast join back, one
    counting aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    b = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.round(dec("c_acctbal", BAL) * 100).cast("long").alias("y"),
    )
    q = b.groupBy("seg").agg(
        F.round(4 * F.expr("percentile(y, 0.25)")).cast("long").alias("q1x4"),
        F.round(4 * F.expr("percentile(y, 0.75)")).cast("long").alias("q3x4"),
    )
    iqr = F.col("q3x4") - F.col("q1x4")
    lo = 4 * F.col("q1x4") - 6 * iqr
    hi = 4 * F.col("q3x4") + 6 * iqr
    return (
        b.join(F.broadcast(q), "seg")
        .groupBy("seg", "q1x4", "q3x4")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(16 * F.col("y") < lo, 1).otherwise(0))
            .cast("long")
            .alias("n_low_outliers"),
            F.sum(F.when(16 * F.col("y") > hi, 1).otherwise(0))
            .cast("long")
            .alias("n_high_outliers"),
        )
        .select(
            "seg",
            "n",
            "n_low_outliers",
            "n_high_outliers",
            F.round((4.0 * F.col("q1x4") - 6 * iqr) / 16, 4).alias("fence_lo_cents"),
            F.round((4.0 * F.col("q3x4") + 6 * iqr) / 16, 4).alias("fence_hi_cents"),
        )
    )


_TRIMMED_MEAN_ORACLE = """
WITH b AS (
  SELECT c_mktsegment AS seg,
         CAST(round(CAST(c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT) AS y,
         c_custkey
  FROM customer
), r AS (
  SELECT seg, y,
         row_number() OVER (PARTITION BY seg ORDER BY y, c_custkey) AS rn,
         COUNT(*) OVER (PARTITION BY seg) AS n
  FROM b
)
SELECT seg, CAST(ANY_VALUE(n) AS BIGINT) AS n,
       CAST(ANY_VALUE(n) // 10 AS BIGINT) AS n_trimmed_each_side,
       CAST(SUM(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                     THEN y ELSE 0 END) AS BIGINT) AS kept_cents,
       round(CAST(SUM(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                           THEN y ELSE 0 END) AS DOUBLE)
             / (ANY_VALUE(n) - 2 * (ANY_VALUE(n) // 10)), 6) AS trimmed_mean_cents
FROM r GROUP BY seg
"""


@register("agg_trimmed_mean", oracle=_TRIMMED_MEAN_ORACLE, tags=("agg", "stats"))
def agg_trimmed_mean(spark, sf_dir):
    """10%-TRIMMED mean of account balance per segment — the
    order-statistic robust-location estimator that DROPS each tail
    (agg_winsorized_mean CLAMPS it; the two react differently to
    asymmetric contamination, which is why robust pipelines report
    both). Trim count is the exact floor(n/10) per group; membership
    is a rank predicate with a total tiebreak (row_number over
    (value, custkey)); the kept sum is an exact integer and the mean
    ONE final division. Plan: one window pass partitioned by segment
    + the same-shuffle aggregation — ranks never leave their
    partition."""
    cust = load_table(spark, sf_dir, "customer")
    b = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.round(dec("c_acctbal", BAL) * 100).cast("long").alias("y"),
        "c_custkey",
    )
    from pyspark.sql import Window as _W

    r = b.select(
        "seg",
        "y",
        F.row_number()
        .over(_W.partitionBy("seg").orderBy("y", "c_custkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(_W.partitionBy("seg")).alias("n"),
    )
    kept = F.when(
        (F.col("rn") > F.expr("n DIV 10"))
        & (F.col("rn") <= F.col("n") - F.expr("n DIV 10")),
        F.col("y"),
    ).otherwise(F.lit(0))
    return r.groupBy("seg").agg(
        F.any_value("n").cast("long").alias("n"),
        F.expr("CAST(ANY_VALUE(n) DIV 10 AS BIGINT)").alias("n_trimmed_each_side"),
        F.sum(kept).cast("long").alias("kept_cents"),
        F.round(
            F.sum(kept).cast("double")
            / (F.any_value("n") - 2 * F.expr("ANY_VALUE(n) DIV 10")),
            6,
        ).alias("trimmed_mean_cents"),
    )


_GTEST_ORACLE = """
WITH r AS (
  SELECT CASE WHEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) < 30000
              THEN 'low'
              WHEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) < 70000
              THEN 'mid' ELSE 'high' END AS band_a,
         CASE WHEN CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS BIGINT) < 33
              THEN 'low'
              WHEN CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS BIGINT) < 66
              THEN 'mid' ELSE 'high' END AS band_b
  FROM events
), cells AS (
  SELECT band_a, band_b, CAST(COUNT(*) AS BIGINT) AS o FROM r GROUP BY 1, 2
), marg AS (
  SELECT c.band_a, c.band_b, c.o,
         ra.s_a, rb.s_b, t.n
  FROM cells c
  JOIN (SELECT band_a, CAST(SUM(o) AS BIGINT) AS s_a FROM cells GROUP BY 1) ra
    USING (band_a)
  JOIN (SELECT band_b, CAST(SUM(o) AS BIGINT) AS s_b FROM cells GROUP BY 1) rb
    USING (band_b)
  CROSS JOIN (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells) t
), terms AS (
  SELECT CAST(round(1000000 * o * ln(CAST(o AS DOUBLE) * n / (s_a * CAST(s_b AS DOUBLE))))
              AS BIGINT) AS term_micro
  FROM marg WHERE o > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(2 * SUM(term_micro) AS BIGINT) AS g_statistic_micro
FROM terms
"""


@register("agg_g_test_independence", oracle=_GTEST_ORACLE, tags=("agg", "stats"))
def agg_g_test_independence(spark, sf_dir):
    """G-TEST of independence (log-likelihood ratio, G = 2·Σ O·ln(O/E))
    over the same 3x3 value-band × k-band table as agg_cohens_kappa —
    the information-theoretic twin of agg_chi_square_cells (G is
    additive across partitions of the table and equals 2n·MI(nats),
    which is why contingency pipelines carry it alongside χ²). Each
    cell's O·ln(O·n / (rowsum·colsum)) is one double log of EXACT
    integers quantized ONCE to micro-units (transcendental — no repr-
    boundary risk, the micro-nat rule), then G is an exact integer sum.
    Empty cells contribute zero by the O > 0 filter, exactly as the
    statistic defines. Plan: one |bands|²-cell rollup + broadcast
    marginals."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(dec("value", VAL) * 100).cast("long")
    kf = F.regexp_extract("props", '"k": *([0-9]+)', 1).cast("long")
    band = lambda c, lo, hi: (  # noqa: E731
        F.when(c < lo, F.lit("low")).when(c < hi, F.lit("mid")).otherwise(F.lit("high"))
    )
    cells = (
        ev.select(
            band(cents, 30000, 70000).alias("band_a"),
            band(kf, 33, 66).alias("band_b"),
        )
        .groupBy("band_a", "band_b")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    ra = cells.groupBy("band_a").agg(F.sum("o").cast("long").alias("s_a"))
    rb = cells.groupBy("band_b").agg(F.sum("o").cast("long").alias("s_b"))
    t = cells.agg(F.sum("o").cast("long").alias("n"))
    terms = (
        cells.join(F.broadcast(ra), "band_a")
        .join(F.broadcast(rb), "band_b")
        .crossJoin(F.broadcast(t))
        .filter(F.col("o") > 0)
        .select(
            F.round(
                1_000_000
                * F.col("o")
                * F.log(
                    F.col("o").cast("double") * F.col("n")
                    / (F.col("s_a") * F.col("s_b").cast("double"))
                )
            )
            .cast("long")
            .alias("term_micro")
        )
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (2 * F.sum("term_micro")).cast("long").alias("g_statistic_micro"),
    )


_MORANS_ORACLE = """
WITH b AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), e AS (
  SELECT a.p AS u, x.p AS v
  FROM b a JOIN b x ON a.o = x.o AND a.p < x.p
  GROUP BY a.p, x.p
  HAVING COUNT(*) >= 2
), nodes AS (
  SELECT DISTINCT u AS node FROM e UNION SELECT DISTINCT v FROM e
), x AS (
  SELECT n.node,
         CAST(round(CAST(p.p_retailprice AS DECIMAL(12,2)) * 100) AS BIGINT)
           AS cents
  FROM nodes n JOIN part p ON p.p_partkey = n.node
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
  FROM x
), z AS (
  SELECT x.node, CAST(x.cents * m.n - m.s AS BIGINT) AS z FROM x, m
), num AS (
  SELECT CAST(SUM(CAST(za.z AS HUGEINT) * zb.z) AS DECIMAL(38,0)) AS cross_sum,
         CAST(COUNT(*) AS BIGINT) AS w2
  FROM e JOIN z za ON za.node = e.u JOIN z zb ON zb.node = e.v
), den AS (
  SELECT CAST(SUM(CAST(z AS HUGEINT) * z) AS DECIMAL(38,0)) AS zz FROM z
)
SELECT m.n AS n_nodes, num.w2 AS n_edges,
       round(CAST(m.n AS DOUBLE) / (2 * num.w2)
             * (2 * CAST(num.cross_sum AS DOUBLE)) / CAST(den.zz AS DOUBLE),
             6) AS morans_i
FROM m, num, den
"""


@register("agg_morans_i", oracle=_MORANS_ORACLE, tags=("agg", "stats", "graph"))
def agg_morans_i(spark, sf_dir):
    """MORAN'S I spatial autocorrelation (Moran 1950) of part retail
    price over the co-order GRAPH neighborhood structure: do parts
    that co-occur in orders have correlated prices? — the statistic
    that turns "graph + node attribute" into one signed scalar
    (positive: price-similar parts cluster in baskets; negative:
    baskets mix price tiers). I = (n/ΣW)·Σ w_ij z_i z_j / Σ z_i² with
    binary symmetric weights from the co-order edges. Exactness: the
    centered attribute is scaled to z_i = n·x_i − S (exact integers —
    no float mean), both quadratic forms are DECIMAL(38)/HUGEINT sums,
    and I is ONE float expression (the n scaling cancels exactly).
    Plan: the edge relation is the bounded co-order join; the
    quadratic form is two broadcast attribute joins + one exact sum —
    no materialized weight matrix anywhere."""
    # the shared pinned co-order edge derivation (optimization r13):
    # this query references e 3x (both node endpoints + the quadratic
    # form) and z 3x on top of it — inline-derived, the lineage
    # multiplied to a 174-Exchange plan; the helper's localCheckpoint
    # truncates it (identical CTE on the oracle side, same MIN_SHARED=2)
    from .profiling import _coorder_part_edges

    part = load_table(spark, sf_dir, "part")
    e = _coorder_part_edges(spark, sf_dir).select("u", "v")
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
    x = nodes.join(
        part.select(
            F.col("p_partkey").alias("node"),
            F.round(dec("p_retailprice", BAL) * 100).cast("long").alias("cents"),
        ),
        "node",
    )
    m = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    z = x.crossJoin(F.broadcast(m)).select(
        "node", (F.col("cents") * F.col("n") - F.col("s")).cast("long").alias("z")
    )
    num = (
        e.join(z.select(F.col("node").alias("u"), F.col("z").alias("za")), "u")
        .join(z.select(F.col("node").alias("v"), F.col("z").alias("zb")), "v")
        .agg(
            F.sum(F.col("za").cast("decimal(38,0)") * F.col("zb")).alias("cross_sum"),
            F.count(F.lit(1)).cast("long").alias("w2"),
        )
    )
    den = z.agg(F.sum(F.col("z").cast("decimal(38,0)") * F.col("z")).alias("zz"))
    return (
        m.crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(den))
        .select(
            F.col("n").alias("n_nodes"),
            F.col("w2").alias("n_edges"),
            F.round(
                F.col("n").cast("double")
                / (2 * F.col("w2"))
                * (2 * F.col("cross_sum").cast("double"))
                / F.col("zz").cast("double"),
                6,
            ).alias("morans_i"),
        )
    )


_WILCOXON_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_id % 2 = 0
                       THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS even_sum,
         CAST(SUM(CASE WHEN event_id % 2 = 1
                       THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS odd_sum,
         CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_even,
         CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_odd
  FROM events GROUP BY user_id
), d AS (
  SELECT user_id, even_sum * n_odd - odd_sum * n_even AS diff
  FROM per_user WHERE n_even > 0 AND n_odd > 0
                  AND even_sum * n_odd <> odd_sum * n_even
), r AS (
  SELECT CASE WHEN diff > 0 THEN 1 ELSE 0 END AS pos,
         row_number() OVER (ORDER BY ABS(diff), user_id) AS rnk
  FROM d
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN pos = 1 THEN rnk ELSE 0 END) AS BIGINT) AS w_plus,
       CAST(SUM(CASE WHEN pos = 0 THEN rnk ELSE 0 END) AS BIGINT) AS w_minus
FROM r
"""


@register("agg_wilcoxon_signed_rank", oracle=_WILCOXON_ORACLE, tags=("agg", "stats"))
def agg_wilcoxon_signed_rank(spark, sf_dir):
    """WILCOXON SIGNED-RANK statistic (Wilcoxon 1945) — the PAIRED
    nonparametric test beside the unpaired agg_mann_whitney_u: each
    user contributes one within-subject difference (mean value of
    their even-id events minus mean of their odd-id events — an
    arbitrary deterministic pairing, stated), differences are ranked
    by magnitude, and W+ / W− are the signed rank sums. Exactness: the
    mean comparison is cleared of division by cross-multiplying
    (even_sum·n_odd vs odd_sum·n_even — exact integers), zero
    differences are dropped exactly as the statistic prescribes, and
    |diff| ranks come from the two-pass distributed rank with a total
    id tiebreak (the spearman convention, stated in place of midrank
    ties). Plan: one keyed rollup + one global_index pass + one 1-row
    reduce."""
    from ..operators.scale import global_index

    ev = load_table(spark, sf_dir, "events")
    cents = F.round(dec("value", VAL) * 100).cast("long")
    even = F.when(F.pmod("event_id", F.lit(2)) == 0, cents).otherwise(F.lit(0))
    odd = F.when(F.pmod("event_id", F.lit(2)) == 1, cents).otherwise(F.lit(0))
    per_user = ev.groupBy("user_id").agg(
        F.sum(even).cast("long").alias("even_sum"),
        F.sum(odd).cast("long").alias("odd_sum"),
        F.sum(F.when(F.pmod("event_id", F.lit(2)) == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_even"),
        F.sum(F.when(F.pmod("event_id", F.lit(2)) == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_odd"),
    )
    d = (
        per_user.filter((F.col("n_even") > 0) & (F.col("n_odd") > 0))
        .select(
            "user_id",
            (
                F.col("even_sum") * F.col("n_odd")
                - F.col("odd_sum") * F.col("n_even")
            ).alias("diff"),
        )
        .filter(F.col("diff") != 0)
    )
    r = global_index(
        d.select(
            "user_id",
            (F.col("diff") > 0).cast("int").alias("pos"),
            F.abs("diff").alias("absdiff"),
        ),
        "rnk0",
        ["absdiff", "user_id"],
    ).select("pos", (F.col("rnk0") + 1).cast("long").alias("rnk"))
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("pos") == 1, F.col("rnk")).otherwise(0))
        .cast("long")
        .alias("w_plus"),
        F.sum(F.when(F.col("pos") == 0, F.col("rnk")).otherwise(0))
        .cast("long")
        .alias("w_minus"),
    )


_KRUSKAL_ORACLE = """
WITH b AS (
  SELECT c_mktsegment AS seg, c_custkey,
         CAST(round(CAST(c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT) AS y
  FROM customer
), r AS (
  SELECT seg,
         row_number() OVER (ORDER BY y, c_custkey) AS rnk
  FROM b
), g AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(rnk) AS BIGINT) AS r_g
  FROM r GROUP BY seg
), t AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k FROM g
), s AS (
  SELECT CAST(SUM(CAST(r_g AS HUGEINT) * r_g * 1000000 // n_g)
              AS DECIMAL(38,0)) AS srr
  FROM g
)
SELECT t.n, t.k,
       round(12.0 * (CAST(s.srr AS DOUBLE) / 1000000.0)
             / (CAST(t.n AS DOUBLE) * (t.n + 1))
             - 3.0 * (t.n + 1), 6) AS h_statistic
FROM t, s
"""


@register("agg_kruskal_wallis", oracle=_KRUSKAL_ORACLE, tags=("agg", "stats"))
def agg_kruskal_wallis(spark, sf_dir):
    """KRUSKAL-WALLIS H across market segments (Kruskal & Wallis 1952)
    — the k-group rank test completing the engine's nonparametric
    family (Mann-Whitney: two unpaired groups; Wilcoxon signed-rank:
    paired; this: k groups), the test you reach for when agg_anova_f's
    normality assumption is off the table. H = 12/(n(n+1))·Σ R_g²/n_g
    − 3(n+1) with the global ranks from the two-pass distributed rank
    under a total (value, custkey) tiebreak (the spearman convention,
    stated in place of midranks). Σ R_g²/n_g is accumulated at a FIXED
    integer scale: Σ (R_g²·10⁶ DIV n_g) in DECIMAL(38)/HUGEINT, so the
    truncated remainder per term is < 10⁻⁶ ranks and the total error in
    H is < 12k/(n(n+1)·10⁶) — invisible at round(6) (ADVICE r9: the
    unscaled DIV dropped up to k−1 whole ranks, ~1e-3 in H at
    sf0.001). Headroom: R_g²·10⁶ ≤ n⁴·10⁶ stays inside 38 digits
    through n ≈ 10⁸ rows; beyond that, lower the scale constant. H is
    one float expression at the end. Plan: one global_index pass + two
    1-row reduces."""
    from ..operators.scale import global_index

    cust = load_table(spark, sf_dir, "customer")
    b = cust.select(
        F.col("c_mktsegment").alias("seg"),
        "c_custkey",
        F.round(dec("c_acctbal", BAL) * 100).cast("long").alias("y"),
    )
    r = global_index(b, "rnk0", ["y", "c_custkey"]).select(
        "seg", (F.col("rnk0") + 1).cast("long").alias("rnk")
    )
    g = r.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("rnk").cast("long").alias("r_g"),
    )
    t = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    s = g.agg(
        F.sum(
            F.expr(
                "CAST(CAST(r_g AS DECIMAL(38,0)) * r_g * 1000000 DIV n_g"
                " AS DECIMAL(38,0))"
            )
        ).alias("srr")
    )
    return (
        t.crossJoin(F.broadcast(s))
        .select(
            "n",
            "k",
            F.round(
                12.0 * (F.col("srr").cast("double") / 1000000.0)
                / (F.col("n").cast("double") * (F.col("n") + 1))
                - 3.0 * (F.col("n") + 1),
                6,
            ).alias("h_statistic"),
        )
    )
