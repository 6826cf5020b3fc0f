"""TPC-H-style analytic queries over the fixture star schema.

These exercise the scan -> filter -> join -> aggregate -> sort/limit
pipeline (SURVEY §2.B rows: projection/filter, joins, aggregations,
sorts/top-k). The reference itself has no relational algebra (SURVEY §2
preamble) — this is the declared surface of the new engine.

Scale notes (100 TB): every query is a declarative plan — filters reach
the parquet scan (PushedFilters), dimension tables are broadcast
explicitly, fact-fact joins shuffle on their join key and AQE handles
skew/coalesce. No collects, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import MONEY, QTY, RATE, dec, load_table
from . import register

# ---------------------------------------------------------------------------
# Q1: pricing summary (grouped 8-agg over a pushed-down date filter)
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(8,1))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(8,1))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, tags=("agg", "tpch"))
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape. Exact decimal sums cast back to double; averages
    as sum/count so they are shuffle-order independent."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_shipdate <= TIMESTAMP '1998-09-02'"
    )
    disc_price = dec("l_extendedprice", MONEY) * (F.lit(1) - dec("l_discount", RATE))
    charge = disc_price * (F.lit(1) + dec("l_tax", RATE))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity", QTY)).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice", MONEY)).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (F.sum(dec("l_quantity", QTY)).cast("double") / n).alias("avg_qty"),
        (F.sum(dec("l_extendedprice", MONEY)).cast("double") / n).alias("avg_price"),
        (F.sum(dec("l_discount", RATE)).cast("double") / n).alias("avg_disc"),
        n.alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Q3: shipping priority (3-way join, agg, top-k)
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT
  l_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-15'
  AND l_shipdate > TIMESTAMP '1997-06-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE, tags=("join", "agg", "topk", "tpch"))
def q3_shipping_priority(spark, sf_dir):
    """Broadcast the filtered customer dim; shuffle join orders-lineitem
    on orderkey; deterministic top-10 (revenue desc, orderkey asc)."""
    cust = load_table(spark, sf_dir, "customer").filter("c_mktsegment = 'BUILDING'")
    orders = load_table(spark, sf_dir, "orders").filter(
        "o_orderdate < TIMESTAMP '1997-06-15'"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_shipdate > TIMESTAMP '1997-06-15'"
    )
    revenue = dec("l_extendedprice", MONEY) * (F.lit(1) - dec("l_discount", RATE))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5: local supplier volume (6-way join through region)
# ---------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_ORACLE, tags=("join", "agg", "tpch"))
def q5_local_supplier_volume(spark, sf_dir):
    """Six-way join: the three dims (supplier, nation, region) broadcast;
    the fact-fact joins shuffle on orderkey/custkey. The c_nationkey =
    s_nationkey condition rides on the supplier join (composite equi)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        "o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'"
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter("r_name = 'ASIA'")
    revenue = dec("l_extendedprice", MONEY) * (F.lit(1) - dec("l_discount", RATE))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q6: forecast revenue change (pure pushed-down filter + global agg)
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE, tags=("filter", "agg", "tpch"))
def q6_forecast_revenue(spark, sf_dir):
    """All four predicates push into the parquet scan; single partial+final
    agg, no shuffle of data rows."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'"
        " AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    )
    return li.agg(
        F.sum(dec("l_extendedprice", MONEY) * dec("l_discount", RATE))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Q10: returned items (join + group by customer, top 20)
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT
  c_custkey,
  c_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_ORACLE, tags=("join", "agg", "topk", "tpch"))
def q10_returned_items(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter("l_returnflag = 'R'")
    nation = load_table(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice", MONEY) * (F.lit(1) - dec("l_discount", RATE))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations (dual-role nation join)
# ---------------------------------------------------------------------------

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume
  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_nation_volume_shipping", oracle=_Q7_ORACLE, tags=("join", "agg", "tpch"))
def q7_nation_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: the nation table joins TWICE under different
    roles (supplier side / customer side) — both broadcast; the
    symmetric nation-pair predicate applies after."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    volume = dec("l_extendedprice", MONEY) * (F.lit(1) - dec("l_discount", RATE))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(volume).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8: market share of one nation inside one region for one part type
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0.00 AS DECIMAL(17,4)) END) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(17,4)) AS volume,
         n2.n_name AS supp_nation
  FROM part JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
"""


@register("q8_market_share", oracle=_Q8_ORACLE, tags=("join", "agg", "tpch"))
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: 8-way join, conditional aggregation ratio. The
    0-valued ELSE keeps the numerator exact-decimal so the share is
    bit-reproducible."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter("p_type = 'PROMO'")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter("r_name = 'EUROPE'")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = (
        dec("l_extendedprice", MONEY) * (F.lit(1) - dec("l_discount", RATE))
    ).cast("decimal(17,4)")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
            F.lit("0.00").cast("decimal(17,4)")
        )
    ).cast("double")
    return joined.groupBy("o_year").agg(
        (num / F.sum("volume").cast("double")).cast("double").alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q14: promotion revenue share for one month
# ---------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT CAST(100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
                 ELSE CAST(0.00 AS DECIMAL(17,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


@register("q14_promo_revenue", oracle=_Q14_ORACLE, tags=("join", "agg", "tpch"))
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: single-month pushed-down scan, broadcast part
    dim, conditional-aggregation percentage."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'"
    )
    part = load_table(spark, sf_dir, "part")
    rev = dec("l_extendedprice", MONEY) * (F.lit(1) - dec("l_discount", RATE))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev.cast("decimal(17,4)")).otherwise(
            F.lit("0.00").cast("decimal(17,4)")
        )
    ).cast("double")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.0) * promo / F.sum(rev).cast("double"))
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution (outer join + double aggregation)
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register("q13_customer_distribution", oracle=_Q13_ORACLE, tags=("join", "agg", "tpch"))
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: left outer join with an extra join-side
    predicate (kept in the join condition, NOT a post-filter — a
    post-filter would turn the outer join inner), then agg-of-agg.
    COUNT(col) counts non-null matches only."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q15: top supplier(s) by quarterly revenue (aggregate view + global max)
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE, tags=("join", "agg", "subquery", "tpch"))
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: quarterly revenue rollup reused twice (once as
    the join input, once for the global max) — Catalyst's ReuseExchange
    dedups the scan+agg; the max is a one-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'"
    )
    revenue = dec("l_extendedprice", MONEY) * (F.lit(1) - dec("l_discount", RATE))
    rev0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue).cast("double").alias("total_revenue")
    )
    max_rev = rev0.agg(F.max("total_revenue").alias("mr"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(rev0, supp.s_suppkey == rev0.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mr"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q19: disjunctive multi-predicate join (brand x size x quantity bands)
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 30)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 40)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 50)
"""


@register("q19_disjunctive_predicates", oracle=_Q19_ORACLE, tags=("join", "filter", "tpch"))
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst
    extracts the common sub-predicates it can push to each scan
    (p_brand IN (...), l_quantity bounds) and evaluates the full
    disjunction after the broadcast join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = dec("l_extendedprice", MONEY) * (F.lit(1) - dec("l_discount", RATE))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 30)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return joined.filter(cond).agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
