"""Set-operation surface (SURVEY §2.B "Set ops"): UNION ALL / UNION
DISTINCT / INTERSECT / EXCEPT, plus the schema-evolving union-by-name
that is the batch twin of the reference's mergeSchema append
(reference consumer.py:76, `mergeSchema=true`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load_table
from . import register

_UNION_ALL_ORACLE = """
SELECT 'building' AS src, c_custkey AS id FROM customer WHERE c_mktsegment = 'BUILDING'
UNION ALL
SELECT 'machinery' AS src, c_custkey AS id FROM customer WHERE c_mktsegment = 'MACHINERY'
"""


@register("setop_union_all_tagged", oracle=_UNION_ALL_ORACLE, tags=("setop",))
def setop_union_all_tagged(spark, sf_dir):
    """UNION ALL of two tagged branches (no dedup shuffle)."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter("c_mktsegment = 'BUILDING'").select(
        F.lit("building").alias("src"), F.col("c_custkey").alias("id")
    )
    b = cust.filter("c_mktsegment = 'MACHINERY'").select(
        F.lit("machinery").alias("src"), F.col("c_custkey").alias("id")
    )
    return a.union(b)


_UNION_DISTINCT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("setop_union_distinct_nations", oracle=_UNION_DISTINCT_ORACLE, tags=("setop",))
def setop_union_distinct_nations(spark, sf_dir):
    """UNION DISTINCT (union + dedup — one shuffle on the full row)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.union(supp).distinct()


_INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("setop_intersect_nations", oracle=_INTERSECT_ORACLE, tags=("setop",))
def setop_intersect_nations(spark, sf_dir):
    """INTERSECT (distinct semantics in both engines)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


_EXCEPT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
WHERE CAST(s_acctbal AS DECIMAL(12,2)) > 9900
"""


@register("setop_except_nations", oracle=_EXCEPT_ORACLE, tags=("setop",))
def setop_except_nations(spark, sf_dir):
    """EXCEPT (distinct): nations with customers but no TOP-BALANCE
    (>9900) supplier. The unfiltered form ("no suppliers at all") is
    EMPTY at every fixture SF — a green-on-empty oracle that could not
    distinguish a broken EXCEPT from a working one (same gate-honesty
    rule as the KWIC term and the jittered arrival order); the filtered
    form is non-empty at sf0.001/0.01/0.1 while exercising the same
    distinct-subtract plan."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal").cast("decimal(12,2)") > 9900)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return cust.subtract(supp)


_EVOLVE_ORACLE = """
SELECT c_custkey AS entity_id, c_acctbal AS balance, NULL AS priority
FROM customer WHERE c_nationkey = 1
UNION ALL
SELECT o_orderkey AS entity_id, NULL AS balance, o_orderpriority AS priority
FROM orders WHERE o_orderstatus = 'P'
"""


@register("setop_union_by_name_evolving", oracle=_EVOLVE_ORACLE, tags=("setop", "schema-evolution"))
def setop_union_by_name_evolving(spark, sf_dir):
    """Schema-evolving union: two sources with partially overlapping
    columns combined with unionByName(allowMissingColumns=True) — the
    exact semantics of the reference's mergeSchema append
    (consumer.py:76) expressed as a query."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter("c_nationkey = 1")
        .select(
            F.col("c_custkey").alias("entity_id"), F.col("c_acctbal").alias("balance")
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter("o_orderstatus = 'P'")
        .select(
            F.col("o_orderkey").alias("entity_id"),
            F.col("o_orderpriority").alias("priority"),
        )
    )
    return cust.unionByName(orders, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL (round 5)
# ---------------------------------------------------------------------------

_BAG_ORACLE = """
WITH a AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_linenumber = 1
), b AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_linenumber = 2
), ia AS (
  SELECT qty, CAST(COUNT(*) AS BIGINT) AS n_intersect_all
  FROM (SELECT qty FROM a INTERSECT ALL SELECT qty FROM b) GROUP BY qty
), ea AS (
  SELECT qty, CAST(COUNT(*) AS BIGINT) AS n_except_all
  FROM (SELECT qty FROM a EXCEPT ALL SELECT qty FROM b) GROUP BY qty
)
SELECT COALESCE(ia.qty, ea.qty) AS qty,
       COALESCE(ia.n_intersect_all, 0) AS n_intersect_all,
       COALESCE(ea.n_except_all, 0) AS n_except_all
FROM ia FULL OUTER JOIN ea ON ia.qty = ea.qty
"""


@register("setop_bag_semantics", oracle=_BAG_ORACLE, tags=("setop",))
def setop_bag_semantics(spark, sf_dir):
    """BAG-semantics set operations — `intersectAll` / `exceptAll`
    (multiplicity-preserving, per ANSI INTERSECT ALL / EXCEPT ALL):
    min(count_a, count_b) copies survive the intersection, the count
    DIFFERENCE survives the except — semantics a distinct-based
    formulation cannot express. Physically both compile to a
    count-per-value aggregate + generate (no row-by-row matching), so
    the shuffle is |distinct values|, not |rows| — the reason these
    operators stay cheap at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long").alias("qty")
    a = li.filter("l_linenumber = 1").select(qty)
    b = li.filter("l_linenumber = 2").select(qty)
    ia = a.intersectAll(b).groupBy("qty").agg(
        F.count(F.lit(1)).alias("n_intersect_all")
    )
    ea = a.exceptAll(b).groupBy("qty").agg(F.count(F.lit(1)).alias("n_except_all"))
    return (
        ia.join(ea, "qty", "full_outer")
        .select(
            "qty",
            F.coalesce("n_intersect_all", F.lit(0)).alias("n_intersect_all"),
            F.coalesce("n_except_all", F.lit(0)).alias("n_except_all"),
        )
    )
