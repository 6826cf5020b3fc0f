"""Subquery operator surface: EXISTS / NOT EXISTS / IN / correlated
scalar subqueries (SURVEY §2.B joins+aggregations rows — the subquery
shapes of TPC-H Q4/Q17/Q18/Q22, adapted to the fixture schema).

These intentionally go through ``spark.sql`` with real subquery syntax so
the engine exercises Catalyst's decorrelation rules
(RewritePredicateSubquery -> semi/anti join, RewriteCorrelatedScalarSubquery
-> aggregate + left outer join). The DataFrame-API semi/anti equivalents
live in queries/joins.py; at 100 TB both lower to the same physical plans
(shuffled semi/anti hash joins with pushed-down filters).

Scale notes: every subquery here decorrelates to a join on a key column —
no nested-loop re-execution per outer row. Aggregate comparisons go
through DECIMAL so Spark and DuckDB agree bit-for-bit (tables.py
docstring).
"""

from __future__ import annotations

from ..tables import register_views
from . import register

# ---------------------------------------------------------------------------
# EXISTS (TPC-H Q4 shape): order priority count where a returned lineitem
# exists for the order.
# ---------------------------------------------------------------------------

_EXISTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
"""


@register("subq_exists_returned_orders", oracle=_EXISTS_SQL, tags=("subquery", "tpch"))
def subq_exists_returned_orders(spark, sf_dir):
    """Correlated EXISTS -> Catalyst rewrites to a left-semi hash join on
    l_orderkey; the date filter pushes into the orders scan."""
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(_EXISTS_SQL)


# ---------------------------------------------------------------------------
# NOT EXISTS (TPC-H Q22 shape): well-funded customers who never ordered,
# profiled per nation.
# ---------------------------------------------------------------------------

_NOT_EXISTS_SQL = """
SELECT c_nationkey,
       COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (SELECT 1 FROM events
                  WHERE user_id = c_custkey AND event_type = 'purchase')
GROUP BY c_nationkey
"""


@register("subq_not_exists_idle_rich", oracle=_NOT_EXISTS_SQL, tags=("subquery", "tpch"))
def subq_not_exists_idle_rich(spark, sf_dir):
    """Uncorrelated scalar subquery (global exact avg, computed once and
    broadcast) + NOT EXISTS -> left-anti join: above-average-balance
    customers with no purchase event in the stream. The original
    anti-condition ("no orders at all") made the result EMPTY at every
    fixture SF — a green-on-empty oracle that could not distinguish a
    broken correlated NOT EXISTS from a working one; the event-stream
    form is non-empty at all SFs (61 / 593 / 6193 customers) through
    the same scalar-subquery + anti-join plan."""
    register_views(spark, sf_dir, ("customer", "events"))
    return spark.sql(_NOT_EXISTS_SQL)


# ---------------------------------------------------------------------------
# IN over a grouped HAVING subquery (TPC-H Q18 shape): big-quantity orders.
# ---------------------------------------------------------------------------

_IN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(8,1))) > 150
)
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("subq_in_big_quantity_orders", oracle=_IN_SQL, tags=("subquery", "tpch", "topk"))
def subq_in_big_quantity_orders(spark, sf_dir):
    """IN (grouped subquery) -> semi join against a pre-aggregated
    lineitem rollup; top-k via global sort + limit (TakeOrderedAndProject
    physically — no full sort materialization)."""
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(_IN_SQL)


# ---------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q17 shape): small-quantity outliers
# vs the per-part average.
# ---------------------------------------------------------------------------

_SCALAR_CORR_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS total_price,
       COUNT(*) AS n_lines
FROM lineitem l1
WHERE l_quantity < (
  SELECT 0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(8,1))) AS DOUBLE) / COUNT(*))
  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
)
"""


@register("subq_scalar_corr_below_avg", oracle=_SCALAR_CORR_SQL, tags=("subquery", "tpch"))
def subq_scalar_corr_below_avg(spark, sf_dir):
    """Correlated scalar AVG -> decorrelates to groupBy(l_partkey) + join
    back on the part key: one aggregation pass, not one subquery per row.
    The exact decimal-sum/count form keeps the threshold bit-identical
    across engines."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_SCALAR_CORR_SQL)
