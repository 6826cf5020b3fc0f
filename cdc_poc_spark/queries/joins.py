"""Join surface (SURVEY §2.B "Joins" — absent from the reference, declared
engine capability): every join type, broadcast strategy, non-equi
conditions, and the as-of join the CDC snapshot-at-time semantics need.

Scale notes: dimension sides are broadcast explicitly; fact-fact joins
shuffle on their keys and rely on AQE for skew. The as-of join is the
union+window formulation — O(n log n) per key, no join explosion — which
is the only formulation that survives 100 TB (a naive time-range join is
quadratic per key).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..tables import BAL, MONEY, dec, load_table
from . import register

# ---------------------------------------------------------------------------
# Inner / outer family
# ---------------------------------------------------------------------------

_INNER_ORACLE = """
SELECT c_nationkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_spend
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


@register("join_inner_orders_customer", oracle=_INNER_ORACLE, tags=("join", "agg"))
def join_inner_orders_customer(spark, sf_dir):
    """Equi inner join, customer side broadcast (dim), agg by nation."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice", MONEY)).cast("double").alias("total_spend"),
        )
    )


_LEFT_ORACLE = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(15,2))), 0) AS DOUBLE) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


@register("join_left_outer_customer_orders", oracle=_LEFT_ORACLE, tags=("join", "agg"))
def join_left_outer_customer_orders(spark, sf_dir):
    """Left outer: customers kept even with zero orders (COUNT of the
    nullable key counts matches only)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice", MONEY)), F.lit(0).cast("decimal(25,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


_RIGHT_ORACLE = """
SELECT n_nationkey, n_name, s_suppkey
FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
"""


@register("join_right_outer_supplier_nation", oracle=_RIGHT_ORACLE, tags=("join",))
def join_right_outer_supplier_nation(spark, sf_dir):
    """Right outer: every nation survives; nations without suppliers get
    NULL s_suppkey."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return supp.join(nation, supp.s_nationkey == nation.n_nationkey, "right").select(
        "n_nationkey", "n_name", "s_suppkey"
    )


_FULL_ORACLE = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
)
SELECT user_id, c_custkey, n_events
FROM per_user FULL JOIN customer ON user_id = c_custkey
"""


@register("join_full_outer_events_customer", oracle=_FULL_ORACLE, tags=("join", "agg"))
def join_full_outer_events_customer(spark, sf_dir):
    """Full outer join — the key domains deliberately misalign (user_id
    0..N-1 vs c_custkey 1..N) so both unmatched sides appear."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    return per_user.join(cust, per_user.user_id == cust.c_custkey, "full").select(
        "user_id", "c_custkey", "n_events"
    )


# ---------------------------------------------------------------------------
# Semi / anti / cross / non-equi
# ---------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


@register("join_semi_big_spenders", oracle=_SEMI_ORACLE, tags=("join",))
def join_semi_big_spenders(spark, sf_dir):
    """Left-semi join = EXISTS. The probe side never widens — the
    shuffle carries only the filtered orders keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter("o_totalprice > 300000")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


@register("join_anti_customers_without_orders", oracle=_ANTI_ORACLE, tags=("join",))
def join_anti_customers_without_orders(spark, sf_dir):
    """Left-anti join = NOT EXISTS: customers with no 300k+ order.
    The unfiltered form ("no orders at all") is EMPTY at every fixture
    SF — a green-on-empty oracle that could not distinguish a broken
    anti join from a working one; the thresholded form is non-empty at
    all SFs (3 / 30 / 308 rows) through the same left-anti plan."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter("o_totalprice > 300000")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_CROSS_ORACLE = """
SELECT a.r_regionkey AS from_region, b.r_regionkey AS to_region
FROM region a CROSS JOIN region b
WHERE a.r_regionkey <> b.r_regionkey
"""


@register("join_cross_region_pairs", oracle=_CROSS_ORACLE, tags=("join",))
def join_cross_region_pairs(spark, sf_dir):
    """Cross join (tiny×tiny only — a cartesian is never the scale path)."""
    a = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("from_region")
    )
    b = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("to_region")
    )
    return a.crossJoin(b).filter("from_region <> to_region")


_THETA_ORACLE = """
SELECT p_brand, COUNT(*) AS n_overweight,
       CAST(SUM(CAST(l_quantity AS DECIMAL(8,1))) AS DOUBLE) AS total_qty
FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
GROUP BY p_brand
"""


@register("join_theta_quantity_over_size", oracle=_THETA_ORACLE, tags=("join", "agg"))
def join_theta_quantity_over_size(spark, sf_dir):
    """Equi join with an additional theta (inequality) condition — the
    equi key drives the physical join; the inequality is a post-filter,
    so this stays a hash join, not a nested-loop."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(part),
            (li.l_partkey == part.p_partkey) & (li.l_quantity > part.p_size),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_overweight"),
            F.sum(dec("l_quantity", "decimal(8,1)")).cast("double").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join (union + window — the scale-correct formulation)
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH ordered AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
  FROM events WHERE event_type IN ('view', 'purchase')
), marked AS (
  SELECT event_id, user_id, event_type, ts_us,
         last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view_id
  FROM ordered
)
SELECT event_id, user_id, ts_us, prev_view_id
FROM marked WHERE event_type = 'purchase'
"""


@register("join_asof_purchase_to_view", oracle=_ASOF_ORACLE, tags=("join", "window", "asof"))
def join_asof_purchase_to_view(spark, sf_dir):
    """As-of join: each purchase matched to the user's most recent
    preceding view. Implemented as union+window (last_value IGNORE NULLS
    over the interleaved, time-ordered stream) — one shuffle on the key,
    no range-join explosion. This is the CDC snapshot-at-time primitive
    (SURVEY §2.B joins row)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select("event_id", "user_id", "event_type", F.expr("ts DIV 1000").alias("ts_us"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_view = F.last(
        F.when(F.col("event_type") == "view", F.col("event_id")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("prev_view_id", prev_view)
        .filter("event_type = 'purchase'")
        .select("event_id", "user_id", "ts_us", "prev_view_id")
    )


# ---------------------------------------------------------------------------
# Nearest-event join (bidirectional as-of — round 5)
# ---------------------------------------------------------------------------

_NEAREST_ORACLE = """
WITH ordered AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
  FROM events WHERE event_type IN ('view', 'purchase')
), m AS (
  SELECT event_id, user_id, event_type, ts_us,
         last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
           OVER wb AS pv_id,
         last_value(CASE WHEN event_type = 'view' THEN ts_us END IGNORE NULLS)
           OVER wb AS pv_ts,
         first_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
           OVER wa AS nv_id,
         first_value(CASE WHEN event_type = 'view' THEN ts_us END IGNORE NULLS)
           OVER wa AS nv_ts
  FROM ordered
  WINDOW wb AS (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         wa AS (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id, ts_us,
       CASE WHEN nv_ts IS NULL
                 OR (pv_ts IS NOT NULL AND (ts_us - pv_ts) <= (nv_ts - ts_us))
            THEN pv_id ELSE nv_id END AS nearest_view_id,
       CASE WHEN nv_ts IS NULL
                 OR (pv_ts IS NOT NULL AND (ts_us - pv_ts) <= (nv_ts - ts_us))
            THEN pv_ts - ts_us ELSE nv_ts - ts_us END AS delta_us
FROM m WHERE event_type = 'purchase'
"""


@register("join_nearest_event", oracle=_NEAREST_ORACLE, tags=("join", "window", "asof"))
def join_nearest_event(spark, sf_dir):
    """NEAREST-event join: each purchase matched to the closest view by
    the same user in EITHER direction (min |Δt|; ties go to the earlier
    view) — the bidirectional completion of the backward-only as-of
    join, and the temporal-join flavor sensor/attribution pipelines ask
    for ("closest reading to the incident", not "last reading before").
    Same scale-correct formulation as join_asof_purchase_to_view: union
    both event kinds, ONE window shuffle on user_id serving both the
    backward (last view before) and forward (first view after) frames —
    never a per-row range probe or a quadratic self-join. delta_us is
    signed (negative = matched view precedes the purchase)."""
    ev = load_table(spark, sf_dir, "events")
    ordered = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "event_id", "user_id", "event_type", F.expr("ts DIV 1000").alias("ts_us")
    )
    view_row = F.when(
        F.col("event_type") == "view", F.struct("ts_us", "event_id")
    )
    wb = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wa = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    m = ordered.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.last(view_row, ignorenulls=True).over(wb).alias("pv"),
        F.first(view_row, ignorenulls=True).over(wa).alias("nv"),
    )
    take_prev = F.col("nv").isNull() | (
        F.col("pv").isNotNull()
        & (
            (F.col("ts_us") - F.col("pv.ts_us"))
            <= (F.col("nv.ts_us") - F.col("ts_us"))
        )
    )
    return m.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts_us",
        F.when(take_prev, F.col("pv.event_id"))
        .otherwise(F.col("nv.event_id"))
        .alias("nearest_view_id"),
        F.when(take_prev, F.col("pv.ts_us") - F.col("ts_us"))
        .otherwise(F.col("nv.ts_us") - F.col("ts_us"))
        .alias("delta_us"),
    )


# ---------------------------------------------------------------------------
# Round-6: 2D spatial self-join via grid-cell bucketing.
# ---------------------------------------------------------------------------

_SPATIAL_KM = 250.0  # pair radius
_SPATIAL_DEG = 2.5   # grid cell size ~ radius in degrees (flat-earth demo grid)

_SPATIAL_ORACLE = f"""
WITH geo AS (
  -- box +-5 deg: dense enough that pairs exist at EVERY fixture SF
  -- (the +-10 box was EMPTY at sf0.001 — caught by the all-pairs
  -- reference test, per the gate-honesty rule)
  SELECT s_suppkey,
         (CAST(('0x' || substring(md5('slat:' || CAST(s_suppkey AS VARCHAR)), 1, 8))
               AS BIGINT) % 10000000) / 1000000.0 - 5.0 AS lat,
         (CAST(('0x' || substring(md5('slon:' || CAST(s_suppkey AS VARCHAR)), 1, 8))
               AS BIGINT) % 10000000) / 1000000.0 - 5.0 AS lon
  FROM supplier
), cells AS (
  SELECT *, CAST(floor(lat / {_SPATIAL_DEG}) AS BIGINT) AS cx,
            CAST(floor(lon / {_SPATIAL_DEG}) AS BIGINT) AS cy
  FROM geo
), probe AS (
  SELECT c.*, c.cx + dx.d AS px, c.cy + dy.d AS py
  FROM cells c,
       (SELECT unnest([-1, 0, 1]) AS d) dx,
       (SELECT unnest([-1, 0, 1]) AS d) dy
), pairs AS (
  SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
         2 * 6371.0088 * asin(sqrt(
           pow(sin(radians(b.lat - a.lat) / 2), 2)
           + cos(radians(a.lat)) * cos(radians(b.lat))
             * pow(sin(radians(b.lon - a.lon) / 2), 2))) AS km
  FROM probe a JOIN cells b ON b.cx = a.px AND b.cy = a.py
  WHERE a.s_suppkey < b.s_suppkey
)
SELECT supp_a, supp_b, round(km, 3) AS km
FROM pairs WHERE km <= {_SPATIAL_KM}
"""


@register("join_spatial_grid_pairs", oracle=_SPATIAL_ORACLE, tags=("join", "geo"))
def join_spatial_grid_pairs(spark, sf_dir):
    """Spatial self-join — all supplier pairs within 250 km (md5-derived
    coordinates; the derivation is part of the query) via GRID-CELL
    bucketing: each point lands in one floor(coord/cell) cell, the
    probe side explodes to its 3x3 neighborhood, candidates come from
    a cell-key EQUI-join (never a cross join), and the exact haversine
    residual filters. Cell size ~ radius caps candidates at the 9-cell
    neighborhood — the standard distributed spatial-join plan (same
    replicate-then-equi-join shape as join_range_binned, one dimension
    up). a<b dedup keeps each pair once despite the 9x replication."""
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey")

    def coord(salt):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt), F.col("s_suppkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 10000000
            / 1000000.0
            - 5.0
        )

    geo = sup.select(
        "s_suppkey", coord("slat:").alias("lat"), coord("slon:").alias("lon")
    )
    cells = geo.select(
        "*",
        F.floor(F.col("lat") / _SPATIAL_DEG).cast("long").alias("cx"),
        F.floor(F.col("lon") / _SPATIAL_DEG).cast("long").alias("cy"),
    )
    probe = (
        cells.withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("s_suppkey").alias("supp_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            (F.col("cx") + F.col("dx")).alias("px"),
            (F.col("cy") + F.col("dy")).alias("py"),
        )
    )
    b = cells.select(
        F.col("s_suppkey").alias("supp_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cx").alias("px"),
        F.col("cy").alias("py"),
    )
    hav = (
        F.pow(F.sin(F.radians(F.col("lat_b") - F.col("lat_a")) / 2), 2)
        + F.cos(F.radians("lat_a"))
        * F.cos(F.radians("lat_b"))
        * F.pow(F.sin(F.radians(F.col("lon_b") - F.col("lon_a")) / 2), 2)
    )
    km = 2 * 6371.0088 * F.asin(F.sqrt(hav))
    return (
        probe.join(b, ["px", "py"])
        .filter(F.col("supp_a") < F.col("supp_b"))
        .withColumn("km", km)
        .filter(F.col("km") <= _SPATIAL_KM)
        .select("supp_a", "supp_b", F.round("km", 3).alias("km"))
    )
