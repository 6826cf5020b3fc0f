"""asof_join validated against pandas merge_asof (the semantics
reference) on the events fixture, both directions + tolerance."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from cdc_poc_spark.operators.temporal import asof_join
from cdc_poc_spark.tables import load_table

from .conftest import SF_DIR


def _frames(spark):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("ts_us"), "event_type"
    )
    purchases = ev.filter("event_type = 'purchase'").drop("event_type")
    views = ev.filter("event_type = 'view'").drop("event_type").withColumnRenamed(
        "event_id", "view_id"
    )
    return purchases, views


def _expected(purchases_pd, views_pd, direction, tolerance=None):
    out = pd.merge_asof(
        purchases_pd.sort_values("ts_us", kind="mergesort"),
        views_pd.sort_values("ts_us", kind="mergesort"),
        on="ts_us",
        by="user_id",
        direction=direction,
        tolerance=tolerance,
    )
    return {
        (r.event_id, r.view_id if pd.notna(r.view_id) else None)
        for r in out.itertuples()
    }


def _got(df):
    return {(r.event_id, r.r_view_id) for r in df.collect()}


def test_asof_backward_matches_pandas(spark):
    purchases, views = _frames(spark)
    got = _got(
        asof_join(purchases, views, ["user_id"], "ts_us", "ts_us", "backward")
    )
    exp = _expected(purchases.toPandas(), views.toPandas(), "backward")
    assert got == exp and len(got) > 0


def test_asof_forward_matches_pandas(spark):
    purchases, views = _frames(spark)
    got = _got(
        asof_join(purchases, views, ["user_id"], "ts_us", "ts_us", "forward")
    )
    exp = _expected(purchases.toPandas(), views.toPandas(), "forward")
    assert got == exp


def test_asof_tolerance(spark):
    purchases, views = _frames(spark)
    tol = 3_600_000_000  # 1 hour in micros
    got = _got(
        asof_join(
            purchases, views, ["user_id"], "ts_us", "ts_us", "backward", tolerance=tol
        )
    )
    exp = _expected(purchases.toPandas(), views.toPandas(), "backward", tolerance=tol)
    assert got == exp
    # tolerance must strictly shrink or keep the match set
    full = _got(asof_join(purchases, views, ["user_id"], "ts_us", "ts_us"))
    assert {p for p, v in got if v is not None} <= {
        p for p, v in full if v is not None
    }


def test_cusum_matches_naive_recurrence(spark):
    """cusum_changepoints' relational prefix-sum identity must equal
    the textbook recurrence S_t = max(0, S_{t-1} + d_t) computed in
    pure Python over randomized integer series — the property the
    oracle (same identity) cannot check."""
    import random

    from cdc_poc_spark.operators.temporal import cusum_changepoints

    rng = random.Random(11)
    rows, expect = [], {}
    for series in ("a", "b", "c"):
        n = rng.randint(5, 40)
        xs = [rng.randint(0, 50) for _ in range(n)]
        for i, x in enumerate(xs):
            rows.append((series, i * 1000, x))
        s_total = sum(xs)
        s_cur, peak, argmax = 0, 0, None
        for i, x in enumerate(xs):
            s_cur = max(0, s_cur + (n * x - s_total))  # n-scaled centering
            if s_cur > peak:
                peak, argmax = s_cur, i * 1000
        if argmax is None:  # all-zero CUSUM: earliest bucket wins the MIN
            argmax = 0
        expect[series] = (n, peak, argmax)
    b = spark.createDataFrame(rows, "event_type string, bucket_us long, x long")
    got = {
        r.event_type: (r.n_buckets, r.max_cusum_scaled, r.changepoint_bucket_us)
        for r in cusum_changepoints(b).collect()
    }
    assert got == expect


def test_ewma_matches_naive_recurrence(spark):
    """ewma_trailing's integer lag formulation must equal the explicit
    finite-window weighted mean sum(x_{t-i} 2^(7-i)) / sum(present
    weights) computed in pure Python."""
    import random

    from cdc_poc_spark.operators.temporal import ewma_trailing

    rng = random.Random(7)
    rows, expect = [], {}
    for series in ("s1", "s2"):
        n = rng.randint(3, 20)
        xs = [rng.randint(0, 100) for _ in range(n)]
        for i, x in enumerate(xs):
            rows.append((series, i * 1000, x))
        for t in range(n):
            num = den = 0
            for i in range(min(8, t + 1)):
                w = 1 << (7 - i)
                num += xs[t - i] * w
                den += w
            expect[(series, t * 1000)] = (num, den, round(num / den, 6))
    b = spark.createDataFrame(rows, "event_type string, bucket_us long, x long")
    got = {
        (r.event_type, r.bucket_us): (r.ewma_num, r.ewma_den, r.ewma8)
        for r in ewma_trailing(b).collect()
    }
    assert got == expect


def test_ks_statistic_bounds(spark):
    """agg_ks_two_sample's machinery on synthetic extremes: identical
    samples give D = 0; disjoint supports give D = 1. Checked through
    the operator-shaped computation on a temp fixture."""
    import duckdb

    from cdc_poc_spark.queries import all_specs

    spec = all_specs()["agg_ks_two_sample"]
    for mode, vals in (
        ("identical", [("BUILDING", v) for v in (1.0, 2.0, 3.0)]
         + [("MACHINERY", v) for v in (1.0, 2.0, 3.0)]),
        ("disjoint", [("BUILDING", v) for v in (1.0, 2.0)]
         + [("MACHINERY", v) for v in (10.0, 20.0)]),
    ):
        import tempfile

        d = tempfile.mkdtemp(prefix="ks_prop_")
        rows = [(i, f"c{i}", 0, bal, seg) for i, (seg, bal) in enumerate(vals)]
        spark.createDataFrame(
            rows,
            "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string",
        ).coalesce(1).write.parquet(d + "/customer.parquet")
        r = spec.fn(spark, d).collect()[0]
        if mode == "identical":
            assert r.ks_stat == 0.0
        else:
            assert r.ks_stat == 1.0


def test_local_clustering_matches_bruteforce(spark):
    """local_clustering (degree-ordered triangle enumeration) must
    match a pure-Python per-node triangle count on random graphs —
    independent of both the Spark formulation and the SQL oracle."""
    import itertools
    import random

    from cdc_poc_spark.operators.graph import local_clustering

    rng = random.Random(5)
    for trial in range(3):
        n = rng.randint(6, 14)
        edges = sorted(
            {tuple(sorted(rng.sample(range(n), 2))) for _ in range(rng.randint(n, 3 * n))}
        )
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        tri = {u: 0 for u in adj}
        for a, b, c in itertools.combinations(sorted(adj), 3):
            if b in adj[a] and c in adj[a] and c in adj[b]:
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
        df = spark.createDataFrame(edges, "u long, v long")
        got = {r.node: (r.deg, r.n_triangles, r.local_cc) for r in local_clustering(df).collect()}
        for u in adj:
            deg = len(adj[u])
            cc = round(2.0 * tri[u] / (deg * (deg - 1)), 6) if deg >= 2 else 0.0
            assert got[u] == (deg, tri[u], cc), (trial, u)
