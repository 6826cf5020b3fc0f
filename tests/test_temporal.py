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
