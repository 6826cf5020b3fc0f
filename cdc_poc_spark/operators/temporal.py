"""Temporal join operators: generic as-of join (pandas merge_asof at
Spark scale).

The scale-correct formulation is union+window, not a range join: tag
both sides, interleave on (key, time), and carry the most recent right
payload forward with last(ignorenulls) over an ordered window. Cost is
ONE shuffle on the key + a partition-local sort — no time-band row
explosion, no per-row subquery. This is the CDC snapshot-at-time
primitive (SURVEY §2.B joins row) generalized to two tables; the
single-table specialization is queries/joins.py:join_asof_purchase_to_view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: int | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    largest right_ts <= left_ts (direction='backward') or smallest
    right_ts >= left_ts ('forward') within the same key group.

    Ties (right_ts == left_ts) match, like pandas merge_asof
    (allow_exact_matches=True). `tolerance` (same unit as the ts
    columns) drops matches farther than the bound. Right payload
    columns come back prefixed; unmatched left rows keep nulls.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    payload_cols = [c for c in right.columns if c not in keys]
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*payload_cols).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*payload_cols).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # at equal ts the right row must be visible to the left row: right
    # (__is_left=0) sorts first ascending / last descending
    if direction == "backward":
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    else:
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    matched = (
        unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .withColumn(
            "__match_ts", F.last(F.when(F.col("__is_left") == 0, F.col("__ts")), ignorenulls=True).over(w)
        )
        .filter(F.col("__is_left") == 1)
    )
    if tolerance is not None:
        gap = (
            F.col("__ts") - F.col("__match_ts")
            if direction == "backward"
            else F.col("__match_ts") - F.col("__ts")
        )
        keep = F.col("__match_ts").isNotNull() & (gap <= tolerance)
        matched = matched.withColumn(
            "__match", F.when(keep, F.col("__match"))
        ).withColumn("__match_ts", F.when(keep, F.col("__match_ts")))
    out_left = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_right = [
        F.col(f"__match.{c}").alias(f"{right_prefix}{c}") for c in payload_cols
    ]
    return matched.select(*out_left, *out_right)


def anomaly_zscore_flags(
    buckets: DataFrame,
    series_col: str = "event_type",
    bucket_col: str = "bucket_us",
    n_col: str = "n_events",
    sigma: float = 2.0,
) -> DataFrame:
    """Flag buckets whose count sits >= sigma standard deviations from
    the series mean, given a (series, bucket, count) relation — the
    derivation half of tw_anomaly_zscore, shared verbatim by the batch
    query and the streaming maintainer (streaming/windows.py:
    derive_bucket_anomalies) so both paths flag IDENTICAL buckets by
    construction.

    Exactness: per-series moments are exact integer sums (DECIMAL(38)
    s1/s2 — no float accumulation across rows); mean/variance/z are the
    same IEEE double expressions on identical integers in any engine.
    A CONSTANT series (variance 0 — or microscopically negative from
    float rounding) is an explicit no-flag path (``var > 0`` guard,
    ADVICE r5), not NaN fallout: NaN ordering differs across engines
    (DuckDB sorts NaN above everything, so ``abs(NaN) >= sigma`` FLAGS
    there while Spark drops it). Plan: one map-side-combinable moments
    agg over the (small) bucket relation + one broadcast join back."""
    s = buckets.groupBy(series_col).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(n_col).cast("decimal(38,0)").alias("s1"),
        F.sum(F.col(n_col) * F.col(n_col)).cast("decimal(38,0)").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_buckets")
    var = F.col("s2").cast("double") / F.col("n_buckets") - mean * mean
    z = F.when(var > 0, (F.col(n_col).cast("double") - mean) / F.sqrt(var))
    return (
        buckets.join(F.broadcast(s), series_col)
        .filter(F.abs(z) >= sigma)
        .select(series_col, bucket_col, n_col, F.round(z, 4).alias("zscore"))
    )


# -- watermark-delay recommendation (shared by the batch query
#    queries/profiling.py:cdc_watermark_recommendation and the streaming
#    maintainer streaming/windows.py:streaming_watermark_recommendation,
#    so both paths derive IDENTICAL recommendations by construction).

#: arrival-order micro-batch size (arrival key DIV batch = batch id)
WM_BATCH = 1000
#: lateness quantization: milliseconds per second bucket
WM_MS = 1000
#: deterministic md5 jitter displacing the fixture's perfectly-sorted
#: event_id order into a realistic arrival sequence (same expression as
#: the DuckDB oracle's _JITTER_SQL in queries/profiling.py)
JITTER_SPARK = (
    "event_id + CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 4), 16, 10)"
    " AS BIGINT) % 64"
)


def lateness_histogram(events: DataFrame, hwm: DataFrame) -> DataFrame:
    """Per-(series, quantized-second) lateness counts given events with
    (event_type, ts_us, bkt) and a per-bucket high-water-mark relation
    (bkt, hwm_prev). One broadcast join (|batches| rows) + one keyed
    count — the |events|-sized relation is touched exactly once."""
    lat = events.join(F.broadcast(hwm), "bkt").select(
        "event_type",
        F.expr(
            f"greatest(0L, coalesce(hwm_prev, 0L) - ts_us) DIV 1000 DIV {WM_MS}"
        ).alias("lat_q"),
    )
    return lat.groupBy("event_type", "lat_q").agg(F.count(F.lit(1)).alias("c"))


def lateness_percentile_rollup(hist: DataFrame) -> DataFrame:
    """Exact histogram percentiles over (event_type, lat_q, c): the
    smallest second-bucket whose cumulative count clears q·n — integer
    predicates, no interpolation for engines to disagree on. p99_s IS
    the `withWatermark` delay to configure; max_s the drop bound. The
    windows run over the tiny per-(series, second) histogram, never the
    event history."""
    wcum = W.partitionBy("event_type").orderBy("lat_q").rowsBetween(
        W.unboundedPreceding, 0
    )
    wall = W.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "lat_q",
        F.sum("c").over(wcum).alias("cc"),
        F.sum("c").over(wall).alias("n"),
    )
    return cum.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        F.min(F.when(F.col("cc") * 2 >= F.col("n"), F.col("lat_q"))).alias("p50_s"),
        F.min(F.when(F.col("cc") * 20 >= F.col("n") * 19, F.col("lat_q"))).alias(
            "p95_s"
        ),
        F.min(F.when(F.col("cc") * 100 >= F.col("n") * 99, F.col("lat_q"))).alias(
            "p99_s"
        ),
        F.max("lat_q").alias("max_s"),
    )


def ewma_trailing(buckets: DataFrame) -> DataFrame:
    """Trailing 8-bucket alpha=1/2 EWMA over a (event_type, bucket_us,
    x) relation — shared verbatim by the batch query tw_ewma_trailing
    and the streaming derivation (streaming/windows.py:
    derive_bucket_ewma), so both paths smooth IDENTICAL values by
    construction. Exact: power-of-two weights keep numerator and
    denominator INTEGER window expressions; one final division."""
    w = W.partitionBy("event_type").orderBy("bucket_us")
    lags = {i: F.lag("x", i).over(w) for i in range(1, 8)}
    num = F.col("x") * 128
    den = F.lit(128)
    for i, c in lags.items():
        wgt = 1 << (7 - i)
        num = num + F.coalesce(c, F.lit(0)) * wgt
        den = den + F.when(c.isNull(), 0).otherwise(wgt)
    return buckets.select(
        "event_type",
        "bucket_us",
        F.col("x").alias("n_events"),
        num.cast("long").alias("ewma_num"),
        den.cast("long").alias("ewma_den"),
        F.round(num.cast("double") / den, 6).alias("ewma8"),
    )


def cusum_changepoints(buckets: DataFrame) -> DataFrame:
    """One-sided CUSUM peak + change point over a (event_type,
    bucket_us, x) relation — shared verbatim by the batch query
    tw_cusum_changepoint and the streaming derivation
    (streaming/windows.py:derive_bucket_cusum). Prefix-sum identity
    S_t = P_t - min(0, min_{j<=t} P_j) with n-scaled mean centering —
    every intermediate an exact BIGINT."""
    tot = buckets.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nb"), F.sum("x").alias("s")
    )
    wc = W.partitionBy("event_type").orderBy("bucket_us").rowsBetween(
        W.unboundedPreceding, 0
    )
    p = buckets.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "bucket_us",
        "nb",
        F.sum(F.col("nb") * F.col("x") - F.col("s")).over(wc).alias("pre"),
    )
    c = p.select(
        "event_type",
        "bucket_us",
        "nb",
        (F.col("pre") - F.least(F.lit(0), F.min("pre").over(wc))).alias("cusum"),
    )
    mc = c.groupBy("event_type").agg(F.max("cusum").alias("m"))
    return (
        c.join(F.broadcast(mc), "event_type")
        .groupBy("event_type", "nb")
        .agg(
            F.max("cusum").alias("max_cusum_scaled"),
            F.min(F.when(F.col("cusum") == F.col("m"), F.col("bucket_us"))).alias(
                "changepoint_bucket_us"
            ),
        )
        .select(
            "event_type",
            F.col("nb").alias("n_buckets"),
            "max_cusum_scaled",
            "changepoint_bucket_us",
        )
    )


def ooo_profile_from_counts(counts: DataFrame) -> DataFrame:
    """Shared final projection of the out-of-order arrival profile:
    (event_type, n_events, n_out_of_order) -> + ooo_share. Used
    verbatim by the batch query (queries/profiling.py:
    cdc_out_of_order_profile) and the streaming derivation
    (streaming/windows.py:derive_out_of_order_profile), so both paths
    compute the share with the SAME expression by construction — the
    ewma_trailing / lateness_percentile_rollup sharing rule."""
    return counts.select(
        "event_type",
        "n_events",
        "n_out_of_order",
        F.round(
            F.col("n_out_of_order").cast("double") / F.col("n_events"), 6
        ).alias("ooo_share"),
    )
