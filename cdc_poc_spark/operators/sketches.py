"""Distributed frequency sketches with exact verification.

The reference ships no sketch/summary operators (its surface is the
84-line CDC consumer); these are engine capability added per the north
star — the streaming/OLAP summary structures a 100 TB corpus profile
needs, formulated Spark-first: candidate generation stays map-side and
partition-local, verification is an exact keyed aggregation over the
candidate set only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def heavy_hitters(items: DataFrame, col: str, k: int) -> DataFrame:
    """EXACT phi-heavy hitters: every value of ``col`` whose frequency
    exceeds N/(k+1), with its exact count — the Misra-Gries guarantee
    made exact by a two-phase plan:

    1. **Local candidates** (one shuffle on (partition, value), map-side
       combinable): per input partition, keep values that are locally
       heavy — local_count > partition_rows/(k+1). By pigeonhole any
       globally heavy value is locally heavy in at least one partition
       (if freq(x) > N/(k+1) summed over partitions, some partition has
       freq_p(x) > n_p/(k+1)), so the candidate set is a SUPERSET of
       the true heavy hitters for ANY physical partitioning — the
       output is partitioning-independent and deterministic.
    2. **Exact verify** (one semi-join + one keyed count over candidate
       rows only): recount candidates globally, keep those above the
       global threshold.

    At 100 TB the candidate relation is at most k values per partition
    (bounded, broadcastable for realistic k); the full data is scanned
    twice — the candidate pass and the verify pass; N comes from the
    candidate pass's own aggregate, not a third scan (r5 review) — and
    shuffled only by candidate membership, never a global groupBy over
    all distinct values. The per-partition count relation is persisted
    (memory+disk) because it feeds both N and the candidate filter.
    Returns (value-column, n BIGINT), exact, so an ANSI GROUP BY/HAVING
    oracle hash-matches it."""
    from pyspark.storagelevel import StorageLevel

    per_part = (
        items.select(F.spark_partition_id().alias("__p"), F.col(col))
        .groupBy("__p", col)
        .agg(F.count(F.lit(1)).alias("c_local"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_total = per_part.agg(F.sum("c_local")).collect()[0][0] or 0
    part_rows = W.partitionBy("__p")
    candidates = (
        per_part.withColumn("n_part", F.sum("c_local").over(part_rows))
        .filter(F.col("c_local") * (k + 1) > F.col("n_part"))
        .select(col)
        .distinct()
    )
    return (
        items.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * (k + 1) > F.lit(n_total))
    )
