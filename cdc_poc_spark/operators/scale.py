"""Scale toolkit: the join strategies that keep 100 TB shuffles healthy
(SURVEY §4 rows "join reordering / strategies", "shuffle parallelism").

Three tiers, in the order a plan should try them:

1. broadcast     — small side under the threshold: no shuffle at all
                   (`F.broadcast`, used throughout queries/).
2. AQE skew-join — runtime split of oversized partitions; enabled
                   globally in session.RUNTIME_CONFS. Handles skew
                   DISCOVERED at runtime.
3. salted join   — for skew KNOWN ahead of time (a hot key carrying a
                   double-digit percent of rows): explicit key salting
                   splits each hot key into `salt` sub-keys so no single
                   task owns a whole hot key. Costs a `salt`-fold
                   replication of the other side — use for truly hot
                   keys, not as a default.

Plus `write_bucketed` / co-located reads: pre-shuffling both sides of a
repeated join into the same bucketing lets every subsequent join run
with ZERO exchanges (bucket-local sort-merge) — the batch analogue of
partitioned stream-stream joins, and the right layout for a fact table
joined on the same key by many queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join on `on` with the LEFT side's key salted and the RIGHT
    side replicated `salt` times.

    left gets a deterministic per-row salt (hash of the whole row — no
    rand(), so retries/speculative tasks agree); right is exploded once
    per salt value. The join key becomes (on, salt): a key holding p% of
    all rows now spreads over `salt` tasks. Semantics are identical to
    `left.join(right, on, how)` for inner/left joins when `right` is
    unique per key (the dimension-table case)."""
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l_salted = left.withColumn("__salt", salt_col)
    r_replicated = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l_salted.join(r_replicated, [on, "__salt"], how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Reads of two tables bucketed the same way join bucket-to-bucket with
    no Exchange (verify with .explain: SortMergeJoin over FileScans,
    'SelectedBucketsCount' present, no Exchange above the scans)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def cluster_by_key(
    df: DataFrame, key_cols: list[str], n_partitions: int | None = None
) -> DataFrame:
    """Repartition by key so a downstream groupBy/join on the same key
    reuses the exchange (Catalyst's ReuseExchange / output-partitioning
    matching) instead of shuffling twice."""
    cols = [F.col(c) for c in key_cols]
    return df.repartition(n_partitions, *cols) if n_partitions else df.repartition(*cols)
