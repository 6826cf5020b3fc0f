"""Continuous aggregate maintenance (incremental view maintenance) for
a CDC event stream: keep `SUM(value) BY segment` current by applying
each micro-batch's DELTAS, never rescanning the full history.

The reference defers aggregate freshness to whatever SQL its Iceberg
sink's consumers run (full recompute per query); here the aggregate is
a first-class maintained table. Per micro-batch the cost is
O(batch + touched keys): the only full-table artifacts are the per-key
current-value state (same asymptotics as the CDC mirror itself) and a
|groups|-row totals table.

Batch math (the telescoping identity verified cross-engine by the
`cdc_incremental_agg` oracle query): for each key, the batch's net
effect is `new_live_value - previous_live_value`, where a tombstone
makes the new live value 0. Summing net effects per group advances the
group total to exactly what a naive recompute over all history gives.

Exactly-once: each applied epoch id is recorded next to the state; a
replayed epoch (availableNow restart after a crash between the state
write and the checkpoint commit) is skipped, making the non-idempotent
"add deltas" update idempotent per epoch.

Known tradeoff: tombstones evict the key row entirely, so an event
arriving LATER but timestamped BEFORE the tombstone resurrects the key
(no seq to compare against). The fix at scale is tombstone retention
with TTL (keep the tombstoned row, null value, for the late-data
horizon) — same policy Kafka compaction and Cassandra use.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

VAL_DEC = "decimal(12,2)"
TOMBSTONE = "error"


class ContinuousAggregate:
    """Maintains per-key live values + per-group totals from CDC batches.

    Wire `apply_batch` into `writeStream.foreachBatch`, or drive it
    directly for batch backfills. `dim_df` maps keys to groups
    (broadcast per batch — the slowly-changing-dimension enrichment)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        dim_df: DataFrame,
        key_col: str = "user_id",
        dim_key: str = "c_custkey",
        group_col: str = "c_mktsegment",
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.dim_df = dim_df
        self.key_col = key_col
        self.dim_key = dim_key
        self.group_col = group_col
        os.makedirs(state_dir, exist_ok=True)

    # -- state paths --------------------------------------------------

    @property
    def _keys_path(self) -> str:
        return os.path.join(self.state_dir, "key_state")

    @property
    def _totals_path(self) -> str:
        return os.path.join(self.state_dir, "totals")

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.state_dir, "meta.json")

    def _applied(self, epoch_id: int) -> bool:
        if not os.path.exists(self._meta_path):
            return False
        return epoch_id in json.load(open(self._meta_path))["epochs"]

    def _mark(self, epoch_id: int) -> None:
        epochs = []
        if os.path.exists(self._meta_path):
            epochs = json.load(open(self._meta_path))["epochs"]
        json.dump({"epochs": epochs + [epoch_id]}, open(self._meta_path, "w"))

    # -- the per-batch update -----------------------------------------

    def apply_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """Advance key state and group totals by one micro-batch."""
        if self._applied(epoch_id):
            return  # replay after crash: state already reflects this epoch

        k = self.key_col
        # 1. net effect per key: the LAST event in the batch wins
        #    (one window shuffle keyed by the key — batch-sized, not state-sized)
        w = W.partitionBy(k).orderBy(
            F.expr("ts DIV 1000").desc(), F.col("event_id").desc()
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1")
            .select(
                k,
                F.when(F.col("event_type") == TOMBSTONE, F.lit(None))
                .otherwise(F.col("value").cast(VAL_DEC))
                .alias("new_live"),
                F.expr("ts DIV 1000").alias("seq"),
            )
        )

        # 2. delta vs previous live value. Late-data guard: a batch
        #    winner OLDER than the stored state (seq < prev_seq) must
        #    not move the aggregate — last-writer-wins applies to the
        #    view exactly as it does to the mirror.
        zero = F.lit(0).cast(VAL_DEC)
        if os.path.exists(self._keys_path):
            prev = self.spark.read.parquet(self._keys_path).select(
                k,
                F.col("live_value").alias("prev_live"),
                F.col("seq").alias("prev_seq"),
            )
            joined = latest.join(prev, k, "left").filter(
                F.col("prev_seq").isNull() | (F.col("seq") >= F.col("prev_seq"))
            )
        else:
            joined = latest.withColumn("prev_live", F.lit(None).cast(VAL_DEC))
        deltas = joined.select(
            k,
            "new_live",
            "seq",
            (F.coalesce("new_live", zero) - F.coalesce("prev_live", zero)).alias(
                "delta"
            ),
        )
        deltas.persist()
        try:
            # 3. advance group totals (tiny table: |groups| rows)
            d = F.broadcast(
                self.dim_df.select(
                    F.col(self.dim_key).alias(k), F.col(self.group_col)
                )
            )
            batch_totals = (
                deltas.join(d, k)
                .groupBy(self.group_col)
                .agg(F.sum("delta").alias("delta"))
            )
            if os.path.exists(self._totals_path):
                old = self.spark.read.parquet(self._totals_path)
                merged = (
                    old.join(batch_totals, self.group_col, "full")
                    .select(
                        self.group_col,
                        (
                            F.coalesce("total_value", zero)
                            + F.coalesce("delta", zero)
                        ).alias("total_value"),
                    )
                )
            else:
                merged = batch_totals.withColumnRenamed("delta", "total_value")
            self._swap(merged, self._totals_path)

            # 4. advance key state (upsert new lives, drop tombstoned keys)
            live = deltas.select(
                k, F.col("new_live").alias("live_value"), "seq"
            )
            if os.path.exists(self._keys_path):
                state = self.spark.read.parquet(self._keys_path)
                all_rows = state.unionByName(live)
            else:
                all_rows = live
            ws = W.partitionBy(k).orderBy(F.col("seq").desc())
            new_state = (
                all_rows.withColumn("__rn", F.row_number().over(ws))
                .filter("__rn = 1")
                .filter(F.col("live_value").isNotNull())  # tombstone eviction
                .drop("__rn")
            )
            self._swap(new_state, self._keys_path)
            self._mark(epoch_id)
        finally:
            deltas.unpersist()

    def totals(self) -> DataFrame:
        return self.spark.read.parquet(self._totals_path)

    def _swap(self, df: DataFrame, path: str) -> None:
        """Write-aside + rename (the plan reads the files it replaces)."""
        tmp = path.rstrip("/") + ".__tmp__"
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
