"""Pipeline observability: `Dataset.observe` metrics + a
StreamingQueryListener that collects them per micro-batch.

The reference's only runtime visibility is two console debug sinks
(consumer.py:61-62) — fine for a laptop, useless on a cluster where
stdout dies with the executor. The production pattern (public Spark
API, Spark 3.0+) is:

- `observe(name, exprs...)`: named aggregate metrics evaluated INLINE
  on the streaming (or batch) plan — zero extra scan, zero extra
  shuffle; partial aggregation rides the existing exchange.
- `StreamingQueryListener.onProgress`: every micro-batch reports the
  observed values + engine counters (input rate, processing rate,
  state-store memory, watermark lag) to a driver-side callback that
  can be shipped to any metrics backend.

At 100 TB this is the difference between "the stream is slow" and
"batch 17's DLQ ratio spiked to 40% and the watermark is 2 h behind":
the metrics are computed where the data already is.

CDC-shaped canned metrics: rows, ops by type, dead-letter count, and
max seq (progress high-water mark) — the four numbers a mirror
operator pages on.
"""

from __future__ import annotations

import threading
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

__all__ = ["observe_cdc_metrics", "CollectingListener", "observe_batch"]


def observe_cdc_metrics(parsed: DataFrame, name: str = "cdc_metrics") -> DataFrame:
    """Attach CDC progress metrics to a parsed-envelope stream (columns
    `op`, `seq`, and optionally `dead_letter`). Metrics are aggregated
    inline per micro-batch and surface in every
    StreamingQueryProgress.observedMetrics[name]."""
    has_dlq = "dead_letter" in parsed.columns
    dlq = (
        F.sum(F.col("dead_letter").cast("long"))
        if has_dlq
        else F.lit(0).cast("long")
    )
    return parsed.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("op") == "d").cast("long")).alias("n_deletes"),
        F.sum((F.col("op").isin("r", "c")).cast("long")).alias("n_inserts"),
        F.sum((F.col("op") == "u").cast("long")).alias("n_updates"),
        dlq.alias("n_dead_letters"),
        F.max("seq").alias("max_seq"),
    )


def observe_batch(df: DataFrame, name: str, *exprs) -> tuple:
    """Batch-side counterpart: run `df` to completion AND return its
    observed metrics without a second scan — `Observation` collects the
    inline aggregates from the same job that produced the output.
    Returns (materialized row count, metrics dict)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    out = df.observe(obs, *exprs)
    n = out.count()
    return n, obs.get


class CollectingListener(StreamingQueryListener):
    """Driver-side metrics collector: keeps every micro-batch's
    observed metrics and engine counters in memory (swap the append
    for a push to your metrics backend in production). Thread-safe;
    `progress` rows arrive on Spark's listener bus thread."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.progress: list[dict] = []
        self.terminated: Optional[str] = None

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        row = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "observed": {
                k: (v.asDict() if hasattr(v, "asDict") else dict(v))
                for k, v in p.observedMetrics.items()
            },
        }
        with self._lock:
            self.progress.append(row)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.terminated = str(event.id)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- conveniences ------------------------------------------------------
    def metric_totals(self, name: str) -> dict:
        """Sum each observed metric named `name` across batches (max for
        the high-water mark `max_seq`)."""
        totals: dict = {}
        with self._lock:
            rows = [p["observed"][name] for p in self.progress if name in p["observed"]]
        for m in rows:
            for k, v in m.items():
                if v is None:
                    continue
                if k == "max_seq":
                    totals[k] = max(totals.get(k, v), v)
                else:
                    totals[k] = totals.get(k, 0) + v
        return totals
