"""Batch sinks: every at-rest format the engine writes, with the layout
decisions that matter at 100 TB made explicit.

The reference lands data exclusively as Iceberg-over-Parquet
(consumer.py:76-78; connect-iceberg-sink.json:23) and taps raw JSON to a
text file (connect-file-sink.properties:16-20). This module covers that
surface without the Iceberg runtime (not in this container): plain
columnar formats + hive-style partitioned layout, which is what Iceberg
writes underneath anyway.

Layout rules encoded here:
- Partition columns must be LOW cardinality (date, region, source) —
  hive partitioning creates one directory per value; a high-cardinality
  partition column is the classic small-files catastrophe.
- ``maxRecordsPerFile`` bounds file size without an extra repartition
  job; repartition(partition_cols) before a partitioned write puts each
  partition's rows in one task → one file per partition instead of
  (tasks × partitions).
- Readers prune: a filter on a partition column never touches excluded
  directories (PartitionFilters in .explain), independent of row-group
  statistics pushdown (PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import configure_session

__all__ = [
    "write_parquet_partitioned",
    "write_orc",
    "read_orc",
    "write_csv",
    "write_json",
]


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int = 5_000_000,
    one_file_per_partition: bool = True,
) -> None:
    """Hive-partitioned parquet write. With ``one_file_per_partition``
    the frame is shuffled on the partition columns first so each output
    directory holds one file (plus size-based splits) — the layout a
    downstream 1000-executor scan wants."""
    if one_file_per_partition and partition_cols:
        df = df.repartition(*partition_cols)
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (built-in columnar alternative; same pushdown story as
    parquet — predicate + column pruning via stripe statistics)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    configure_session(spark)
    return spark.read.orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """CSV sink — interchange only. Row-oriented, no pushdown, no types:
    never the at-rest format for the lakehouse path."""
    df.write.mode(mode).option("header", header).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the engine twin of the reference's raw file
    debug tap (connect-file-sink.properties:16-20)."""
    df.write.mode(mode).json(path)
