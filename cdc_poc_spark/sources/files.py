"""File-based sources: batch readers for every format the engine
supports, plus file *streams* that stand in for Kafka in tests —
deterministic (processAllAvailable/availableNow) instead of the
reference's sleep-and-poll e2e (reference test_cdc.py:119-122).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..session import configure_session

#: schema of a file-backed envelope record (matches what
#: cdc.envelope.parse_envelope_* expect from a Kafka record)
ENVELOPE_FILE_SCHEMA = T.StructType(
    [
        T.StructField("value", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("offset", T.LongType()),
    ]
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    configure_session(spark)
    return spark.read.parquet(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema always explicit — inference is a second full scan at 100 TB."""
    return spark.read.schema(schema).json(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType, header: bool = True) -> DataFrame:
    return spark.read.schema(schema).csv(path, header=header)


def read_jdbc_snapshot(
    spark: SparkSession, url: str, table: str, partition_column: str | None = None,
    num_partitions: int = 8, lower_bound=None, upper_bound=None, **options
) -> DataFrame:
    """JDBC initial-snapshot read — the batch twin of Debezium's snapshot
    phase (op='r' records, reference connect-postgres-source.json:4).
    Partitioned pull when a numeric key is available (never single-task
    at scale)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def envelope_json_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming source of envelope records from a directory of JSON
    files — the test/local stand-in for the Kafka source (same columns:
    value, topic, offset). ``max_files_per_trigger`` throttles each
    micro-batch (honored by availableNow), the way tests force a
    multi-epoch run from a static directory."""
    reader = spark.readStream.schema(ENVELOPE_FILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def parquet_stream(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Streaming parquet source (schema mandatory for streams)."""
    configure_session(spark)
    return spark.readStream.schema(schema).parquet(path)
