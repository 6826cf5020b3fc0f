"""Kafka streaming source — the production ingest path.

Mirrors reference spark/scripts/consumer.py:43-49 (subscribePattern over
`cdc.commerce.*` from earliest) but parameterized. Requires the
spark-sql-kafka-0-10 package on the classpath; this container does not
ship it, so construction is gated with a clear error instead of a
deep ClassNotFoundException at start() time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_envelope_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe_pattern: str = "cdc.*",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """readStream from Kafka: yields (key, value: binary, topic,
    partition, offset, timestamp, ...) — feed to
    cdc.envelope.parse_envelope_raw / parse_envelope_typed."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribePattern", subscribe_pattern)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:  # pragma: no cover - classpath-dependent
        raise RuntimeError(
            "Kafka source unavailable: the spark-sql-kafka-0-10 package is "
            "not on the classpath. Add --packages org.apache.spark:"
            "spark-sql-kafka-0-10_2.13:<spark-version>, or use "
            "sources.files.envelope_json_stream for a file-backed stream."
        ) from exc


def kafka_batch_read(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe_pattern: str = "cdc.*",
) -> DataFrame:
    """Batch (bounded) read of a topic range — backfill/repair path."""
    try:
        return (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribePattern", subscribe_pattern)
            .option("startingOffsets", "earliest")
            .option("endingOffsets", "latest")
            .load()
        )
    except Exception as exc:  # pragma: no cover
        raise RuntimeError(
            "Kafka source unavailable (see kafka_envelope_stream)."
        ) from exc
