"""Source connectors: Kafka (production), file streams (tests/local),
batch parquet/JDBC snapshot. The engine's source contract is simply "a
(streaming) DataFrame of envelope records with (value, topic[, offset])"
— Kafka provides it in production, file/memory streams in tests (SURVEY
§2.A O17: the snapshot+stream contract, reproduced without Debezium)."""
