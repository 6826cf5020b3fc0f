"""cdc_poc_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference CDC pipeline (thanminh24/CDC_POC): Debezium-style change-data
capture ingestion (envelope parse -> CDC log -> current-state mirror),
a full relational/analytic query surface, Structured Streaming ingestion,
and large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Everything is declared through the DataFrame/SQL API so Catalyst +
Tungsten pick the physical strategy; Python UDFs appear only where
built-ins genuinely cannot express the semantics (and then always as
Arrow-batched pandas UDFs / mapInPandas).
"""

__version__ = "0.1.0"
