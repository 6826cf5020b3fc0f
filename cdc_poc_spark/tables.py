"""Fixture-table access + column typing conventions.

All analytic queries load the driver-generated parquet tables
(TESTDATA.md). Loading goes through :func:`load_table` so every caller
gets the session confs needed for these files (nanos timestamps) and so
the parquet scans stay eligible for Catalyst pushdown (no caching, no
driver-side materialization).

Decimal casting conventions: the synthetic money/ratio columns are
2-decimal fixed values stored as doubles. Aggregating doubles is
order-dependent (non-deterministic under shuffle), so every SUM/AVG in
the query surface casts to an exact DECIMAL first and casts the final
aggregate back to DOUBLE. This is both the correctness fix for the
DuckDB-oracle hash comparison and what a production engine should do
with money columns at 100 TB (exact arithmetic, no fp drift).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Decimal widths per column family — tight enough that three-way products
# stay under DECIMAL(38) in both Spark and DuckDB, wide enough for sf>=1.
MONEY = "decimal(15,2)"  # l_extendedprice, o_totalprice
RATE = "decimal(4,2)"  # l_discount, l_tax (0.00-0.99)
QTY = "decimal(8,1)"  # l_quantity
BAL = "decimal(12,2)"  # c_acctbal, s_acctbal, p_retailprice
VAL = "decimal(12,2)"  # events.value


def dec(col: str, typ: str = MONEY) -> F.Column:
    return F.col(col).cast(typ)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain parquet scan — filters/projections
    composed on top of this push down into the scan (PushedFilters /
    ReadSchema visible in .explain).

    Schema normalization: the engine's changelog contract is ``events.ts``
    = int64 epoch-NANOS (the reference keeps Debezium micros-longs,
    SURVEY §1.2; nanos here, always 1000-divisible). Fixture generations
    have stored it both as TIMESTAMP(NANOS) parquet (read as long via
    ``nanosAsLong``) and as TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ) —
    normalize the latter back to the long contract at the scan so every
    downstream query/oracle sees one type. unix_micros is exact integer
    math; the cast to TIMESTAMP is UTC (session tz), matching how the
    DuckDB oracle treats the naive timestamps."""
    configure_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts", "").startswith("timestamp"):
        df = df.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        )
    return df


def events_with_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events stream table with typed event-time.

    ``ts`` arrives as int64 epoch-nanos (see session.RUNTIME_CONFS);
    expose both the raw long (the reference keeps Debezium micros-longs,
    SURVEY §1.2) and a proper timestamp truncated to micros. Integer DIV,
    not fp division — nanos exceed 2^53.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts_us", F.expr("ts DIV 1000")).withColumn(
        "etime", F.timestamp_micros(F.expr("ts DIV 1000"))
    )


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each fixture as a temp view for the SQL entry points."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
