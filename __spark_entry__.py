"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Implementation lives in the ``cdc_poc_spark`` package; this
module only adapts the registry to the driver's three-function contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_poc_spark.queries import all_specs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC current-state materialization (changelog -> window
    dedup -> tombstone filter -> broadcast dim join -> aggregate) on
    sf0.001 — the semantics the reference defers at consumer.py:76."""
    spec = all_specs()["cdc_current_state_by_segment"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query; rows-only
    operators (LSH/SimHash/ANN/stateful streaming) are omitted."""
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle
    }
