"""Spark 4 Python Data Source API connectors (SURVEY §2.B sources row —
engine surface the reference cannot express: its only source is the
Kafka connector jar).

Two sources:

- ``cdc_envelope_py`` — a BATCH reader over a directory of envelope
  JSONL files (the same layout ``sources/files.py:envelope_json_stream``
  streams), demonstrating the full custom-source contract: schema
  declaration, one InputPartition PER FILE (the planner parallelizes
  across files exactly like the built-in file source), and predicate
  PUSHDOWN into the Python reader (EqualTo on ``topic`` and >=/> on
  ``offset`` are absorbed at the source; everything else is returned to
  Spark to evaluate).

- ``synthetic_events_py`` — a STREAMING source (SimpleDataSourceStreamReader)
  generating a deterministic, offset-addressed event sequence: row i is
  a pure function of i (md5-derived), so ``readBetweenOffsets`` replays
  crash-recovered ranges bit-identically — the exactly-once contract a
  checkpointed stream needs, testable without a broker. This is the
  local stand-in for the gated Kafka path with REAL offset semantics
  rather than file-listing semantics.

Both sources are registered per-session via ``register_python_sources``.
At 100 TB the batch source's partition planning is what matters: one
partition per file keeps the scan embarrassingly parallel, and the
pushed topic filter drops rows before they cross the Python->JVM Arrow
boundary.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

ENVELOPE_DDL = "value STRING, topic STRING, offset LONG"


class _EnvelopeFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class EnvelopeJsonReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_envelope_py requires a 'path' option")
        self.topic_eq: str | None = None
        self.offset_min: int | None = None  # inclusive lower bound

    def pushFilters(self, filters):  # noqa: N802 - API name
        """Absorb topic equality and offset lower bounds; yield the rest
        back to Spark (the contract: yielded filters are re-applied by
        the engine, so absorbing too little is safe, absorbing wrongly
        is a correctness bug — keep it minimal and exact)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("topic",):
                self.topic_eq = f.value
            elif isinstance(f, GreaterThanOrEqual) and f.attribute == ("offset",):
                b = int(f.value)
                if self.offset_min is None or b > self.offset_min:
                    self.offset_min = b
            elif isinstance(f, GreaterThan) and f.attribute == ("offset",):
                b = int(f.value) + 1
                if self.offset_min is None or b > self.offset_min:
                    self.offset_min = b
            else:
                yield f

    def partitions(self):
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".json") or f.endswith(".jsonl")
        )
        return [_EnvelopeFilePartition(p) for p in files]

    def read(self, partition: _EnvelopeFilePartition):
        with open(partition.path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                topic = rec.get("topic")
                offset = rec.get("offset")
                if self.topic_eq is not None and topic != self.topic_eq:
                    continue
                if self.offset_min is not None and (
                    offset is None or int(offset) < self.offset_min
                ):
                    continue
                yield (rec.get("value"), topic, offset)


class EnvelopeJsonDataSource(DataSource):
    @classmethod
    def name(cls):
        return "cdc_envelope_py"

    def schema(self):
        return ENVELOPE_DDL

    def reader(self, schema: StructType):
        return EnvelopeJsonReader(schema, self.options)


SYNTHETIC_DDL = "event_id LONG, event_type STRING, value LONG"
_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def synthetic_event(i: int) -> tuple:
    """Row i as a pure function of i — the determinism the replay
    contract rests on (md5, no process state)."""
    h = int(hashlib.md5(f"ev:{i}".encode()).hexdigest()[:8], 16)
    return (i, _EVENT_TYPES[h % len(_EVENT_TYPES)], h % 1000)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.batch_size = int(options.get("batchsize", "50"))

    def initialOffset(self):  # noqa: N802 - API name
        return {"idx": 0}

    def read(self, start: dict):
        i0 = int(start["idx"])
        rows = [synthetic_event(i) for i in range(i0, i0 + self.batch_size)]
        return (rows, {"idx": i0 + self.batch_size})

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        return [synthetic_event(i) for i in range(int(start["idx"]), int(end["idx"]))]

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: rows are derived, not buffered


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events_py"

    def schema(self):
        return SYNTHETIC_DDL

    def simpleStreamReader(self, schema: StructType):  # noqa: N802
        return SyntheticEventsStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Register both Python data sources on the session (idempotent)."""
    spark.dataSource.register(EnvelopeJsonDataSource)
    spark.dataSource.register(SyntheticEventsDataSource)
