"""Property-based tests (hypothesis): for ANY changelog, the engine's
window-dedup current state must equal a naive sequential replay, and
incremental merge (any batch split + replays) must equal one-shot apply.

This is the deterministic upgrade of the reference's randomized-but-
unchecked e2e inserts (reference test_cdc.py:86-94 generates random rows
and then asks a human to eyeball the output; here the model IS the
check). Spark round-trips are expensive, so examples are capped and the
generated logs are small — breadth comes from hypothesis shrinking over
op interleavings, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from cdc_poc_spark.cdc.apply import apply_changes, merge_upsert

LOG_SCHEMA = T.StructType(
    [
        T.StructField("pk", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("val", T.StringType()),
    ]
)

# A changelog: per-event (key in a tiny domain, op, payload). seq is the
# global arrival index — unique and monotonic, like a Kafka offset.
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.sampled_from(["r", "c", "u", "d"]),
        st.text(alphabet="abcxyz", min_size=0, max_size=4),
    ),
    min_size=0,
    max_size=30,
)


def _naive_replay(events):
    """The executable spec: apply ops one at a time in seq order."""
    state: dict[int, tuple[int, str]] = {}
    for seq, (pk, op, val) in enumerate(events):
        if op == "d":
            state.pop(pk, None)
        else:
            state[pk] = (seq, val)
    return {pk: (seq, val) for pk, (seq, val) in state.items()}


def _rows(events):
    return [(pk, seq, op, val) for seq, (pk, op, val) in enumerate(events)]


def _state_of(df):
    return {r.pk: (r.seq, r.val) for r in df.collect()}


@settings(
    max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(events=events_strategy)
def test_apply_changes_equals_naive_replay(spark, events):
    log = spark.createDataFrame(_rows(events), LOG_SCHEMA)
    got = _state_of(apply_changes(log, ["pk"]))
    assert got == _naive_replay(events)


@settings(
    max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(events=events_strategy, cut=st.integers(min_value=0, max_value=30))
def test_incremental_merge_equals_oneshot(spark, events, cut):
    """Splitting the log at any point and merging the tail into the
    head's state — WITH the tail replayed twice (foreachBatch
    re-delivery) — matches applying the whole log at once."""
    cut = min(cut, len(events))
    rows = _rows(events)
    head, tail = rows[:cut], rows[cut:]
    state = None
    if head:
        state = apply_changes(spark.createDataFrame(head, LOG_SCHEMA), ["pk"])
    batch = spark.createDataFrame(tail or [], LOG_SCHEMA)
    once = merge_upsert(state, batch, ["pk"])
    twice = merge_upsert(once, batch, ["pk"])  # idempotent re-delivery
    assert _state_of(twice) == _naive_replay(events)
