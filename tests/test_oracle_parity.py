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


def test_round7_front_names_all_registered():
    """Every name in the window lists must exist in the registry (the
    window builder silently drops unknown names — a typo would shrink
    the driver's 50-query window), the round-7 window (_ROUND7_NEW then
    _ROUND7B_NEW) must lead the iteration order, and it must fit inside
    the 50-wide driver window. _ROUND7B_NEW may legitimately re-front a
    name from an earlier list (oracle changed after its last driver
    row), so order-dedup keeps FIRST occurrence — the semantics of the
    front-dict builder."""
    from cdc_poc_spark.queries import (
        _ROUND4_FRONT,
        _ROUND5_FRONT,
        _ROUND5_NEW,
        _ROUND6_NEW,
        _ROUND6B_NEW,
        _ROUND7_NEW,
        _ROUND7B_NEW,
        all_specs,
    )

    specs = all_specs()
    order = (
        _ROUND7_NEW + _ROUND7B_NEW
        + _ROUND6_NEW + _ROUND6B_NEW
        + _ROUND5_FRONT + _ROUND5_NEW + _ROUND4_FRONT
    )
    missing = [n for n in order if n not in specs]
    assert not missing, f"front names not registered: {missing}"
    deduped = list(dict.fromkeys(order))
    assert list(specs)[: len(deduped)] == deduped
    window = _ROUND7_NEW + _ROUND7B_NEW
    assert len(set(window)) == len(window), "duplicates inside the r7 window"
    assert len(window) <= 50, (
        "round-7 window overflows the driver's 50-query check"
    )
