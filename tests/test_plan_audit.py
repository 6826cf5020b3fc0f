"""Registry-wide plan invariants (tools/plan_audit.py run in-process):
no CartesianProduct outside the justified whitelist, no row-at-a-time
Python evaluation anywhere, no non-whitelisted single-partition window.
The 59 individual plan pins check specific shapes; this is the global
backstop that catches a regression in ANY of the 300+ queries the
moment it lands.

First run of the audit found two real items: the Bayes A/B segment
cross (audited tiny — whitelisted with justification) and the Python
UDTF running as BatchEvalPython row-at-a-time (fixed: useArrow=True ->
ArrowEvalPythonUDTF).
"""

from __future__ import annotations

import pytest

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR


@pytest.mark.slow
def test_registry_plan_invariants(spark):
    from tools.plan_audit import CARTESIAN_OK, audit  # noqa: PLC0415

    results = audit(spark, all_specs(), SF_DIR)
    hard = {
        n: r["violations"]
        for n, r in results.items()
        if any(
            v in ("cartesian", "per_row_python_udf", "single_partition_window")
            or v.startswith("error")
            for v in r["violations"]
        )
    }
    assert not hard, f"plan invariant violations: {hard}"
    # whitelist hygiene: entries must at least name real queries. (A
    # per-plan "must still have a cartesian" check is NOT portable:
    # under the test session's conf the same tiny cross legitimately
    # plans as BroadcastNestedLoopJoin, while the driver's vanilla
    # session picks CartesianProduct — the whitelist covers the worst
    # planning outcome, not a required one.)
    for n in CARTESIAN_OK:
        assert n in results, f"cartesian whitelist names unknown query: {n}"
