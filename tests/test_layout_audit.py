"""Guard for the committed LAYOUT_AUDIT.json (tools/layout_audit.py):
every registered query hashed under two shuffle layouts, zero
mismatches. Re-running the full audit in-suite would double the suite
wall (~440 s), so the suite enforces FRESHNESS instead: the committed
record must cover exactly the current registry with zero mismatches
and zero errors — a registry change without a re-run fails here.
(Per-query layout independence for the shuffle-heavy operators is
additionally exercised live in tests/test_determinism.py.)
"""

from __future__ import annotations

import json
import os

from cdc_poc_spark.queries import all_specs

_RECORD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "LAYOUT_AUDIT.json")


def test_layout_audit_record_fresh_and_clean():
    with open(_RECORD) as fh:
        rec = json.load(fh)
    assert rec["n_mismatch"] == 0, f"layout mismatches: {rec['mismatches']}"
    assert rec["n_error"] == 0, f"layout audit errors: {rec['errors']}"
    current = set(all_specs())
    recorded = set(rec["queries"])
    missing = sorted(current - recorded)
    assert not missing, (
        f"registry grew since the committed layout audit — re-run "
        f"tools/layout_audit.py; uncovered: {missing}"
    )
