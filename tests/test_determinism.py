"""Shuffle-order independence, exercised directly: the micro-nat /
exact-integer discipline claims results are identical regardless of
partitioning and accumulation order. This runs representative queries
under THREE different physical layouts (default; shuffle.partitions=7;
shuffle.partitions=61 + AQE coalesce off) and asserts bit-identical
collected results — the property that makes the driver's value-hash
reproducible on any cluster.
"""

from __future__ import annotations

import pytest

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR

SPECS = all_specs()

#: queries whose docstrings claim order-proof exactness via integer
#: quantization before cross-row aggregation — the claim under test
CASES = [
    "agg_geometric_mean",          # micro-nat ln sum
    "text_distribution_drift_js",  # micro-nat KL terms
    "agg_poisson_bootstrap",       # integer weights, DECIMAL sums
    "agg_mann_whitney_u",          # integer histogram prefix sum
    "ml_power_iteration_step",     # DECIMAL(38) accumulators
    "pipeline_dataset_fingerprint",  # commutative mod-prime hash sum
    "text_textrank_keywords",      # integer floor-div iterations
]


def _rows(spark, name):
    return sorted(tuple(r) for r in SPECS[name].fn(spark, SF_DIR).collect())


@pytest.mark.parametrize("name", CASES)
def test_result_is_layout_independent(spark, name):
    base = _rows(spark, name)
    assert base  # non-degenerate
    conf = spark.conf
    old_sp = conf.get("spark.sql.shuffle.partitions")
    old_coalesce = conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    try:
        conf.set("spark.sql.shuffle.partitions", "7")
        assert _rows(spark, name) == base, f"{name}: differs at 7 partitions"
        conf.set("spark.sql.shuffle.partitions", "61")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        assert _rows(spark, name) == base, f"{name}: differs at 61/no-coalesce"
    finally:
        conf.set("spark.sql.shuffle.partitions", old_sp)
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", old_coalesce)
