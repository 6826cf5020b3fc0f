"""Dump `.explain("formatted")` for bench headline queries to
plans/r14/<query>_<tag>.txt — the optimization round's committed plan
evidence (guide §1: capture the plan shape before and after every
change).

Usage: python tools/dump_plans.py <tag> [query ...]
  <tag>   suffix for the files, e.g. "before" or "after".
  queries default to the full CORE + ROTATING headline pool.

Notes: building some queries executes eager localCheckpoints (that is
their contract — the plan of record is the final composed plan); the
dump is about plan SHAPE (Exchange count, join strategy, PushedFilters,
ReadSchema), not timing.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cdc_poc_spark.queries import all_specs  # noqa: E402
from cdc_poc_spark.session import get_spark  # noqa: E402


def explain_formatted(spark, df) -> str:
    """`explain("formatted")` as a string (DataFrame.explain only prints)."""
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)

    import bench

    names = sys.argv[2:] or (bench.CORE + bench.ROTATING)
    spark = get_spark(app_name="plan-dump")
    specs = all_specs()
    for name in names:
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            spark.sparkContext.setJobDescription(f"plan-dump: {name}")
            df = specs[name].fn(spark, sf_dir)
            plan = explain_formatted(spark, df)
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building plan: {exc!r}\n"
        finally:
            spark.sparkContext.setJobDescription(None)
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)}B, Exchange x{n_ex} -> {path}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
