"""Measure named registry queries at two fixture scales (default sf0.1
vs the 10x probe) — warm n-run medians through the noop sink, the same
timing discipline as bench.py. Used to record the per-operator 10x
ratios PLANS.md tracks for every new operator.

Usage: python tools/probe_queries.py q1 q2 ... [--n 3]
Env: PROBE_A (default /root/testdata/sf0.1), PROBE_B (default /tmp/sfprobe).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_poc_spark.queries import all_specs  # noqa: E402
from cdc_poc_spark.session import get_spark  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if "--n" in args:  # consume the flag AND its value (it used to leak
        i = args.index("--n")  # into the name list and KeyError at the end)
        n = int(args[i + 1])
        del args[i : i + 2]
    names = [a for a in args if not a.startswith("--")]
    dir_a = os.environ.get("PROBE_A", "/root/testdata/sf0.1")
    dir_b = os.environ.get("PROBE_B", "/tmp/sfprobe")
    spark = get_spark(app_name="cdc-poc-probe")
    specs = all_specs()
    out: dict[str, dict] = {}
    for name in names:
        fn = specs[name].fn
        _force(fn(spark, "/root/testdata/sf0.001"))  # codegen warm
        row = {}
        for label, d in (("a", dir_a), ("b", dir_b)):
            _force(fn(spark, d))  # scale warm (page cache, AQE stats)
            times = []
            for _ in range(n):
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                _force(fn(spark, d))
                times.append(time.perf_counter() - t0)
            row[label] = round(statistics.median(times), 2)
        row["ratio"] = round(row["b"] / row["a"], 1) if row["a"] > 0 else None
        out[name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
