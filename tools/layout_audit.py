"""Registry-wide LAYOUT-DETERMINISM audit: every query's result hashed
under two different physical layouts (shuffle-partition counts), at
sf0.001. A mismatch means the query's VALUES depend on summation /
evaluation order — the bug class the cross-engine oracle is
structurally blind to when both engines happen to pick the same order
(round 8 found exactly this in agg_anova_f: the sweep's 32-thread
session reordered a 5-row double sum past round(4) while the test
session and DuckDB agreed with each other).

The comparator is the driver's: column-name-sorted, row-sorted, repr
hashing. Writes LAYOUT_AUDIT.json at the repo root.

Usage: python tools/layout_audit.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rows_hash(df) -> tuple[int, str]:
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(map(repr, pdf.astype(str).itertuples(index=False, name=None)))
    return len(rows), hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> None:
    from cdc_poc_spark.queries import all_specs
    from cdc_poc_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="layout-audit")
    specs = all_specs()
    t0 = time.perf_counter()
    results: dict[str, dict] = {}
    # two layouts: the session default (32) and a coprime small count;
    # AQE stays on in both (the production setting) — what changes is
    # the partitioning every shuffle-dependent order flows from
    for name, spec in specs.items():
        row: dict = {}
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            n1, h1 = _rows_hash(spec.fn(spark, sf))
            spark.catalog.clearCache()
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            n2, h2 = _rows_hash(spec.fn(spark, sf))
            spark.catalog.clearCache()
            row = {"n": n1, "match": (n1, h1) == (n2, h2)}
            if not row["match"]:
                row["detail"] = {"h32": (n1, h1), "h7": (n2, h2)}
        except Exception as exc:  # noqa: BLE001 - report, don't abort
            row = {"error": f"{type(exc).__name__}: {exc}"}
        results[name] = row
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    mism = sorted(n for n, r in results.items() if r.get("match") is False)
    errs = sorted(n for n, r in results.items() if "error" in r)
    out = {
        "sf_dir": sf,
        "n_queries": len(results),
        "n_mismatch": len(mism),
        "mismatches": mism,
        "n_error": len(errs),
        "errors": {n: results[n]["error"] for n in errs},
        "total_sec": round(time.perf_counter() - t0, 1),
        "queries": results,
    }
    with open(os.path.join(REPO, "LAYOUT_AUDIT.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        f"{len(results)} queries under 2 layouts; "
        f"{len(mism)} mismatches; {len(errs)} errors; {out['total_sec']} s"
    )
    for n in mism:
        print(" MISMATCH:", n, results[n]["detail"])


if __name__ == "__main__":
    main()
