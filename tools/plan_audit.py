"""Registry-wide physical-plan audit — the 59 per-query plan pins
generalized into global invariants over EVERY registered query.

For each registry entry the query's DataFrame is built at sf0.001 and
its formatted physical plan is scanned for:

  1. CartesianProduct         — O(n*m) row explosion. Allowed only on
                                the whitelist below (tiny intentional
                                crosses, each justified inline).
  2. BatchEvalPython          — a ROW-AT-A-TIME Python UDF in the plan.
                                Never allowed: the engine's rule is
                                Arrow-vectorized Python only
                                (ArrowEvalPython / FlatMapGroupsInPandas
                                / MapInPandas pass).
  3. SinglePartition + Window — recorded as an advisory count with its
                                own whitelist: legitimate only when the
                                windowed relation is bounded (quota /
                                seed / threshold relations of <= a few
                                hundred rows, documented per query).

Writes PLAN_AUDIT.json at the repo root: per-query node counts +
violations; exits non-zero on any non-whitelisted hard violation.
tests/test_plan_audit.py runs the same audit in-process so the suite
fails the moment a regression introduces a cartesian or a per-row UDF
anywhere in the registry.

Queries whose CONSTRUCTION executes jobs (the IVM drives, which apply
epochs before returning their view) are audited on their final read
plan like everything else — they are just slower to build; none are
skipped.
"""

from __future__ import annotations

import io
import contextlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: CartesianProduct whitelist: every entry is a deliberate tiny cross
#: (both sides O(1)-to-O(100) rows) that a broadcast theta join cannot
#: express more cheaply. Keyed by query name.
CARTESIAN_OK = {
    "join_cross_region_pairs",  # 5x5 region cross — the operator IS a cross
    # segment-pair posterior comparison: the cross is |segments|^2 / 2
    # AGGREGATE rows (<= 10 at any scale — segments, not customers);
    # VERDICT r6 audited it as an intentional tiny cross
    "agg_bayes_ab_posterior",
}

#: SinglePartition-exchange-feeding-a-Window whitelist: the windowed
#: relation is bounded by construction (quota rows, seed ranks,
#: percentile rollups over |groups| rows, threshold relations).
SINGLE_PARTITION_WINDOW_OK = {
    # |strata| / |groups| / |thresholds| sized relations:
    "pipeline_proportional_sample",
    "pipeline_token_budget_fill",
    "pipeline_mixture_reweight",
    "pipeline_domain_mixture",
    "pipeline_temperature_mixture",
    "pipeline_curriculum_stages",
    "pipeline_weighted_reservoir",
    "agg_decile_stats",
    "agg_pareto_concentration",
    "agg_gini_coefficient",
    "agg_weighted_median",
    "agg_ks_two_sample",
    "agg_mann_whitney_u",
    "tw_seasonal_baseline",
    # rank-based seeds over <= 16 rows (IVF/PQ/k-means seeding):
    "sim_ann_ivf_topk",
    "sim_ann_ivfpq_topk",
    "sim_knn_graph_ivf",
    "sim_pq_codebook_stats",
    "ml_kmeans_step_assign",
    "ml_kmeans_step_update",
    "sim_centroid_distances",
    # 5-row calibration-curve relations (threshold/probe/gap sweeps):
    "sim_ann_ivfpq_probe_sweep",
    # day-bounded relations (30 observed days -> <=30 resp. <=900 rows
    # through the unpartitioned rank window; the raw scan is never
    # windowed):
    "agg_mann_kendall_trend",
    "agg_hodges_lehmann_shift",
    "tw_page_hinkley",
    "tw_hurst_rescaled_range",
    "tw_durbin_watson",
    "tw_variance_ratio_test",
    "tw_chow_break_test",
    "tw_sample_entropy",
    "tw_turning_points_test",
    "tw_sma_crossover_signals",
    "tw_seasonal_mann_kendall",
    "tw_adf_t_stat",
    "tw_pacf_lag2",
    # fixed 1024-row bucket-domain relation through the CDF window:
    "pipeline_hash_uniformity_check",
    # value-domain-bounded rollup through the exact-median rank window
    # (the agg_weighted_median pattern):
    "agg_mood_median_test",
    # the windows here are per-__pid partition-LOCAL (global_cumsum's
    # two-pass shape — never a single-partition window); the
    # SinglePartition exchange in the plan feeds the final 1-row
    # statistic aggregate, which any scalar test query has:
    "agg_jonckheere_terpstra",
    # the final rank window runs over the <= k-row POST-LIMIT union of
    # 7 shard partials (the _ivf_seeds bounded pattern); the raw scan
    # only ever sees the partitioned per-shard window:
    "agg_bottomk_sample_merge",
}


def audit(spark, specs, sf_dir: str) -> dict:
    results: dict[str, dict] = {}
    for name, spec in specs.items():
        row: dict = {}
        try:
            df = spec.fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            # Violation detection uses the RAW occurrence count (> 0):
            # the //2 normalization (each node prints ~twice in formatted
            # explain) is informational only — an odd count must not
            # floor to 0 and mask a violation (ADVICE r7).
            cartesian_raw = plan.count("CartesianProduct")
            batch_eval_raw = plan.count("BatchEvalPython")
            row["cartesian"] = cartesian_raw // 2
            row["batch_eval_python"] = batch_eval_raw // 2
            row["single_partition"] = "Exchange SinglePartition" in plan
            row["window"] = "Window" in plan
            violations = []
            if cartesian_raw and name not in CARTESIAN_OK:
                violations.append("cartesian")
            if batch_eval_raw:
                violations.append("per_row_python_udf")
            if (
                row["single_partition"]
                and row["window"]
                and name not in SINGLE_PARTITION_WINDOW_OK
            ):
                violations.append("single_partition_window")
            row["violations"] = violations
        except Exception as exc:  # noqa: BLE001 - report, don't abort audit
            row["violations"] = [f"error: {type(exc).__name__}: {exc}"]
        results[name] = row
        spark.catalog.clearCache()
    return results


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__  # noqa: F401 - sys.path bootstrap parity

    from cdc_poc_spark.queries import all_specs

    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:  # dev loop: audit named queries, don't write
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf = args[0] if args else "/root/testdata/sf0.001"
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    specs = all_specs()
    if only is not None:
        specs = {n: s for n, s in specs.items() if n in only}
    results = audit(spark, specs, sf)
    hard = {
        n: r
        for n, r in results.items()
        if any(v in ("cartesian", "per_row_python_udf") or v.startswith("error")
               for v in r["violations"])
    }
    advisory = {
        n: r["violations"]
        for n, r in results.items()
        if "single_partition_window" in r["violations"]
    }
    out = {
        "sf_dir": sf,
        "n_queries": len(results),
        "n_hard_violations": len(hard),
        "hard_violations": {n: r["violations"] for n, r in hard.items()},
        "advisory_single_partition_window": sorted(advisory),
        "cartesian_whitelist": sorted(CARTESIAN_OK),
        "single_partition_window_whitelist": sorted(SINGLE_PARTITION_WINDOW_OK),
        "queries": results,
    }
    if only is None:  # partial runs must not overwrite the committed audit
        with open(os.path.join(REPO, "PLAN_AUDIT.json"), "w") as fh:
            json.dump(out, fh, indent=1)
    print(
        f"{len(results)} plans audited; {len(hard)} hard violations;"
        f" {len(advisory)} advisory single-partition windows"
    )
    for n, r in hard.items():
        print(f"  HARD {n}: {r['violations']}")
    sys.exit(1 if hard else 0)


if __name__ == "__main__":
    main()
