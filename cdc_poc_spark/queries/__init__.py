"""Query registry — the engine's declared operator surface.

Every operator/query from SURVEY.md §2 is registered here as a
``QuerySpec``: a name, a ``(spark, sf_dir) -> DataFrame`` callable, and —
when the semantics are ANSI-SQL-expressible — the equivalent DuckDB SQL
the driver uses as a correctness oracle. Non-SQL-expressible operators
(MinHash LSH, SimHash, hyperplane-LSH ANN, stateful streaming) register
with ``oracle=None`` and get a rows-only check.

Column-name discipline: the driver's comparator sorts columns by name
before hashing, so every computed column is aliased identically in the
Spark code and the oracle SQL.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str] = None
    tags: tuple = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None, tags: tuple = ()):  # decorator
    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=(fn.__doc__ or "")
        )
        return fn

    return deco


# Rotation bookkeeping (documented in README.md / COVERAGE.md): the external
# driver hash-checks the FIRST 50 registry entries each round. Rounds 1-3
# rotated module import order so 110 distinct queries got driver rows; this
# list fronts the remaining 49 (registry keys absent from
# CORRECTNESS_r01/r02/r03) so round 4 completes driver verification of the
# round-3 registry. STANDING POLICY for round 5+: keep this order frozen
# for existing queries; queries ADDED in round N replace the front of this
# list in round N+1 (the evicted entries already have driver rows) — e.g.
# round 5 should front the queries added in r4 that are not in the
# r4 window: `join_interval_overlap`, `agg_robust_outliers_mad`,
# `graph_triangle_stats`, `dedup_incremental_vs_index`,
# `pipeline_token_budget_fill`, `pipeline_mixture_reweight`,
# `sim_semantic_canonical`, `pipeline_leakage_safe_split`,
# `text_build_vocab`, `pipeline_contains_decontaminate`,
# `text_encode_ids`, `graph_pagerank_3iter`,
# `pipeline_curation_near_dup_safe`, `pipeline_curriculum_stages`.
# The local full sweep (tests/test_oracle_parity.py +
# tools/run_parity_sweep.py -> PARITY_SWEEP.json) always checks every
# oracled query regardless of this ordering.
_ROUND4_FRONT = [
    "sql_window_top_suppliers",
    "sql_priority_mix_by_status",
    "sql_setops_nation_bands",
    "sql_exists_high_value_customers",
    "sql_rollup_segment_counts",
    "sql_string_shaping",
    "sql_mom_revenue_growth",
    "sql_order_count_bands",
    "tw_tumbling_5min_by_type",
    "tw_sliding_10min_step5",
    "tw_session_30min_by_user",
    "tw_interval_join_attribution",
    "tw_time_rollup_hierarchy",
    "tw_gap_fill_interpolate",
    "udf_pandas_normalize_text",
    "udf_pandas_grouped_agg",
    "udf_python_udtf_tokenize",
    "text_bm25_topk",
    "text_inverted_index_stats",
    "pipeline_stratified_sample",
    "text_quality_percentile_filter",
    "pipeline_corpus_curation",
    "pipeline_zorder_layout",
    "join_salted_skew",
    "pipeline_global_index",
    "agg_moment_stats",
    "agg_corr_regression",
    "join_range_binned",
    "tw_sessionize_ids",
    "text_tfidf_cosine_topk",
    "pipeline_dup_rate_by_source",
    "scalar_url_parse",
    "join_asof_tolerance",
    "agg_histogram_fixed_bins",
    "pipeline_source_overlap_ngrams",
    "ml_kmeans_step_assign",
    "win_funnel_stages",
    "pipeline_weighted_sample",
    "text_lang_id_accuracy",
    "text_doc_fingerprint",
    "text_regex_token_count",
    "mm_media_metadata",
    "mm_fake_features",
    "pipeline_split_train_val",
    "text_top_tokens",
    "text_token_budget_by_source",
    "text_top_bigrams",
    "mm_frame_sample",
    "mm_resize_dims",
    # New in round 4 — takes the window's one free slot (the other 49
    # are this round's never-checked backlog; q1, already checked in
    # r3, drops to position 51).
    "text_unigram_logprob_junk",
]


def all_specs() -> dict[str, QuerySpec]:
    """Import all query modules (side effect: registration) and return the
    full registry, ordered so the ``_ROUND4_FRONT`` queries come first
    (see the comment above that list for why)."""
    from . import (  # noqa: F401
        tpch,
        tpch2,
        windows,
        scalars,
        setops,
        subqueries,
        sqlapi,
        timewindows,
        udfs,
        retrieval,
        pipeline,
        analytics,
        aggregates,
        cdc_queries,
        curation,
        joins,
        llm_ops,
    )

    front = {n: _REGISTRY[n] for n in _ROUND4_FRONT if n in _REGISTRY}
    rest = {n: s for n, s in _REGISTRY.items() if n not in front}
    return {**front, **rest}
