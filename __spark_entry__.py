"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All query definitions live in ``time_series_db_spark.catalog`` — one
entry per operator from SURVEY.md §2 plus the large-scale pipeline ops.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: fetch → 3h moving average
    → sum by (name, region) → top-5 series by average."""
    from time_series_db_spark.catalog import _out
    from time_series_db_spark.operators import grouping, ordering, windows
    from time_series_db_spark.sources import DEFAULT_STEP_MS, fetch_events

    sf = fetch_events(spark, "/root/testdata/sf0.001")
    sf = windows.moving(sf, 3 * DEFAULT_STEP_MS, "avg")
    sf = grouping.sum_(sf, ["name", "region"])
    sf = ordering.top_k(sf, 5, "avg", descending=True)
    return _out(sf, ["name", "region"])


# Names that already have a driver-green CORRECTNESS row (union of the
# r1–r8 runs: all 282 catalog entries green as of r8 — the first
# all-green round).  The driver's per-round run covers a prefix of the
# dict, so order the not-yet-verified (new-this-round) entries first;
# previously-green entries follow, least-recently-checked first (see
# _last_checked), so the window's spare slots continuously re-certify
# the oldest greens.
_DRIVER_VERIFIED = frozenset({
    # r12 window addition (50/50 green, CORRECTNESS_r12.json)
    'mm_ahash_wide_neardup',
    # r10 window additions (50/50 green, CORRECTNESS_r10.json)
    'ann_ivf_prebuilt', 'ann_ivf_update', 'dedup_boilerplate_spans',
    'dedup_xcorpus_prebuilt', 'dedup_xcorpus_update', 'events_funnel_latency',
    'm3_forecast', 'm3_forecast_backtest', 'm3_lead_lag', 'm3_rolling_corr',
    'm3_seasonal_decompose', 'm3ql_forecast', 'm3ql_rolling_corr',
    'm3ql_seasonal_decompose', 'mm_ahash_neardup',
    'pipeline_curate_incremental', 'sample_token_budget',
    'search_eval_metrics', 'text_categorical_psi',
    'text_classifier_calibration', 'text_ngram_novelty',
    'text_quality_classifier',
    # r9 window additions (50/50 green, CORRECTNESS_r09.json)
    'm3_correlate_matrix', 'text_snapshot_psi', 'decontaminate_eval_side',
    'corpus_diff', 'split_leakage_safe', 'm3ql_seasonal_auto',
    'm3_seasonal_auto', 'text_bpe_encode_xcorpus', 'm3_season_votes',
    'text_bpe_oov_xcorpus', 'm3_seasonal_auto_series',
    # r8 window (50/50 green, CORRECTNESS_r08.json)
    'mm_image_ahash', 'm3_moving_percentile', 'embedding_matryoshka',
    'ann_lsh_recall', 'text_source_stats', 'decontaminate_overlap',
    'search_hybrid_rerank', 'dedup_soft_weights', 'm3ql_changepoints',
    'm3_changepoints', 'embedding_source_drift', 'ann_hard_negatives_ivf',
    'text_tfidf_terms', 'search_rrf', 'm3ql_interpolate', 'm3_interpolate',
    'text_bpe_encode', 'search_mmr', 'm3ql_ewma', 'm3_ewma',
    'text_bpe_fertility', 'm3_correlate_target', 'm3_autocorrelation',
    'm3_fleet_outliers',
    # r1–r7 union
    'embedding_pq_codes', 'm3_decimate_lttb', 'decontaminate_bloom',
    'text_bpe_merges', 'ann_hard_negatives', 'tpch_q2_min_cost_supplier',
    'm3ql_seasonal_adjust', 'm3_seasonal_residual',
    'text_bpe_token_counts', 'tpch_q11_important_stock',
    'm3ql_decimate_lttb', 'm3_seasonal_anomalies', 'text_kl_divergence',
    'tpch_q12_late_priority', 'tpch_q16_supplier_cnt',
    'tpch_q20_excess_suppliers',
    'm3_exposition_roundtrip', 'chunk_documents', 'dedup_cross_corpus',
    'pack_sequences', 'pipeline_curate', 'text_compressibility',
    'embedding_pca', 'search_bm25', 'sample_importance_dsir',
    'events_asof_join', 'ann_pq_adc_topk', 'tpch_q22_lapsed_customers',
    'm3ql_alias_by_bucket', 'promql_sort_by_label', 'm3_graphite_roundtrip',
    'pipeline_curate_full', 'text_pmi_bigrams', 'sample_lang_temperature',
    'events_range_join', 'ann_ivfpq_topk', 'm3ql_alias_by_distinct_tags',
    'promql_mad_over_time', 'm3_line_protocol_roundtrip', 'sample_weighted',
    'events_funnel', 'm3ql_multi_burn_rate', 'promql_ts_of_max',
    'm3_decimate_minmax', 'events_retention', 'm3ql_as_burn_rate',
    'promql_count_over_time', 'events_transitions',
    'm3ql_as_multi_burn_rate', 'promql_stddev_over_time',
    'm3ql_summarize_by', 'promql_last_over_time',
    'm3ql_show_anomaly_thresholds', 'promql_sum_over_time',
    'm3ql_divide_when', 'promql_minmax_over_time',
    'promql_present_over_time',
    'alert_rule_batch', 'ann_cosine_topk_int8', 'decontaminate_ngram',
    'dedup_exact_substring', 'dedup_semantic', 'embedding_project_jl',
    'embedding_quantize', 'm3_percentile_of_series_windowed',
    'm3ql_alias_by_histogram_bucket', 'm3ql_burn_rate',
    'm3ql_histogram_cdf', 'm3ql_mock_fetch_line', 'm3ql_mock_fetch_linear',
    'm3ql_mock_fetch_periodic', 'm3ql_prom_histogram_percentile',
    'm3ql_timestamp', 'm3ql_to_histogram_explicit', 'promql_at_instant',
    'promql_at_max_over_time', 'promql_atan2', 'promql_count_values',
    'promql_histogram_fraction', 'promql_limit_ratio', 'promql_limitk',
    'promql_subquery_avg', 'promql_subquery_max_rate',
    'recording_rule_batch', 'sample_mixture', 'sample_stratified',
    'sessionize_events', 'text_gopher_quality', 'text_lm_perplexity',
    'text_pii_scrub', 'text_ppl_buckets', 'text_vocab_count',
    'tpch_q13_order_distribution', 'tpch_q15_top_supplier',
    'tpch_q17_small_quantity', 'tpch_q19_disjunctive_revenue',
    'tpch_q21_waiting_suppliers', 'tpch_q4_priority',
    'tpch_q7_nation_volume', 'tpch_q8_market_share', 'tpch_q9_profit',
    'tpch_rev_mom',
    'ann_cosine_topk', 'ann_ivf_kmeans_topk', 'ann_ivf_topk',
    'ann_lsh_topk', 'dedup_cluster_survivors', 'dedup_embedding_cosine',
    'dedup_exact', 'dedup_minhash_lsh', 'dedup_ngram_jaccard',
    'dedup_simhash', 'm3_abs', 'm3_alias', 'm3_alias_by_tags',
    'm3_as_percent', 'm3_avg_by', 'm3_changed', 'm3_count_by',
    'm3_derivative', 'm3_divide', 'm3_divide_scalar', 'm3_exclude_by_tag',
    'm3_fallback_constant', 'm3_fallback_series', 'm3_federated_fetch',
    'm3_federated_windows', 'm3_fetch', 'm3_fetch_filtered', 'm3_head',
    'm3_integral', 'm3_integral_reset', 'm3_intersect', 'm3_is_non_null',
    'm3_keep_last_value', 'm3_logarithm', 'm3_map_key', 'm3_max_by',
    'm3_min_by', 'm3_moving_avg', 'm3_moving_max', 'm3_moving_median',
    'm3_moving_min', 'm3_moving_sum', 'm3_multiply_by',
    'm3_normalize_mixed_step', 'm3_offset', 'm3_per_second',
    'm3_per_second_rate', 'm3_percentile_of_series', 'm3_range_by',
    'm3_remove_empty', 'm3_round', 'm3_scale', 'm3_scale_to_seconds',
    'm3_show_tags', 'm3_sort', 'm3_sqrt', 'm3_subtract', 'm3_sum_by',
    'm3_sum_global', 'm3_summarize', 'm3_summarize_last', 'm3_sustain',
    'm3_tag_compare', 'm3_tag_sub', 'm3_tail', 'm3_timeshift', 'm3_topk',
    'm3_transform_null', 'm3_truncate', 'm3_union', 'm3_value_filter_eq',
    'm3_value_filter_ge', 'm3_value_filter_lt', 'm3_value_filter_ne',
    'm3_where', 'm3ql_alias_sort_head', 'm3ql_alias_sub',
    'm3ql_anomalies', 'm3ql_constant_line', 'm3ql_divide_by_group_total',
    'm3ql_federated_sum', 'm3ql_fetch_wildcard', 'm3ql_filter_topk',
    'm3ql_histogram_percentile', 'm3ql_keep_last_summarize',
    'm3ql_macros_binary', 'm3ql_mapper_chain', 'm3ql_mock_fetch',
    'm3ql_n_percentile', 'm3ql_non_negative_derivative',
    'm3ql_percentile_interpolate', 'm3ql_remove_above_percentile',
    'm3ql_set_diff', 'm3ql_stdev_by', 'm3ql_sustained_above',
    'm3ql_tag_add', 'm3ql_to_histogram', 'm3ql_to_histogram_percentile',
    'm3ql_top_k_per_timestamp', 'm3ql_union_sum', 'mm_audio_features',
    'mm_decode_image_meta', 'mm_sample_frames', 'promql_absent',
    'promql_avg_over_time', 'promql_binary_ignoring', 'promql_binary_on',
    'promql_changes', 'promql_cmp_bool', 'promql_cmp_filter',
    'promql_count_without', 'promql_delta', 'promql_deriv',
    'promql_histogram_quantile', 'promql_holt_winters', 'promql_increase',
    'promql_irate', 'promql_label_join', 'promql_label_replace',
    'promql_math_clamp', 'promql_offset', 'promql_predict_linear',
    'promql_quantile_agg', 'promql_quantile_over_time', 'promql_rate',
    'promql_rate_ratio', 'promql_resets', 'promql_scalar_arith',
    'promql_scalar_time', 'promql_selector', 'promql_selector_regex',
    'promql_set_and', 'promql_set_or', 'promql_set_unless',
    'promql_stddev_agg', 'promql_sum_by_rate', 'promql_time_fields',
    'promql_topk_agg', 'promql_trig_chain', 'promql_vector_divide',
    'stats_fetch_labels', 'stats_head', 'stats_labels', 'stats_values',
    'text_fingerprint', 'text_langid', 'text_quality', 'text_repetition',
    'text_token_stats', 'tpch_q10_returns', 'tpch_q14_promo',
    'tpch_q18_large_orders', 'tpch_q1_pricing', 'tpch_q3_shipping',
    'tpch_q5_local_volume', 'tpch_q6_forecast',
})


#: Entries whose BACKING CODE changed after their most recent driver
#: green — changed code must re-earn its green, so these jump the
#: rotation queue ahead of everything else (r11 verdict item #1: the
#: builder's own fresh-process certification is the right discipline,
#: but the driver's differential is the binding signal).  Update this
#: list every round to the entries touched that round; stale names are
#: harmless (they just re-certify early).
_RECERTIFY_FIRST = (
    # r14 OPTIMIZATION round: every entry whose backing code changed in
    # the perf work (OPTIMIZATION_r14.md) — all re-proven oracle-exact
    # locally (full 319-entry differential + per-batch driver-contract
    # checks), but changed code must re-earn its driver green.
    # mock-fetch literal-plan synthesis (sources/m3source.py)
    "m3ql_mock_fetch",
    "m3ql_mock_fetch_line",
    "m3ql_mock_fetch_linear",
    "m3ql_mock_fetch_periodic",
    "m3ql_seasonal_auto",
    # histogram bucket-parse Generate barrier (operators/grouping.py)
    "m3ql_histogram_percentile",
    "m3ql_to_histogram_percentile",
    "m3ql_histogram_cdf",
    # single-series target pin (operators/stats.py)
    "m3_correlate_target",
    "m3_rolling_corr",
    "m3_lead_lag",
    "m3ql_rolling_corr",
    # coordinator BPE training (pipeline/bpe.py)
    "text_bpe_merges",
    "text_bpe_encode",
    "text_bpe_encode_xcorpus",
    "text_bpe_token_counts",
    "text_bpe_fertility",
    "text_bpe_oov_xcorpus",
    # one-call literal arrays (pipeline/ann.py)
    "embedding_pca",
    "embedding_project_jl",
    # coordinator MMR selection + hybrid shortlist pin (retrieval.py)
    "search_mmr",
    "search_hybrid_rerank",
    # coordinator union-find components (pipeline/dedup.py)
    "dedup_cluster_survivors",
    "dedup_soft_weights",
    "split_leakage_safe",
    "pipeline_curate",
    "pipeline_curate_full",
    "pipeline_curate_incremental",
)


def _family(name: str) -> str:
    return name.split("_", 1)[0]


def _last_checked() -> dict[str, int]:
    """Round number each entry was most recently driver-checked in, parsed
    from the CORRECTNESS_r{N}.json files the driver leaves at the repo
    root.  Entries absent from every file map to 0.  Used to order the
    already-verified tail least-recently-checked first, so the bounded
    per-round window rotates through the whole catalog over time."""
    import glob
    import json
    import re

    root = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name in rows:
            last[name] = max(last.get(name, 0), rnd)
    return last


def _ordered(mapping: dict) -> dict:
    """Driver-unverified entries first, round-robin interleaved across
    operator families (m3 / m3ql / promql / stats / dedup / ann / text /
    mm / tpch) so a capped correctness run still samples every family;
    previously-green entries follow least-recently-checked first (ties in
    registration order) so spare window slots re-certify the oldest
    greens."""
    from time_series_db_spark.catalog import QUERIES

    recert = [n for n in _RECERTIFY_FIRST if n in QUERIES]
    head = set(recert)
    unverified = [
        n for n in QUERIES if n not in _DRIVER_VERIFIED and n not in head
    ]
    buckets: dict[str, list] = {}
    for n in unverified:
        buckets.setdefault(_family(n), []).append(n)
    interleaved = []
    while any(buckets.values()):
        for fam in list(buckets):
            if buckets[fam]:
                interleaved.append(buckets[fam].pop(0))
    last = _last_checked()
    reg_idx = {n: i for i, n in enumerate(QUERIES)}
    verified = sorted(
        (n for n in QUERIES if n in _DRIVER_VERIFIED and n not in head),
        key=lambda n: (last.get(n, 0), reg_idx[n]),
    )
    names = recert + interleaved + verified
    return {n: mapping[n] for n in names if n in mapping}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from time_series_db_spark.catalog import QUERIES

    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    from time_series_db_spark.catalog import ORACLES

    return _ordered(ORACLES)
