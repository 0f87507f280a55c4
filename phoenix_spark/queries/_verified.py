"""Manifest of externally driver-verified registry entries, per round.

The external correctness driver replays only the FIRST 50 registry entries
each round, and the judge reads each round's CORRECTNESS file strictly.  To
widen cross-round coverage deterministically, the window is split into a
PERMANENT head (one flagship per operator family, re-verified every round)
and ROTATING slots filled with entries that have never had a driver row.

This file records which names were driver-green in each completed round
(source: CORRECTNESS_r{N}.json, hash/rows-match rows only).  The rotation
in ``phoenix_spark.queries._TIER1`` picks its fill slots from the registry
entries NOT in ``driver_verified()``; after each round, append that round's
green names here so the next rotation advances instead of repeating.
"""

from __future__ import annotations

# Round 2: 50-entry window over the then-current ordering (scans, filters,
# joins, aggregates, TPC-H) — all hash-matched.  NOTE: the window also ran
# agg_approx_count_distinct, but its r02 row was ``err: "no_oracle"``
# (rows-only sketch at the time), so it is deliberately NOT listed here;
# the entry has since been reworked into an oracle-checkable error-bound
# invariant and must rotate back into a driver window to earn a green row.
R02 = frozenset(
    {
        "scan_projection", "scan_point_lookup", "scan_skip", "scan_tablesample",
        "scan_serial", "filter_range_pred", "filter_in_like", "filter_ilike",
        "filter_null_3vl", "filter_rvc_compare", "filter_rvc_in",
        "filter_case_cast", "filter_like_escape", "agg_ungrouped",
        "q1_pricing_summary", "agg_groupby_hash", "agg_groupby_pk_prefix",
        "agg_distinct", "agg_count_distinct", "agg_having", "agg_stddev",
        "agg_percentile", "agg_first_last_value", "agg_rollup", "join_broadcast_inner", "join_broadcast_left",
        "join_right_outer", "join_sort_merge_full", "join_cross", "join_semi",
        "join_anti", "q3_shipping_priority", "q6_forecast_revenue",
        "q12_shipmode_priority", "q14_promo_revenue", "q10_returned_items",
        "q5_local_supplier_volume", "join_asof", "join_range_bucketed",
        "q2_min_cost_supplier", "q4_order_priority", "q7_nation_volume",
        "q8_market_share", "q13_customer_distribution", "q9_product_profit",
        "q11_important_stock", "q15_top_supplier", "q16_supplier_cnt",
        "q17_small_qty_revenue",
    }
)

# Round 3: 50/50 green (CORRECTNESS_r03.json) — every family representative
# hash-matched (mm_frame_sample/mm_binary_meta included; the CDC/DDL/index
# lifecycle entries too).
R03 = frozenset(
    {
        "scan_projection", "source_csv_bulk_load", "engine_sql_roundtrip",
        "filter_range_pred", "subq_exists_correlated", "join_broadcast_inner",
        "join_sort_merge_full", "join_asof", "agg_ungrouped",
        "agg_grouping_sets", "window_rank_topn", "window_sessionize",
        "window_session_native", "sort_topk", "sort_rvc_offset_page",
        "setop_union_all", "str_regexp", "math_round_floor_ceil",
        "math_to_number", "dt_trunc_round", "dt_parse", "arr_unnest",
        "json_value", "bson_condition_filter", "bin_encode_decode",
        "meta_row_timestamp", "mutation_upsert_compaction",
        "mutation_snapshot_read", "mutation_cdc_feed", "ddl_view_predicate",
        "ddl_sequence_rows", "ddl_index_scan", "ddl_index_partial",
        "ddl_index_functional", "q1_pricing_summary", "q9_product_profit",
        "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "dedup_clusters", "dedup_simhash", "dedup_embedding",
        "similarity_topk", "similarity_lsh_pairs", "similarity_ivf_probe",
        "text_stats", "text_tfidf", "pipeline_curate_e2e", "mm_binary_meta",
        "mm_frame_sample",
    }
)

# Round 4: 49/50 hash-green (CORRECTNESS_r04.json); the one non-green row
# was meta_partition_id, recorded "no_oracle" because it shipped rows-only
# (fixed in round 5: the entry now returns an oracle-checkable invariant).
R04 = frozenset(
    {
        "scan_projection", "engine_sql_roundtrip", "filter_range_pred",
        "join_broadcast_inner", "join_asof", "agg_ungrouped",
        "window_session_native", "meta_row_timestamp",
        "mutation_upsert_compaction", "mutation_snapshot_read",
        "mutation_cdc_feed", "ddl_view_predicate", "ddl_sequence_rows",
        "ddl_index_scan", "q1_pricing_summary", "q9_product_profit",
        "dedup_minhash_lsh", "pipeline_curate_e2e", "sample_stratified",
        "text_seq_pack", "text_decontaminate", "pipeline_assemble_e2e",
        "ddl_index_uncovered", "mutation_upsert_select",
        "source_dynamic_columns", "subq_in", "subq_scalar_correlated",
        "q18_large_volume_customer", "q21_suppliers_waiting",
        "q22_sales_opportunity", "stream_stateful_checksum",
        "sort_nulls_first", "sort_fetch_first", "setop_intersect",
        "setop_union_all_topk", "agg_cube", "str_trim_pad_concat",
        "math_transcendental", "dt_extract_fields", "arr_construct_ops",
        "json_exists_filter", "bson_value_type", "bin_bytes_bits",
        "stream_cdc_counts", "text_quality_filter", "dedup_simhash128",
        "similarity_centroids", "mm_decode_features", "mm_resize_thumbnail",
    }
)

# Round 5: 50/50 hash-green (CORRECTNESS_r05.json) — the full window including
# all four formerly rows-only entries in their oracle-invariant form.
R05 = frozenset(
    {
        "scan_projection", "engine_sql_roundtrip", "filter_range_pred",
        "join_broadcast_inner", "join_asof", "agg_ungrouped",
        "window_session_native", "meta_row_timestamp",
        "mutation_upsert_compaction", "mutation_snapshot_read",
        "mutation_cdc_feed", "ddl_view_predicate", "ddl_sequence_rows",
        "ddl_index_scan", "q1_pricing_summary", "q9_product_profit",
        "dedup_minhash_lsh", "pipeline_curate_e2e", "bson_condition_sql",
        "source_csv_bulk_load", "mm_binary_meta", "stream_dedup_exact",
        "sort_nulls_last", "setop_except", "subq_not_in", "subq_scalar",
        "agg_salted_skew", "agg_hll_sketch_merge", "agg_percentile_approx",
        "scan_salted_roundtrip", "ddl_system_catalog", "ddl_view_diverge",
        "q19_disjunct_revenue", "agg_within_group_sql", "bin_set_splice",
        "window_running_lag", "str_collation_ci", "math_trig",
        "dt_format_arith_tz", "arr_any_all", "json_construct",
        "meta_partition_id", "text_langid", "text_fingerprint",
        "text_repetition_stats", "dedup_incremental", "similarity_knn_batch",
        "similarity_ivf_persisted", "sample_split", "assembly_mix_report",
    }
)

# Round 6: 50/50 hash-green (CORRECTNESS_r06.json) — the window rotated in
# all 27 never-driver-verified entries (23 carried + the 4 added in round 6),
# closing every §2 row's external verification.
R06 = frozenset(
    {
        "scan_projection", "engine_sql_roundtrip", "filter_range_pred",
        "join_broadcast_inner", "join_asof", "agg_ungrouped",
        "window_session_native", "meta_row_timestamp",
        "mutation_upsert_compaction", "mutation_snapshot_read",
        "mutation_cdc_feed", "ddl_view_predicate", "ddl_sequence_rows",
        "ddl_index_scan", "q1_pricing_summary", "q9_product_profit",
        "dedup_minhash_lsh", "pipeline_curate_e2e", "bson_condition_sql",
        "source_csv_bulk_load", "mm_binary_meta", "q20_part_promotion",
        "sort_limit_cap", "sort_offset", "subq_not_exists",
        "subq_all_quantified", "setop_intersect_all", "setop_except_all",
        "agg_percent_rank", "agg_nth_first_last_values", "agg_filter_clause",
        "str_substr_instr_case", "str_char_padding", "math_to_number_fmt",
        "arr_elem_len", "json_modify_value", "window_first_last_nth",
        "window_dist_ntile", "text_chunking", "text_vocab_topk",
        "text_tokenize_bpe", "text_redact", "similarity_label_affinity",
        "sample_temperature", "ttl_retention_view", "udf_create_function",
        "mutation_upsert_update_only", "sql_int_div_nested", "dt_trunc_round",
        "bin_encode_decode",
    }
)

# Round 7: 50/50 hash-green (CORRECTNESS_r07.json) — agg_approx_count_distinct
# earned its first external green (closing the registry at 185/185 cumulative),
# the r02-era join family was re-verified fresh, and all five new round-7
# entries passed on their first driver run.
R07 = frozenset(
    {
        "scan_projection", "engine_sql_roundtrip", "filter_range_pred",
        "join_broadcast_inner", "join_asof", "agg_ungrouped",
        "window_session_native", "meta_row_timestamp",
        "mutation_upsert_compaction", "mutation_snapshot_read",
        "mutation_cdc_feed", "ddl_view_predicate", "ddl_sequence_rows",
        "ddl_index_scan", "q1_pricing_summary", "q9_product_profit",
        "dedup_minhash_lsh", "pipeline_curate_e2e", "bson_condition_sql",
        "source_csv_bulk_load", "mm_binary_meta",
        "agg_approx_count_distinct", "join_broadcast_left",
        "join_right_outer", "join_sort_merge_full", "join_cross",
        "join_semi", "join_anti", "filter_null_3vl", "filter_rvc_compare",
        "filter_like_escape", "scan_point_lookup", "scan_skip", "agg_having",
        "sort_rvc_offset_page", "setop_union_all", "subq_exists_correlated",
        "str_regexp", "math_round_floor_ceil", "dt_parse", "arr_unnest",
        "json_value", "bin_bytes_bits", "similarity_topk", "text_stats",
        "join_null_keys", "join_full_nonequi_residual", "dt_week_dayofweek",
        "cast_coerce_matrix", "bson_deep_update",
    }
)

ROUNDS: dict[str, frozenset[str]] = {
    "r02": R02, "r03": R03, "r04": R04, "r05": R05, "r06": R06, "r07": R07,
}


def latest_green_round() -> dict[str, str]:
    """Map each verified name to the MOST RECENT round it was driver-green.

    With every registry entry verified at least once (185/185 as of r07),
    the rotation's steady-state policy is oldest-evidence-first: re-verify
    the entries whose latest green round is furthest in the past, newest
    capabilities always leading the window.
    """
    out: dict[str, str] = {}
    for rname in sorted(ROUNDS):
        for n in ROUNDS[rname]:
            out[n] = rname
    return out


def driver_verified() -> frozenset[str]:
    """All names with at least one driver-green row in any completed round."""
    out: set[str] = set()
    for names in ROUNDS.values():
        out |= names
    return frozenset(out)
