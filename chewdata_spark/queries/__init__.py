"""Query registry: every implemented operator exposed as a named query.

Each submodule defines ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]`` (DuckDB-runnable ANSI SQL producing the
same rows/columns).  Names without an oracle entry are genuinely
non-SQL-expressible (randomized LSH bucketing etc.) and get a
rows-only check from the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    from chewdata_spark.queries import (
        analytics,
        chewdata_ops,
        curation_queries,
        dedup_queries,
        extra,
        relational,
        similarity_queries,
        text_queries,
        timeseries_queries,
        tokenize_queries,
        tpch_extra,
        tpch_rest,
    )  # noqa: F401

    return (
        relational,
        tpch_extra,
        tpch_rest,
        chewdata_ops,
        dedup_queries,
        similarity_queries,
        text_queries,
        curation_queries,
        timeseries_queries,
        tokenize_queries,
        analytics,
        extra,
    )


# Names the correctness driver has already hard-checked in some round
# (union of CORRECTNESS_r01..r07 keys).  The driver samples ~50 names
# per round in registry order, so all_queries() leads with the NAMES
# NOT in this set — never-sampled queries get driver coverage first and
# the backlog drains round over round.  Update after each round.
_DRIVER_CHECKED = {
    "ann_ivfpq_topk", "ann_srp_topk", "ann_srp_topk_md5",
    "approx_distinct_users", "best_of_source_sample", "bigram_logprob_score",
    "bloom_seen_hashes", "bm25_search_topk", "ccnet_perplexity_buckets",
    "cdc_chunk_dedup", "char_entropy_junk_filter", "chunk_documents",
    "churned_customers", "classifier_quality_filter",
    "contamination_ranked_pairs", "content_fingerprint",
    "copurchase_communities", "copurchase_kcore", "copurchase_triangles",
    "corpus_diff_manifest", "corpus_manifest", "corpus_summary_report",
    "corpus_top_terms", "corpus_vocab_ids", "cosine_topk",
    "cube_order_stats", "curate_corpus", "curate_pipeline_full",
    "curation_audit_report", "curriculum_phases", "customer_order_stats",
    "customers_with_open_orders", "customers_without_orders",
    "decontaminate_docs", "dedup_clean_corpus", "dedup_clean_corpus_cc",
    "dedup_clean_corpus_lsh", "dedup_clean_corpus_lsh_cc",
    "dedup_clean_corpus_lsh_cc_md5", "dedup_clean_corpus_semantic",
    "dedup_cluster_components", "dedup_consensus_pairs",
    "dedup_containment_md5", "dedup_cut_spans_corpus",
    "dedup_duplicate_spans", "dedup_exact", "dedup_fingerprint",
    "dedup_incremental_ingest", "dedup_incremental_ingest_md5",
    "dedup_lines_global", "dedup_lines_within_doc", "dedup_minhash_lsh",
    "dedup_minhash_lsh_md5", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_simhash_md5", "distinct_users_by_type", "documents_redact_pii",
    "documents_strip_boilerplate", "doremi_source_weights",
    "dpo_preference_pairs", "dsir_importance", "embedding_anisotropy_report",
    "embedding_centroids", "embedding_debias_abtt", "embedding_near_dup",
    "embedding_outliers_mahalanobis", "embedding_pc1", "error_channel_split",
    "event_transition_matrix", "events_anomaly_mad", "events_asof_orders",
    "events_cusum_drift", "events_ewma_daily", "events_gap_fill",
    "events_heatmap_dow_hour", "events_histogram_equidepth",
    "events_hourly_rollup", "events_missing_props", "events_ohlc_hourly",
    "events_props_extract", "events_props_variant", "events_quantile_sketch",
    "events_rolling_24h", "events_seasonal_decompose", "events_sliding_rate",
    "events_value_zscore", "events_winsorized", "filter_agreement_matrix",
    "filter_docs_logprob", "fingerprint_winnowing", "generator_duplicate",
    "generator_faker", "gopher_quality_report", "hard_negatives_topk",
    "hashed_bow_features", "hybrid_search_topk", "kmeans_centroids_2iter",
    "language_id", "language_id_confusion", "length_bucket_batches",
    "loyal_customers", "market_basket_pairs", "mix_corpus_weighted",
    "ngram_novelty_probe", "normalize_documents", "pack_sequences",
    "packed_sequence_layout", "part_name_similarity", "parts_in_price_band",
    "pivot_order_status", "pq_code_embeddings", "price_percentiles",
    "q10_returned_items", "q11_important_parts", "q12_ship_delay_priority",
    "q13_customer_order_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_count", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_disjunctive_revenue",
    "q1_pricing_summary", "q20_dominant_shippers", "q21_waiting_orders",
    "q22_dormant_rich_customers", "q2_min_cost_supplier",
    "q3_shipping_priority", "q4_late_order_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q9_profit_by_nation", "qty_price_correlation",
    "quality_score", "quantize_embeddings", "referential_lookup",
    "repetition_stats", "rollup_revenue", "rrf_fusion_topk",
    "running_daily_revenue", "salted_event_stats", "sentence_segments",
    "sessionize_events", "sft_loss_mask_layout", "shard_shuffle_corpus",
    "source_concentration_hhi", "source_distinctive_terms",
    "source_dup_rate", "source_overlap_matrix", "source_quota_sample",
    "source_vocab_health", "split_embedding_leakage", "split_leakage_audit",
    "split_train_val_test", "stratified_sample", "stream_classifier_scores",
    "stream_corpus_manifest", "stream_curate_corpus", "stream_events_hourly",
    "stream_ingest_dedup", "temperature_mix_weights", "text_stats",
    "tfidf_keywords", "token_counts", "tokenizer_fertility",
    "top_orders_per_customer", "top_value_orders", "training_mix_schedule",
    "transformer_actions", "unigram_logprob", "url_canonicalize_dedup",
    "validator_rules", "weighted_sample_quality",
}


# Never-driver-sampled names as of the round-8 open (registry minus
# CORRECTNESS_r01..r07, in registry order).  Pinned explicitly so that
# queries ADDED during round 8 slot in AFTER this backlog: the driver
# samples ~50 names per round from the front of all_queries(), and the
# backlog must drain before brand-new names consume sample slots.
_DRIVER_BACKLOG = (
    "embedding_near_dup_clustered", "ann_ivf_topk", "nb_train_quality_weights",
    "nb_quality_scores", "dataset_card_manifest", "tokenize_documents",
    "corpus_zipf_fit", "countmin_sketch_terms", "bpe_merge_rules",
    "bpe_encode_documents", "fim_transform_documents", "vocab_coverage_curve",
    "heaps_law_fit", "unigram_lm_pieces", "signup_conversion_funnel",
    "user_retention_cohorts", "pagerank_order_graph",
    "distinct_users_linear_count", "hll_distinct_users_md5",
    "stream_hll_distinct_users", "monthly_revenue_trend",
    "supplier_reliability", "customer_rfm_segments", "parts_pareto_8020",
    "table_stats_report", "join_cardinality_estimate", "parts_skyline",
    "kmv_set_intersection", "multigrain_distinct_hll",
    "stream_view_to_purchase", "stream_sessionize_events", "user_event_gaps",
    "orders_near_price_left", "chunk_documents_udtf",
    "order_priority_grouping_sets", "customer_spend_quartiles",
    "part_name_tokens", "documents_profile", "media_decode_dims",
    "media_dhash_dedup", "stream_media_dhash_dedup", "stream_events_zscore",
    "docs_embeddings_alignment", "orders_upsert_merge", "user_state_history",
    "video_frame_sample_report", "zorder_layout_audit", "shuffle_skew_audit",
    "forget_users_audit", "k_anonymity_report", "dp_noisy_counts",
)


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _modules():
        merged.update(mod.QUERIES)
    out = {n: merged[n] for n in _DRIVER_BACKLOG if n in merged}
    out.update(
        (n, f) for n, f in merged.items()
        if n not in _DRIVER_CHECKED and n not in out
    )
    out.update((n, f) for n, f in merged.items() if n in _DRIVER_CHECKED)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out


def query_index_markdown() -> str:
    """docs/QUERIES.md content: the grouped index of every registered
    query with oracle status and first docstring line (regenerate with
    `python scripts/gen_query_index.py`; tests assert freshness)."""
    oracles = set(all_oracles())
    out = [
        "# Query index (auto-generated — `python scripts/gen_query_index.py`)",
        "",
        "`oracle` = full DuckDB value-hash check; `rows` = rows-only driver",
        "check (recall-tested against an exact or portable twin — see",
        "docs/VERIFICATION.md).",
        "",
    ]
    body = []
    total = n_oracle = 0
    for mod in _modules():
        body.append(f"## {mod.__name__.split('.')[-1]}")
        body.append("")
        body.append("| query | check | what |")
        body.append("|---|---|---|")
        for qname in sorted(mod.QUERIES):
            doc = (mod.QUERIES[qname].__doc__ or "").strip()
            line = doc.split("\n")[0].strip().rstrip(".") or "—"
            kind = "oracle" if qname in oracles else "rows"
            total += 1
            n_oracle += qname in oracles
            body.append(f"| `{qname}` | {kind} | {line} |")
        body.append("")
    out.append(f"**{total} queries, {n_oracle} oracle-backed.**")
    out.append("")
    out.extend(body)
    return "\n".join(out) + "\n"
