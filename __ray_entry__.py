"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (documents → inverted index → BM25
top-k via the query actor pool) on sf0.001. ``queries()`` exposes one
callable per implemented operator/pipeline from SURVEY.md §2;
``oracle_sql()`` the matching DuckDB SQL (omitted for non-SQL-expressible
ops — BM25 ranking, index internals — which the driver checks rows-only
and pytest checks against the in-repo brute-force oracle).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in baram_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from baram_ray.pipelines import analytics as anap
from baram_ray.pipelines import documents as docp
from baram_ray.pipelines import events as evp
from baram_ray.pipelines import knowledge as knowp
from baram_ray.pipelines import search as searchp
from baram_ray.pipelines import tpch as tpchp
from baram_ray.pipelines import training as trainp
from baram_ray.pipelines.oracles import ORACLES


def _clean_stats(sf_dir: str):
    from baram_ray.pipelines.clean import clean_corpus_stats
    return clean_corpus_stats(sf_dir)


def entry() -> Any:
    """Flagship: sf0.001 documents → index build (resume-aware) → batched
    BM25 top-k through the actor pool; returns (query_id, rank, doc_id,
    score) rows."""
    return searchp.bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from baram_ray.pipelines.schemas import with_declared_schema
    q = {
        # documents table (G1/G2 aggregations, D2 dedup, K4 sort, M7 tokens)
        "doc_lang_counts": docp.lang_counts,
        "doc_source_counts": docp.source_counts,
        "doc_stats": docp.doc_stats,
        "doc_dedup_exact": docp.dedup_exact,
        "doc_top_longest": docp.top_longest,
        "doc_token_count": docp.token_count_ws,
        "doc_token_count_bpe": docp.token_count_bpe,
        "doc_term_df_top": docp.term_df_top,
        "doc_top_bigrams": docp.top_bigrams,
        "events_value_hour_corr": evp.value_hour_corr,
        "doc_zipf_slope": docp.zipf_slope,
        "doc_ttr": docp.ttr,
        "doc_unk_stats": docp.unk_stats,
        "doc_export_partitioned": docp.export_partitioned,
        # events time-series (G4 SMA, G5 spikes, G8 top-k)
        "events_type_agg": evp.type_agg,
        "events_daily_counts": evp.daily_counts,
        "events_sma7": evp.sma7,
        "events_spikes": evp.spikes,
        "events_pct_change": evp.pct_change,
        "events_alerts": evp.alerts,
        "events_source_failures": evp.source_failures,
        "events_user_topk": evp.user_topk,
        "events_sessions": evp.sessionize,
        "events_session_stats": evp.session_stats,
        "events_session_error_overlap": evp.session_error_overlap,
        "events_funnel": evp.funnel,
        "events_retention": evp.retention,
        "events_user_lifetime": evp.user_lifetime,
        "tpch_q16": tpchp.q16_supplier_variety,
        "tpch_revenue_rollup": tpchp.revenue_rollup,
        "events_heatmap": evp.activity_heatmap,
        "events_transitions": evp.transitions,
        "events_dau_wau": evp.dau_wau,
        "search_count": searchp.search_count,
        "events_asof_click": evp.asof_purchase_click,
        "events_value_median": evp.value_median,
        "events_value_quantiles": evp.value_quantiles,
        "events_value_quantiles_sketch": evp.value_quantiles_sketch,
        "events_value_hist": evp.value_hist,
        "events_value_stats": evp.value_stats,
        "events_value_outliers_mad": evp.value_outliers_mad,
        "events_forecast_holt": evp.forecast_holt,
        "events_user_gini": evp.user_gini,
        "events_distinct_kmv": evp.distinct_kmv,
        "events_user_freq_cms": evp.user_freq_cms,
        "events_daily_click_purchase": evp.daily_click_purchase,
        "events_daily_pivot": evp.daily_pivot,
        "events_user_seq": evp.user_event_seq,
        "events_hopping_counts": evp.hopping_counts,
        "events_comments_stats": evp.comments_stats,
        # TPC-H-ish (scan/filter/derive/groupby/broadcast-join/top-k)
        "tpch_q1": tpchp.q1_pricing,
        "tpch_orders_by_status": tpchp.orders_by_status,
        "tpch_revenue_by_nation": tpchp.revenue_by_nation,
        "tpch_top_parts": tpchp.top_parts_by_revenue,
        "tpch_q3": tpchp.q3_shipping_priority,
        "tpch_q5": tpchp.q5_local_supplier_volume,
        "tpch_q6": tpchp.q6_forecast_revenue,
        "tpch_q18": tpchp.q18_large_orders,
        "tpch_q10": tpchp.q10_returned_items,
        "tpch_q4": tpchp.q4_order_priority,
        "tpch_q12": tpchp.q12_priority_by_status,
        "tpch_q14": tpchp.q14_promo_revenue,
        "tpch_q13": tpchp.q13_customer_distribution,
        "tpch_supplier_by_nation": tpchp.supplier_by_nation,
        "tpch_orders_top": tpchp.orders_top_totalprice,
        "tpch_part_brand_stats": tpchp.part_brand_stats,
        "tpch_q7": tpchp.q7_volume_shipping,
        "tpch_q15": tpchp.q15_top_supplier,
        "tpch_q17": tpchp.q17_small_quantity_revenue,
        "tpch_q19": tpchp.q19_discounted_revenue,
        "tpch_q22": tpchp.q22_global_sales_opportunity,
        "tpch_q2": tpchp.q2_min_cost_supplier,
        "tpch_q8": tpchp.q8_market_share,
        "tpch_q9": tpchp.q9_product_type_profit,
        "tpch_q11": tpchp.q11_important_stock,
        "tpch_q20": tpchp.q20_part_promotion,
        "tpch_q21": tpchp.q21_waiting_suppliers,
        "tpch_cube_status_priority": tpchp.cube_status_priority,
        "events_topn_per_user": evp.topn_per_user,
        "events_inter_deltas": evp.inter_event_deltas,
        "events_running_total": evp.running_daily_total,
        "events_running_value": evp.running_value,
        "events_value_ntile": evp.value_ntile,
        # full-text core (non-SQL: checked rows-only here, rank-identity
        # vs the brute-force oracle in tests/test_index_e2e.py)
        "search_bm25_topk": searchp.bm25_topk,
        "search_bm25_sharded": searchp.bm25_topk_sharded,
        "search_hybrid_topk": searchp.hybrid_topk,
        "search_hybrid_rrf": searchp.hybrid_rrf_topk,
        "search_hybrid_hnsw": searchp.hybrid_topk_hnsw,
        "search_facets": searchp.search_facets,
        "search_facet_hist": searchp.search_facet_hist,
        "search_agg_stats": searchp.search_agg_stats,
        "search_agg_range": searchp.search_agg_range,
        "search_agg_terms_stats": searchp.search_agg_terms_stats,
        "search_multi_match_docs": searchp.search_multi_match_docs,
        "search_sorted_paged": searchp.search_sorted_paged,
        "search_sorted_docs": searchp.search_sorted_docs,
        "search_collapse_docs": searchp.search_collapse_docs,
        "search_qs_docs": searchp.search_qs_docs,
        "search_compound_docs": searchp.search_compound_docs,
        "regexp_match_docs": searchp.regexp_match_docs,
        "search_dsl_sorted": searchp.search_dsl_sorted,
        "search_collapse_latest": searchp.search_collapse_latest,
        "search_date_histogram": searchp.search_date_histogram,
        "search_percentiles": searchp.search_percentiles,
        "search_top_hits": searchp.search_top_hits,
        "search_sigtext": searchp.search_sigtext,
        "dismax_match_docs": searchp.dismax_match_docs,
        "phrase_prefix_docs": searchp.phrase_prefix_docs,
        "search_constant_score": searchp.search_constant_score,
        "search_composite_pages": searchp.search_composite_pages,
        "search_function_score": searchp.search_function_score,
        "nested_bool_docs": searchp.nested_bool_docs,
        "terms_filter_docs": searchp.terms_filter_docs,
        "search_rescore_topk": searchp.search_rescore_topk,
        "search_boosting_topk": searchp.search_boosting_topk,
        "search_filters_agg": searchp.search_filters_agg,
        "search_dh_pipeline": searchp.search_dh_pipeline,
        "span_near_docs": searchp.span_near_docs,
        "synonym_match_docs": searchp.synonym_match_docs,
        "ids_filter_docs": searchp.ids_filter_docs,
        "doc_termvectors": searchp.doc_termvectors,
        "stemmed_match_docs": searchp.stemmed_match_docs,
        "search_script_score": searchp.search_script_score,
        "search_date_range_agg": searchp.search_date_range_agg,
        "search_adjacency_matrix": searchp.search_adjacency_matrix,
        "span_first_docs": searchp.span_first_docs,
        "span_not_docs": searchp.span_not_docs,
        "search_bucket_script": searchp.search_bucket_script,
        "search_sibling_stats": searchp.search_sibling_stats,
        "search_percolate": searchp.search_percolate,
        "percolate_dsl_docs": searchp.percolate_dsl_docs,
        "search_suggest": searchp.search_suggest,
        "search_mlt": searchp.search_mlt,
        "search_bm25_filtered": searchp.bm25_filtered,
        "search_bm25_daterange": searchp.bm25_daterange,
        "search_term_range": searchp.term_range,
        "search_bm25_highlights": searchp.bm25_highlights,
        "search_bm25_paged": searchp.bm25_paged,
        "search_phrase_topk": searchp.phrase_topk,
        "phrase_match_docs": searchp.phrase_match_docs,
        "search_phrase_slop_topk": searchp.phrase_slop_topk,
        "phrase_slop_match_docs": searchp.phrase_slop_match_docs,
        "search_bool_topk": searchp.bool_topk,
        "bool_match_docs": searchp.bool_match_docs,
        "search_prefix_topk": searchp.prefix_topk,
        "prefix_match_docs": searchp.prefix_match_docs,
        "search_wildcard_topk": searchp.wildcard_topk,
        "wildcard_match_docs": searchp.wildcard_match_docs,
        "search_fuzzy_topk": searchp.fuzzy_topk,
        "fuzzy_match_docs": searchp.fuzzy_match_docs,
        "delete_by_query_docs": searchp.delete_by_query_docs,
        "search_index_stats": searchp.index_stats,
        "search_build_metrics": searchp.build_metrics,
        "search_term_stats": searchp.index_term_stats,
        # dedup family (D1/D2 + near-dup extensions)
        "dedup_minhash": trainp.dedup_minhash,
        "dedup_simhash": trainp.dedup_simhash,
        "dedup_ngram_jaccard": trainp.dedup_ngram_jaccard,
        "dedup_jaccard_clusters": trainp.dedup_jaccard_clusters,
        "dedup_fingerprint": trainp.dedup_fingerprint,
        # similarity search over embeddings (K2 native)
        "sim_knn_bruteforce": trainp.sim_knn_bruteforce,
        "sim_range_search": trainp.sim_range_search,
        "sim_knn_lsh": trainp.sim_knn_lsh,
        "sim_knn_ivf": trainp.sim_knn_ivf,
        "sim_knn_ivf_indexed": trainp.sim_knn_ivf_indexed,
        "sim_knn_hnsw": trainp.sim_knn_hnsw,
        "sim_knn_pq": trainp.sim_knn_pq,
        "sim_neardup_pairs": trainp.sim_neardup_pairs,
        "sim_neardup_lsh": trainp.sim_neardup_lsh,
        "sim_centroid_assign": trainp.sim_centroid_assign,
        "sim_kmeans": trainp.sim_kmeans,
        "doc_quality_model": trainp.doc_quality_model,
        "sim_semdedup": trainp.sim_semdedup,
        "doc_dsir_sample": trainp.doc_dsir_sample,
        "doc_bpe_merges": trainp.doc_bpe_merges,
        "doc_bpe_token_count": trainp.doc_bpe_token_count,
        # M3 format-dispatch parse chain
        "doc_parse_dispatch": trainp.doc_parse_dispatch,
        "doc_sample_hash": trainp.doc_sample_hash,
        "doc_sample_stratified": trainp.doc_sample_stratified,
        "doc_split_counts": trainp.doc_split_counts,
        "doc_mix_weighted": trainp.doc_mix_weighted,
        "doc_mix_adaptive": trainp.doc_mix_adaptive,
        "doc_pack_bins": trainp.doc_pack_bins,
        "doc_decontam": trainp.doc_decontam,
        "doc_shuffle_head": trainp.doc_shuffle_head,
        "clean_corpus_stats": _clean_stats,
        "doc_repetition": trainp.doc_repetition,
        "doc_lm_score": trainp.doc_lm_score,
        "doc_heavy_terms": trainp.doc_heavy_terms,
        "doc_distinct_hll": trainp.doc_distinct_hll,
        "doc_unigram_vocab": trainp.doc_unigram_vocab,
        "doc_unigram_token_count": trainp.doc_unigram_token_count,
        "search_cardinality_hll": searchp.search_cardinality_hll,
        "search_extended_stats": searchp.search_extended_stats,
        "search_weighted_avg": searchp.search_weighted_avg,
        "search_multi_terms": searchp.search_multi_terms,
        "search_rare_terms": searchp.search_rare_terms,
        "search_dh_empty_buckets": searchp.search_dh_empty_buckets,
        "search_percentile_ranks": searchp.search_percentile_ranks,
        "search_boxplot": searchp.search_boxplot,
        "search_sampler": searchp.search_sampler,
        "doc_dup_spans": trainp.doc_dup_spans,
        "doc_dup_spans_removed": trainp.doc_dup_spans_removed,
        "text_pii": trainp.text_pii,
        "doc_tfidf_top": trainp.doc_tfidf_top,
        # embedding prep (M16 + A1 actor-pool inference shape)
        "doc_embed_prep": trainp.doc_embed_prep,
        "doc_embed_vectors": trainp.doc_embed_vectors,
        # text analysis (M1/M2 sanitize + training-data scoring)
        "text_langid": trainp.text_langid,
        "text_quality": trainp.text_quality,
        "text_fingerprint": trainp.text_fingerprint,
        "text_sanitize": trainp.text_sanitize,
        # multimodal plumbing (stubbed decode, real Ray shape)
        "multimodal_decode": trainp.multimodal_decode,
        "multimodal_native": trainp.multimodal_native,
        "multimodal_frames": trainp.multimodal_frames,
        "multimodal_resize": trainp.multimodal_resize,
        # analytics (G6 velocity, G7 minmax, G9 PMI, G10 cluster stats)
        "events_velocity": anap.events_velocity,
        "events_minmax": anap.events_minmax,
        "doc_cooccur_pmi": anap.doc_cooccur_pmi,
        "cluster_label_stats": anap.cluster_label_stats,
        # extraction (M8 chunker, M9+M11 NER, M18 JSON)
        "doc_chunks": anap.doc_chunks,
        "text_ner": anap.text_ner,
        "events_props_json": anap.events_props_json,
        "text_entity_link": anap.text_entity_link,
        "entity_related": anap.entity_related,
        "entity_pagerank": anap.entity_pagerank,
        "entity_top": anap.entity_top,
        # knowledge graph (M10 relations, G3 triple stats, S10 RDF
        # writers) + event cluster formation (S9 JSON writer)
        "text_relations": knowp.text_relations,
        "triple_stats": knowp.triple_stats,
        "rdf_export_nt": knowp.rdf_export_nt,
        "doc_markdown_export": knowp.doc_markdown_export,
        "doc_markdown_roundtrip": knowp.doc_markdown_roundtrip,
        "cluster_events": knowp.cluster_events,
        "cluster_summaries": knowp.cluster_summaries,
        "text_said_relations": knowp.text_said_relations,
        # shuffled joins (§2.4 inner + anti)
        "join_orders_cust_segment": anap.join_orders_cust_segment,
        "join_anti_cust_no_orders": anap.join_anti_cust_no_orders,
        "events_range_clicks": evp.range_count_clicks,
    }
    # empty-input schema restoration (see pipelines/schemas.py): a
    # query over a 0-row table must still return its declared columns
    return {k: with_declared_schema(k, fn) for k, fn in q.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
