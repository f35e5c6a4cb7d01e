"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline on sf0.001; ``queries()``
exposes every implemented operator/pipeline (SURVEY.md §2 coverage);
``oracle_sql()`` gives the exact DuckDB equivalent where SQL can
express the op (others get the driver's rows-only check and have
pytest oracles instead — see tests/).

Ray is initialised by the driver before this module is imported;
nothing here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gliner_ray.queries import corpus_ops as co  # noqa: E402
from gliner_ray.queries import graph_ops as go  # noqa: E402
from gliner_ray.queries import relational as rel  # noqa: E402


def entry() -> Any:
    """Flagship pipeline: synthesize the source-code `files` corpus
    (BASELINE.json input_hint shape), run the full KG construction
    (chunk → score → decode → link → triples), return the triples."""
    return co.kg_triples("/root/testdata/sf0.001")


# Last round in which the driver hash-confirmed each oracle query,
# DERIVED at import time from whichever CORRECTNESS_r*.json files
# exist next to this module — so the staleness record updates itself
# the moment the driver lands a new round's results, with no manual
# bookkeeping. Queries absent from every file (or only ever checked
# with an error) stay at 0 = never confirmed and sort first. Used to
# rotate the driver's leading-50 check window so every oracle gets an
# independent driver confirmation across rounds (round-3 verdict #1).
def _last_confirmed() -> dict[str, int]:
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for k, v in data.items():
            if isinstance(v, dict) and v.get("err") is None:
                last[k] = max(last.get(k, 0), rnd)
    return last


_LAST_CONFIRMED = _last_confirmed()


def queries() -> dict[str, Callable[[str], Any]]:
    """All implemented pipelines, ORDERED for the driver's leading
    check window: oracle-bearing entries first (rows-only after),
    and within the oracle-bearing set, never-driver-confirmed
    queries first, then stalest-confirmation-first (round-3 verdict
    item #1 — rotate so every oracle gets a green driver row by
    round 5). The split is computed from ``oracle_sql()`` itself so
    it can never drift; the staleness record is ``_LAST_CONFIRMED``."""
    all_q = _all_queries()
    sql = oracle_sql()
    order = list(all_q)
    oracle_keys = sorted(
        (k for k in order if k in sql),
        key=lambda k: (_LAST_CONFIRMED.get(k, 0), order.index(k)),
    )
    ordered = {k: all_q[k] for k in oracle_keys}
    ordered.update({k: v for k, v in all_q.items() if k not in sql})
    return ordered


def _all_queries() -> dict[str, Callable[[str], Any]]:
    return {
        # relational operator coverage (TPC-H-shaped)
        "q1_pricing_summary": rel.q1_pricing_summary,
        "q3_top_orders": rel.q3_top_orders,
        "q5_region_revenue": rel.q5_region_revenue,
        "q6_forecast_revenue": rel.q6_forecast_revenue,
        "q_top_orders_by_price": rel.q_top_orders_by_price,
        "q_distinct_segments": rel.q_distinct_segments,
        "q_segment_revenue": rel.q_segment_revenue,
        "q_events_hourly": rel.q_events_hourly,
        "q_user_sessions": rel.q_user_sessions,
        "q_brand_stats": rel.q_brand_stats,
        "q_priority_with_late_items": rel.q_priority_with_late_items,
        "q_customers_without_big_orders": rel.q_customers_without_big_orders,
        "q_customers_no_urgent_orders": rel.q_customers_no_urgent_orders,
        "q_rich_idle_customers_by_nation": rel.q_rich_idle_customers_by_nation,
        "q_asof_purchase_click": rel.q_asof_purchase_click,
        "q_user_rolling_1h": rel.q_user_rolling_1h,
        "q_value_bands": rel.q_value_bands,
        "q_daily_active_users": rel.q_daily_active_users,
        "q_top_orders_per_segment": rel.q_top_orders_per_segment,
        "q_approx_users_hll": rel.q_approx_users_hll,
        "q_price_quantiles": rel.q_price_quantiles,
        "q_price_quantile_sketch": rel.q_price_quantile_sketch,
        "q_order_quartiles": rel.q_order_quartiles,
        "q_flag_median_price": rel.q_flag_median_price,
        "q_flag_median_cont": rel.q_flag_median_cont,
        "q_events_pivot": rel.q_events_pivot,
        "q_lineitem_unpivot": rel.q_lineitem_unpivot,
        "q_qty_rollup": rel.q_qty_rollup,
        "q_qty_grouping_sets": rel.q_qty_grouping_sets,
        "q_qty_cube": rel.q_qty_cube,
        "q_user_event_gaps": rel.q_user_event_gaps,
        "q_user_cumulative_spend": rel.q_user_cumulative_spend,
        "q_price_percentile_cont": rel.q_price_percentile_cont,
        "q_cheapest_supplier_per_part": rel.q_cheapest_supplier_per_part,
        "q_priority_mode_by_status": rel.q_priority_mode_by_status,
        "q_user_moving_sum3": rel.q_user_moving_sum3,
        "q_events_by_type_salted": rel.q_events_by_type_salted,
        "q_hours_intersect": rel.q_hours_intersect,
        "q_hours_except": rel.q_hours_except,
        "q_top_orders_rank_ties": rel.q_top_orders_rank_ties,
        "q_orders_of_rich_customers": rel.q_orders_of_rich_customers,
        "q_customer_order_counts": rel.q_customer_order_counts,
        "q_props_k_sum": rel.q_props_k_sum,
        "q_order_ntile4": rel.q_order_ntile4,
        "q_order_percent_rank": rel.q_order_percent_rank,
        "q_order_cume_dist": rel.q_order_cume_dist,
        "q_order_dense_rank": rel.q_order_dense_rank,
        "q_flag_price_corr": rel.q_flag_price_corr,
        "q_flag_price_regr": rel.q_flag_price_regr,
        "q_flag_price_skew_kurt": rel.q_flag_price_skew_kurt,
        "q_hourly_click_purchase_full": rel.q_hourly_click_purchase_full,
        "q_priority_status_agg": rel.q_priority_status_agg,
        "q_active_keys_union": rel.q_active_keys_union,
        "q_price_mad": rel.q_price_mad,
        "q_user_first_last_event": rel.q_user_first_last_event,
        "q_user_funnel": rel.q_user_funnel,
        "q_orders_above_cust_avg": rel.q_orders_above_cust_avg,
        # text analysis
        "doc_token_count": co.doc_token_count,
        "doc_tokens_routed": co.doc_tokens_routed,
        "doc_text_stats": co.doc_text_stats,
        "doc_sha256": co.doc_sha256,
        "doc_lang_id": co.doc_lang_id,
        "doc_quality": co.doc_quality,
        "doc_lm_perplexity": co.doc_lm_perplexity,
        "doc_fingerprint": co.doc_fingerprint,
        "doc_pii_redact": co.doc_pii_redact,
        "doc_repetition": co.doc_repetition,
        "doc_decontam": co.doc_decontam,
        "doc_packing": co.doc_packing,
        # dedup family
        "doc_exact_dedup": co.doc_exact_dedup,
        "doc_curation": co.doc_curation,
        "doc_segment_dedup": co.doc_segment_dedup,
        "doc_substring_dups": co.doc_substring_dups,
        "doc_substring_rewrite": co.doc_substring_rewrite,
        "doc_minhash_dedup": co.doc_minhash_dedup,
        "doc_ngram_jaccard_dups": co.doc_ngram_jaccard_dups,
        "doc_simhash_dups": co.doc_simhash_dups,
        "emb_cosine_dups": co.emb_cosine_dups,
        "emb_exact_pairs": co.emb_exact_pairs,
        "emb_semantic_dedup": co.emb_semantic_dedup,
        # similarity search / clustering
        "emb_ann_topk": co.emb_ann_topk,
        "emb_ivf_topk": co.emb_ivf_topk,
        "emb_ivf_topk_full": co.emb_ivf_topk_full,
        "emb_kmeans": co.emb_kmeans,
        # graph analytics (degree / components / pagerank)
        "q_user_item_degree": go.q_user_item_degree,
        "graph_components": go.graph_components,
        "graph_pagerank": go.graph_pagerank,
        "graph_cf_pairs": go.graph_cf_pairs,
        "graph_triangles": go.graph_triangles,
        "graph_clustering_coeff": go.graph_clustering_coeff,
        "graph_kcore": go.graph_kcore,
        # round-4 additions: q21 shape, retention, chunking, editdist
        "q_suppliers_kept_waiting": rel.q_suppliers_kept_waiting,
        "q_user_retention": rel.q_user_retention,
        "doc_chunk_windows": co.doc_chunk_windows,
        "doc_editdist_pairs": co.doc_editdist_pairs,
        # round-4 additions: vocab build, event transitions, FK audit
        "doc_vocab": co.doc_vocab,
        "q_event_transitions": rel.q_event_transitions,
        "q_fk_orphans": rel.q_fk_orphans,
        "doc_incremental_dedup": co.doc_incremental_dedup,
        "q_user_value_ema": rel.q_user_value_ema,
        # round-5 additions: hopping window, sliding-window distinct
        "q_events_hopping": rel.q_events_hopping,
        "q_weekly_active_users": rel.q_weekly_active_users,
        "emb_dim_stats": co.emb_dim_stats,
        "q_nation_revenue_share": rel.q_nation_revenue_share,
        # multimodal plumbing
        "media_features": co.media_features,
        "media_near_dups": co.media_near_dups,
        # multitask pipelines (reference task API)
        "mt_classification": co.mt_classification,
        "mt_relation_triples": co.mt_relation_triples,
        "mt_summarize": co.mt_summarize,
        "doc_split_counts": co.doc_split_counts,
        "doc_stratified_sample": co.doc_stratified_sample,
        "doc_temperature_mixture": co.doc_temperature_mixture,
        "doc_source_mixture": co.doc_source_mixture,
        "doc_uniform_sample": co.doc_uniform_sample,
        "doc_global_shuffle": co.doc_global_shuffle,
        "doc_bm25_topk": co.doc_bm25_topk,
        "doc_term_pmi": co.doc_term_pmi,
        "doc_priority_sample": co.doc_priority_sample,
        "doc_corpus_report": co.doc_corpus_report,
        "doc_top_terms": co.doc_top_terms,
        "doc_heavy_terms": co.doc_heavy_terms,
        # knowledge-graph construction (reference-parity ops)
        "doc_gen_labels": co.doc_gen_labels,
        "doc_token_spans": co.doc_token_spans,
        "kg_mentions": co.kg_mentions,
        "kg_mentions_numpy": co.kg_mentions_numpy,
        "kg_mentions_safetensors": co.kg_mentions_safetensors,
        "kg_mentions_gen": co.kg_mentions_gen,
        "kg_triples": co.kg_triples,
        "kg_cooccurrence": co.kg_cooccurrence,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": rel.Q1_SQL,
        "q3_top_orders": rel.Q3_SQL,
        "q5_region_revenue": rel.Q5_SQL,
        "q6_forecast_revenue": rel.Q6_SQL,
        "q_top_orders_by_price": rel.TOP_ORDERS_SQL,
        "q_distinct_segments": rel.DISTINCT_SQL,
        "q_segment_revenue": rel.SEGMENT_REVENUE_SQL,
        "q_events_hourly": rel.EVENTS_HOURLY_SQL,
        "q_user_sessions": rel.USER_SESSIONS_SQL,
        "q_brand_stats": rel.BRAND_STATS_SQL,
        "q_priority_with_late_items": rel.PRIORITY_LATE_SQL,
        "q_customers_without_big_orders": rel.CUSTOMERS_NO_BIG_ORDERS_SQL,
        "q_customers_no_urgent_orders": rel.CUSTOMERS_NO_URGENT_SQL,
        "q_rich_idle_customers_by_nation": rel.RICH_IDLE_BY_NATION_SQL,
        "q_asof_purchase_click": rel.ASOF_PURCHASE_CLICK_SQL,
        "q_user_rolling_1h": rel.USER_ROLLING_SQL,
        "q_value_bands": rel.VALUE_BANDS_SQL,
        "q_daily_active_users": rel.DAILY_ACTIVE_SQL,
        "q_top_orders_per_segment": rel.TOP_PER_SEGMENT_SQL,
        "q_price_quantiles": rel.PRICE_QUANTILES_SQL,
        "q_price_quantile_sketch": rel.PRICE_QUANTILE_SKETCH_SQL,
        "q_order_quartiles": rel.ORDER_QUARTILES_SQL,
        "q_flag_median_price": rel.FLAG_MEDIAN_SQL,
        "q_flag_median_cont": rel.FLAG_MEDIAN_CONT_SQL,
        "q_events_pivot": rel.EVENTS_PIVOT_SQL,
        "q_lineitem_unpivot": rel.LINEITEM_UNPIVOT_SQL,
        "q_qty_rollup": rel.QTY_ROLLUP_SQL,
        "q_qty_grouping_sets": rel.QTY_GROUPING_SETS_SQL,
        "q_qty_cube": rel.QTY_CUBE_SQL,
        "q_user_event_gaps": rel.USER_EVENT_GAPS_SQL,
        "q_user_cumulative_spend": rel.USER_CUMULATIVE_SPEND_SQL,
        "q_price_percentile_cont": rel.PRICE_PERCENTILE_CONT_SQL,
        "q_cheapest_supplier_per_part": rel.CHEAPEST_SUPPLIER_SQL,
        "q_priority_mode_by_status": rel.PRIORITY_MODE_SQL,
        "q_user_moving_sum3": rel.USER_MOVING_SUM3_SQL,
        "q_events_by_type_salted": rel.EVENTS_BY_TYPE_SALTED_SQL,
        "q_hours_intersect": rel.HOURS_INTERSECT_SQL,
        "q_hours_except": rel.HOURS_EXCEPT_SQL,
        "q_top_orders_rank_ties": rel.TOP_ORDERS_RANK_TIES_SQL,
        "q_orders_of_rich_customers": rel.ORDERS_RICH_CUSTOMERS_SQL,
        "q_customer_order_counts": rel.CUSTOMER_ORDER_COUNTS_SQL,
        "q_props_k_sum": rel.PROPS_K_SUM_SQL,
        "q_order_ntile4": rel.ORDER_NTILE4_SQL,
        "q_order_percent_rank": rel.ORDER_PERCENT_RANK_SQL,
        "q_order_cume_dist": rel.ORDER_CUME_DIST_SQL,
        "q_order_dense_rank": rel.ORDER_DENSE_RANK_SQL,
        "q_flag_price_corr": rel.FLAG_PRICE_CORR_SQL,
        "q_flag_price_regr": rel.FLAG_PRICE_REGR_SQL,
        "q_flag_price_skew_kurt": rel.FLAG_PRICE_SKEW_KURT_SQL,
        "q_hourly_click_purchase_full": rel.HOURLY_CLICK_PURCHASE_FULL_SQL,
        "q_priority_status_agg": rel.PRIORITY_STATUS_AGG_SQL,
        "q_active_keys_union": rel.ACTIVE_KEYS_UNION_SQL,
        "q_price_mad": rel.PRICE_MAD_SQL,
        "q_user_first_last_event": rel.USER_FIRST_LAST_SQL,
        "q_user_funnel": rel.USER_FUNNEL_SQL,
        "q_orders_above_cust_avg": rel.ORDERS_ABOVE_CUST_AVG_SQL,
        "doc_token_count": co.TOKEN_COUNT_SQL,
        "doc_tokens_routed": co.TOKENS_ROUTED_SQL,
        "doc_text_stats": co.TEXT_STATS_SQL,
        "doc_sha256": co.SHA256_SQL,
        "doc_lang_id": co.LANG_ID_SQL,
        "mt_classification": co.MT_CLASSIFICATION_SQL,
        "doc_lm_perplexity": co.LM_PERPLEXITY_SQL,
        "emb_kmeans": co.EMB_KMEANS_SQL,
        "emb_ivf_topk": co.IVF_TOPK_SQL,
        "emb_semantic_dedup": co.SEMANTIC_DEDUP_SQL,
        "q_approx_users_hll": rel.APPROX_USERS_HLL_SQL,
        "doc_quality": co.QUALITY_SQL,
        "doc_pii_redact": co.PII_REDACT_SQL,
        "doc_repetition": co.REPETITION_SQL,
        "doc_decontam": co.DECONTAM_SQL,
        "doc_fingerprint": co.FINGERPRINT_SQL,
        "doc_packing": co.PACKING_SQL,
        "doc_split_counts": co.SPLIT_COUNTS_SQL,
        "doc_stratified_sample": co.STRATIFIED_SAMPLE_SQL,
        "doc_temperature_mixture": co.TEMPERATURE_MIXTURE_SQL,
        "doc_source_mixture": co.SOURCE_MIXTURE_SQL,
        "doc_uniform_sample": co.UNIFORM_SAMPLE_SQL,
        "doc_global_shuffle": co.GLOBAL_SHUFFLE_SQL,
        "doc_bm25_topk": co.BM25_TOPK_SQL,
        "doc_term_pmi": co.TERM_PMI_SQL,
        "doc_priority_sample": co.PRIORITY_SAMPLE_SQL,
        "doc_corpus_report": co.CORPUS_REPORT_SQL,
        "doc_top_terms": co.TOP_TERMS_SQL,
        "doc_heavy_terms": co.HEAVY_TERMS_SQL,
        "doc_exact_dedup": co.EXACT_DEDUP_SQL,
        "doc_curation": co.CURATION_SQL,
        "doc_segment_dedup": co.SEGMENT_DEDUP_SQL,
        "q_user_item_degree": go.USER_ITEM_DEGREE_SQL,
        "graph_components": go.GRAPH_COMPONENTS_SQL,
        "graph_pagerank": go.GRAPH_PAGERANK_SQL,
        "graph_cf_pairs": go.GRAPH_CF_PAIRS_SQL,
        "graph_triangles": go.GRAPH_TRIANGLES_SQL,
        "graph_clustering_coeff": go.GRAPH_CLUSTERING_COEFF_SQL,
        "graph_kcore": go.GRAPH_KCORE_SQL,
        "q_suppliers_kept_waiting": rel.SUPPLIERS_KEPT_WAITING_SQL,
        "q_user_retention": rel.USER_RETENTION_SQL,
        "doc_chunk_windows": co.DOC_CHUNK_WINDOWS_SQL,
        "doc_editdist_pairs": co.DOC_EDITDIST_PAIRS_SQL,
        "doc_vocab": co.VOCAB_SQL,
        "q_event_transitions": rel.EVENT_TRANSITIONS_SQL,
        "q_fk_orphans": rel.FK_ORPHANS_SQL,
        "doc_incremental_dedup": co.INCREMENTAL_DEDUP_SQL,
        "q_user_value_ema": rel.USER_VALUE_EMA_SQL,
        "q_events_hopping": rel.EVENTS_HOPPING_SQL,
        "q_weekly_active_users": rel.WEEKLY_ACTIVE_SQL,
        "emb_dim_stats": co.EMB_DIM_STATS_SQL,
        "q_nation_revenue_share": rel.NATION_REVENUE_SHARE_SQL,
        "emb_ann_topk": co.ANN_TOPK_SQL,
        "emb_ivf_topk_full": co.ANN_TOPK_SQL,
        "emb_exact_pairs": co.EXACT_PAIRS_SQL,
    }
