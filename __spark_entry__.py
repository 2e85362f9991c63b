"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship extraction query on sf0.001.
`queries()` maps every implemented operator (SURVEY.md §2 + the
training-data-pipeline additions) to a (spark, sf_dir) callable;
`oracle_sql()` gives the DuckDB-equivalent SQL for each (omitted only for
approx_distinct_users / ann_ivf_topk / media_features, whose sketch/ML
internals have no SQL twin — the driver records rows-only checks there).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from document_ai_spark import queries as Q  # noqa: E402
from document_ai_spark import queries_ml as M  # noqa: E402
from document_ai_spark import queries_pipeline as P  # noqa: E402
from document_ai_spark import queries_spatial as SP  # noqa: E402
from document_ai_spark import queries_tuning as TU  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: byte-exact HTML main-content extraction over sf0.001."""
    return P.q_extract_article(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # extraction pipeline (the graft itself)
        "extract_article": P.q_extract_article,
        "extract_pdf": P.q_extract_pdf,
        "extract_validate": P.q_extract_validate,
        "extract_confusion": P.q_extract_confusion,
        "extract_spans": P.q_extract_spans,
        "extract_blocks": P.q_extract_blocks,
        # relational operator inventory (SURVEY.md §2)
        "pricing_summary": Q.q_pricing_summary,
        "region_revenue": Q.q_region_revenue,
        "top_order_per_customer": Q.q_top_order_per_customer,
        "user_sessions": Q.q_user_sessions,
        "asof_last_view": Q.q_asof_last_view,
        "fuzzy_nation_pairs": Q.q_fuzzy_nation_pairs,
        "keyword_containment": Q.q_keyword_containment,
        "confusion_by_lang": Q.q_confusion_by_lang,
        "grouping_sets_events": Q.q_grouping_sets_events,
        "cheapest_supplier_per_bucket": Q.q_cheapest_supplier_per_bucket,
        "setops_customers": Q.q_setops_customers,
        "json_props": Q.q_json_props,
        "nearest_price_parts": Q.q_nearest_price_parts,
        "distinct_suppliers": Q.q_distinct_suppliers,
        "running_value": Q.q_running_value,
        "nearest_click_after_error": Q.q_nearest_click_after_error,
        "customer_order_counts": Q.q_customer_order_counts,
        "semi_anti_gate": Q.q_semi_anti_gate,
        "collect_statuses": Q.q_collect_statuses,
        "approx_distinct_users": Q.q_approx_distinct_users,
        "interval_union": Q.q_interval_union,
        "pivot_order_status": Q.q_pivot_order_status,
        "small_quantity_revenue": Q.q_small_quantity_revenue,
        "session_window_agg": Q.q_session_window_agg,
        "min_cost_supplier_per_part": Q.q_min_cost_supplier_per_part,
        "dominant_suppliers": Q.q_dominant_suppliers,
        # training-data pipeline operators
        "dedup_exact": M.q_dedup_exact,
        "minhash_signatures": M.q_minhash_signatures,
        "minhash_lsh_pairs": M.q_minhash_lsh_pairs,
        "ngram_jaccard_probe": M.q_ngram_jaccard_probe,
        "ann_cosine_topk": M.q_ann_cosine_topk,
        "embedding_near_dups": M.q_embedding_near_dups,
        "embedding_near_dups_lsh": M.q_embedding_near_dups_lsh,
        "simhash": M.q_simhash,
        "ann_lsh_buckets": M.q_ann_lsh_buckets,
        "ann_ivf_topk": M.q_ann_ivf_topk,
        "dedup_clusters": M.q_dedup_clusters,
        "lang_id": M.q_lang_id,
        "quality_score": M.q_quality_score,
        "token_count": M.q_token_count,
        "fingerprint": M.q_fingerprint,
        "top_terms": M.q_top_terms,
        "char_entropy": M.q_char_entropy,
        "dup_ngram_ratio": M.q_dup_ngram_ratio,
        "ann_lsh_recall": M.q_ann_lsh_recall,
        "quality_gopher": M.q_quality_gopher,
        "pii_scrub": M.q_pii_scrub,
        "training_mix": M.q_training_mix,
        "curation_funnel": M.q_curation_funnel,
        "next_word_after_key": M.q_next_word_after_key,
        "next_right_word_2d": SP.q_next_right_word_2d,
        "fuzzy_key_next_right": SP.q_fuzzy_key_next_right,
        "winnow_fingerprint": M.q_winnow_fingerprint,
        "best_config_per_metric": TU.q_best_config_per_metric,
        "best_config_by_lang": TU.q_best_config_by_lang,
        "media_features": M.q_media_features,
        "frame_samples": M.q_frame_samples,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_article": P.SQL_EXTRACT_ARTICLE,
        "extract_pdf": P.SQL_EXTRACT_PDF,
        "extract_validate": P.SQL_EXTRACT_VALIDATE,
        "extract_confusion": P.SQL_EXTRACT_CONFUSION,
        "extract_spans": P.SQL_EXTRACT_SPANS,
        "extract_blocks": P.SQL_EXTRACT_BLOCKS,
        "pricing_summary": Q.SQL_PRICING_SUMMARY,
        "region_revenue": Q.SQL_REGION_REVENUE,
        "top_order_per_customer": Q.SQL_TOP_ORDER_PER_CUSTOMER,
        "user_sessions": Q.SQL_USER_SESSIONS,
        "asof_last_view": Q.SQL_ASOF_LAST_VIEW,
        "fuzzy_nation_pairs": Q.SQL_FUZZY_NATION_PAIRS,
        "keyword_containment": Q.SQL_KEYWORD_CONTAINMENT,
        "confusion_by_lang": Q.SQL_CONFUSION_BY_LANG,
        "grouping_sets_events": Q.SQL_GROUPING_SETS_EVENTS,
        "cheapest_supplier_per_bucket": Q.SQL_CHEAPEST_SUPPLIER_PER_BUCKET,
        "setops_customers": Q.SQL_SETOPS_CUSTOMERS,
        "json_props": Q.SQL_JSON_PROPS,
        "nearest_price_parts": Q.SQL_NEAREST_PRICE_PARTS,
        "distinct_suppliers": Q.SQL_DISTINCT_SUPPLIERS,
        "running_value": Q.SQL_RUNNING_VALUE,
        "nearest_click_after_error": Q.SQL_NEAREST_CLICK_AFTER_ERROR,
        "customer_order_counts": Q.SQL_CUSTOMER_ORDER_COUNTS,
        "semi_anti_gate": Q.SQL_SEMI_ANTI_GATE,
        "collect_statuses": Q.SQL_COLLECT_STATUSES,
        "interval_union": Q.SQL_INTERVAL_UNION,
        "pivot_order_status": Q.SQL_PIVOT_ORDER_STATUS,
        "small_quantity_revenue": Q.SQL_SMALL_QUANTITY_REVENUE,
        "session_window_agg": Q.SQL_SESSION_WINDOW_AGG,
        "min_cost_supplier_per_part": Q.SQL_MIN_COST_SUPPLIER_PER_PART,
        "dominant_suppliers": Q.SQL_DOMINANT_SUPPLIERS,
        "dedup_exact": M.SQL_DEDUP_EXACT,
        "minhash_signatures": M.SQL_MINHASH_SIGNATURES,
        "minhash_lsh_pairs": M.SQL_MINHASH_LSH_PAIRS,
        "ngram_jaccard_probe": M.SQL_NGRAM_JACCARD_PROBE,
        "ann_cosine_topk": M.SQL_ANN_COSINE_TOPK,
        "embedding_near_dups": M.SQL_EMBEDDING_NEAR_DUPS,
        "lang_id": M.SQL_LANG_ID,
        "quality_score": M.SQL_QUALITY_SCORE,
        "token_count": M.SQL_TOKEN_COUNT,
        "fingerprint": M.SQL_FINGERPRINT,
        "top_terms": M.SQL_TOP_TERMS,
        "char_entropy": M.SQL_CHAR_ENTROPY,
        "dup_ngram_ratio": M.SQL_DUP_NGRAM_RATIO,
        "ann_lsh_recall": M.SQL_ANN_LSH_RECALL,
        "quality_gopher": M.SQL_QUALITY_GOPHER,
        "pii_scrub": M.SQL_PII_SCRUB,
        "training_mix": M.SQL_TRAINING_MIX,
        "curation_funnel": M.SQL_CURATION_FUNNEL,
        "next_word_after_key": M.SQL_NEXT_WORD_AFTER_KEY,
        "winnow_fingerprint": M.SQL_WINNOW_FINGERPRINT,
        "simhash": M.SQL_SIMHASH,
        "next_right_word_2d": SP.SQL_NEXT_RIGHT_WORD_2D,
        "fuzzy_key_next_right": SP.SQL_FUZZY_KEY_NEXT_RIGHT,
        "best_config_per_metric": TU.SQL_BEST_CONFIG_PER_METRIC,
        "best_config_by_lang": TU.SQL_BEST_CONFIG_BY_LANG,
        "dedup_clusters": M.SQL_DEDUP_CLUSTERS,
        "ann_lsh_buckets": M.SQL_ANN_LSH_BUCKETS,
        "embedding_near_dups_lsh": M.SQL_EMBEDDING_NEAR_DUPS_LSH,
        "frame_samples": M.SQL_FRAME_SAMPLES,
        # approx_distinct_users (HLL sketch), ann_ivf_topk (KMeans),
        # media_features (stub decoder): intentionally no oracle
    }
