"""Registry assembly: driver-window rotation over the query surface.

Split from the former single-module queries.py (round 5); definition
order within this file is preserved from the original.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import resources as _res
import math
import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from spacetime_crawler4_spark.operators.dedup import (
    connected_components,
    containment_pairs,
    dup_cluster_stats,
    duplicated_span_stats,
    remove_duplicated_spans,
    exact_dup_groups,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    oph_lsh_pairs,
    simhash_docs,
    simhash_near_pairs,
    sql_tokens,
    word_shingles,
)
from spacetime_crawler4_spark.operators.multimodal import extract_media_meta
from spacetime_crawler4_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    train_test_split,
    weighted_sample,
)
from spacetime_crawler4_spark.operators.webfilter import (
    DOC_GOOD_RULES,
    HOST_BLOCK_MEAN_RULES,
    c4_clean_lines,
    gopher_quality,
    host_reputation,
    repetition_stats,
)
from spacetime_crawler4_spark.operators.asof import asof_join
from spacetime_crawler4_spark.operators.decontam import (
    decontaminate,
    incremental_dedup,
)
from spacetime_crawler4_spark.operators.pii import (
    PII_PATTERNS,
    inject_pii,
    pii_report,
)
from spacetime_crawler4_spark.crawl.schema import FINISH, STATUS
from spacetime_crawler4_spark.operators.graph import hits, pagerank, triangle_count
from spacetime_crawler4_spark.operators.quantize import int8_fidelity
from spacetime_crawler4_spark.operators.sketch import (
    CMS_DEPTH,
    cms_pairs_sql,
    cms_point_estimates,
    cms_registers,
    hll_estimate,
    hll_register_expr,
    hll_sql,
)
from spacetime_crawler4_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    embedding_near_pairs,
    ivf_assign,
    ivf_topk,
    ivf_topk_multiprobe,
    ivf_train,
    srp_near_pairs,
    srp_planes,
)
from spacetime_crawler4_spark.operators.textstats import (
    BACKOFF_ALPHA,
    LANG_MARKERS,
    QUALITY_STOPWORDS,
    bigram_bits_per_token,
    doc_fingerprint,
    langid_heuristic,
    quality_features,
    token_stats,
    unigram_bits_per_token,
)
import os as _os

from ._shared import SparkFn, _sql_substring_removal, _sql_substring_spans  # noqa: F401
from .tpch import SQL_TPCH_BENFORD_AUDIT, SQL_TPCH_CUBE, SQL_TPCH_DISJUNCTIVE_REVENUE, SQL_TPCH_FORECAST_REVENUE, SQL_TPCH_IDLE_RICH_CUSTOMERS, SQL_TPCH_LARGE_ORDERS, SQL_TPCH_MARKET_SHARE, SQL_TPCH_ORDERS_PER_CUSTOMER, SQL_TPCH_ORDER_PRIORITY, SQL_TPCH_PRICING, SQL_TPCH_PROMO_SHARE, SQL_TPCH_REGION_REVENUE, SQL_TPCH_RETURNED_ITEMS, SQL_TPCH_REVENUE_PARETO, SQL_TPCH_ROLLUP, SQL_TPCH_SHIPYEAR_PRIORITY, SQL_TPCH_SMALL_QTY_REVENUE, SQL_TPCH_TOP_CUSTOMERS, SQL_TPCH_TOP_SUPPLIER, SQL_TPCH_UNSHIPPED_ORDERS, SQL_TPCH_VOLUME_SHIPPING, SQL_TPCH_WAITING_SUPPLIERS, q_tpch_benford_audit, q_tpch_cube, q_tpch_disjunctive_revenue, q_tpch_forecast_revenue, q_tpch_idle_rich_customers, q_tpch_large_orders, q_tpch_market_share, q_tpch_order_priority, q_tpch_orders_per_customer, q_tpch_pricing, q_tpch_promo_share, q_tpch_region_revenue, q_tpch_returned_items, q_tpch_revenue_pareto, q_tpch_rollup, q_tpch_shipyear_priority, q_tpch_small_qty_revenue, q_tpch_top_customers, q_tpch_top_supplier, q_tpch_unshipped_orders, q_tpch_volume_shipping, q_tpch_waiting_suppliers  # noqa: F401
from .events import SQL_EVENTS_ANOMALY_MAD, SQL_EVENTS_ASOF, SQL_EVENTS_ATTRIBUTION, SQL_EVENTS_DAILY, SQL_EVENTS_FUNNEL, SQL_EVENTS_GINI, SQL_EVENTS_HOURLY_PROFILE, SQL_EVENTS_JSON, SQL_EVENTS_MARKOV, SQL_EVENTS_MOVING_AVG, SQL_EVENTS_RETENTION, SQL_EVENTS_RFM, SQL_EVENTS_SESSIONIZE, SQL_EVENTS_SLIDING_WINDOW, SQL_EVENTS_STICKINESS, SQL_EVENTS_TIME_TO_CONVERT, SQL_EVENTS_TOP_USERS, SQL_EVENTS_TREND_MK, SQL_EVENTS_WINDOW_TOPK, _sql_events_sliding_distinct, q_events_anomaly_mad, q_events_asof, q_events_attribution, q_events_daily, q_events_funnel, q_events_gini, q_events_hourly_profile, q_events_json_props, q_events_markov, q_events_moving_avg, q_events_retention, q_events_rfm, q_events_sessionize, q_events_sliding_distinct, q_events_sliding_window, q_events_stickiness, q_events_time_to_convert, q_events_top_users, q_events_trend_mk, q_events_window_topk  # noqa: F401
from .webfilter import SQL_WEBFILTER_C4, SQL_WEBFILTER_FUNNEL, SQL_WEBFILTER_HOST_REPUTATION, SQL_WEBFILTER_REPETITION, q_webfilter_c4, q_webfilter_funnel, q_webfilter_host_reputation, q_webfilter_repetition  # noqa: F401
from .sampling import SQL_SAMPLE_DSIR, SQL_SAMPLE_HASH, SQL_SAMPLE_MIXTURE, SQL_SAMPLE_SPLIT, SQL_SAMPLE_STRATIFIED, SQL_SAMPLE_TEMPERATURE, SQL_SAMPLE_WEIGHTED, _sql_sample_repeat_plan, q_sample_dsir_topk, q_sample_hash_10pct, q_sample_mixture_weights, q_sample_repeat_plan, q_sample_stratified_lang, q_sample_temperature_mixture, q_sample_train_test_split, q_sample_weighted_length  # noqa: F401
from .sketch import SQL_SKETCH_MG_HEAVY_HITTERS, SQL_TEXT_LENGTH_QUANTILES, SQL_TEXT_TOP_NGRAMS, _sql_sketch_ams_f2, _sql_sketch_cms, _sql_sketch_distinct, _sql_sketch_hll_per_source, _sql_sketch_hll_union, _sql_sketch_kmv_setops, _sql_sketch_quantile_audit, _sql_text_bootstrap_ci, q_sketch_ams_f2, q_sketch_cms_heavy_hitters, q_sketch_distinct, q_sketch_hll_per_source, q_sketch_hll_union, q_sketch_kmv_setops, q_sketch_mg_heavy_hitters, q_sketch_quantile_audit, q_text_bootstrap_ci, q_text_length_quantiles, q_text_top_ngrams  # noqa: F401
from .similarity import SQL_ANN_BRUTE, SQL_ANN_HARD_NEGATIVES, SQL_ANN_IVF, SQL_ANN_IVF_CELL_BALANCE, SQL_ANN_IVF_PROBE2, SQL_ANN_PQ, SQL_ANN_PQ_RECALL, SQL_EMBED_COS_HISTOGRAM, SQL_EMBED_INT8, SQL_EMBED_LABEL_CENTROIDS, SQL_EMBED_ROCCHIO_CONFUSION, SQL_TEXT_HASH_EMBEDDING, _sql_ann_kmeanspp_init, _sql_ann_recall, _sql_embed_matryoshka_recall, _sql_embed_pca_top, _sql_trained_recall, q_ann_bruteforce, q_ann_hard_negatives, q_ann_ivf, q_ann_ivf_cell_balance, q_ann_ivf_probe2, q_ann_ivf_recall, q_ann_ivf_trained_recall, q_ann_kmeanspp_init, q_ann_pq_recall, q_ann_pq_topk, q_embed_cos_histogram, q_embed_int8_fidelity, q_embed_label_centroids, q_embed_matryoshka_recall, q_embed_pca_top, q_embed_rocchio_confusion, q_text_hash_embedding  # noqa: F401
from .text import SQL_SEARCH_CONJUNCTIVE, SQL_SEARCH_DIRICHLET_QL, SQL_SEARCH_PHRASE, SQL_SEARCH_RRF_FUSION, SQL_TEXT_BIGRAM_PPX, SQL_TEXT_BM25, SQL_TEXT_BPE, SQL_TEXT_CHUNK_WINDOWS, SQL_TEXT_FINGERPRINT, SQL_TEXT_JS_DIVERGENCE, SQL_TEXT_KEYWORDS, SQL_TEXT_KN_PPX, SQL_TEXT_LANGID, SQL_TEXT_LANGID_CONFUSION, SQL_TEXT_NB_LANGID, SQL_TEXT_OOV_GOODTURING, SQL_TEXT_PACK_MANIFEST, SQL_TEXT_PPX_PARTITION, SQL_TEXT_QUALITY, SQL_TEXT_RABIN, SQL_TEXT_READABILITY, SQL_TEXT_SHARD_MANIFEST, SQL_TEXT_TFIDF, SQL_TEXT_TOKEN_STATS, SQL_TEXT_TOPK_PER_SOURCE, SQL_TEXT_UNIGRAM_PPX, SQL_TEXT_WINNOW, SQL_TEXT_ZIPF, _sql_bpe_apply, _sql_bpe_train, _sql_text_mojibake, _sql_text_stopword_coverage, _sql_text_vocab_growth, q_search_conjunctive, q_search_dirichlet_ql, q_search_phrase, q_search_rrf_fusion, q_text_bigram_ppx, q_text_bm25, q_text_bpe_apply, q_text_bpe_token_stats, q_text_bpe_train, q_text_chunk_windows, q_text_fingerprint, q_text_js_divergence, q_text_keywords, q_text_kn_ppx, q_text_langid, q_text_langid_confusion, q_text_mojibake, q_text_nb_langid, q_text_oov_goodturing, q_text_pack_manifest, q_text_ppx_partition, q_text_quality, q_text_rabin_fingerprint, q_text_readability, q_text_shard_manifest, q_text_stopword_coverage, q_text_tfidf, q_text_token_stats, q_text_topk_per_source, q_text_unigram_ppx, q_text_vocab_growth, q_text_winnow, q_text_zipf  # noqa: F401
from .multimodal import SQL_MULTIMODAL_BMP, SQL_MULTIMODAL_JPEG, SQL_MULTIMODAL_META, SQL_MULTIMODAL_PNG, SQL_MULTIMODAL_VIDEO, SQL_MULTIMODAL_WAV, q_multimodal_bmp_roundtrip, q_multimodal_jpeg_roundtrip, q_multimodal_meta, q_multimodal_png_roundtrip, q_multimodal_video_frame_plan, q_multimodal_wav_roundtrip  # noqa: F401
from .graph import SQL_GRAPH_TRIANGLES, _sql_graph_label_propagation, _sql_hits, _sql_pagerank, q_graph_hits, q_graph_label_propagation, q_graph_pagerank, q_graph_triangles  # noqa: F401
from .dedup import SQL_DEDUP_CDC_CHUNKS, SQL_DEDUP_CLUSTERS, SQL_DEDUP_CLUSTER_COHESION, SQL_DEDUP_CLUSTER_PURITY, SQL_DEDUP_CLUSTER_STATS, SQL_DEDUP_CONTAINMENT, SQL_DEDUP_EMBEDDING, SQL_DEDUP_EXACT, SQL_DEDUP_INCREMENTAL, SQL_DEDUP_JACCARD, SQL_DEDUP_LSH_ONEPASS, SQL_DEDUP_MASTER_QUALITY, SQL_DEDUP_MINHASH, SQL_DEDUP_PPJOIN, SQL_DEDUP_PREFIX, SQL_DEDUP_SEMANTIC, SQL_DEDUP_SRP, SQL_DEDUP_SRP_RECALL, SQL_DEDUP_TFIDF_COSINE, SQL_DEDUP_WINNOW_PAIRS, SQL_WEBFILTER_GOPHER, _sql_dedup_minhash_estimate, _sql_dedup_oph_pairs, _sql_minhash_recall, _sql_simhash64_pairs, _sql_simhash_bitwidth_density, _sql_simhash_pairs, _sql_simhash_refparity, q_dedup_cdc_chunks, q_dedup_cluster_cohesion, q_dedup_cluster_purity, q_dedup_cluster_stats, q_dedup_containment, q_dedup_dup_clusters, q_dedup_embedding_cosine, q_dedup_exact, q_dedup_incremental, q_dedup_lsh_onepass, q_dedup_master_quality, q_dedup_minhash_estimate, q_dedup_minhash_lsh, q_dedup_minhash_recall, q_dedup_ngram_jaccard, q_dedup_oph_pairs, q_dedup_ppjoin, q_dedup_prefix_buckets, q_dedup_semantic, q_dedup_simhash64_pairs, q_dedup_simhash_bitwidth_density, q_dedup_simhash_pairs, q_dedup_simhash_refparity, q_dedup_srp_pairs, q_dedup_srp_recall, q_dedup_substring_removal, q_dedup_substring_spans, q_dedup_tfidf_cosine, q_dedup_winnow_pairs, q_webfilter_gopher  # noqa: F401
from .crawl import SQL_CRAWL_ANCHOR_SPAM, SQL_CRAWL_COCITATION, SQL_CRAWL_DEGREE_POWERLAW, SQL_CRAWL_DISCOVERY_CURVE, SQL_CRAWL_DUP_LINES, SQL_CRAWL_HOST_COMPONENTS, SQL_CRAWL_HUB_PAGES, SQL_CRAWL_LINE_DEDUP, SQL_CRAWL_LINKS_BM25, SQL_CRAWL_LINKS_DOMAINS, SQL_CRAWL_LINKS_TERMS, SQL_CRAWL_LINKS_TOP, SQL_CRAWL_MIRROR_HOSTS, SQL_CRAWL_NAV_CHROME, SQL_CRAWL_RECIPROCITY, SQL_CRAWL_RECRAWL_PRIORITY, SQL_CRAWL_SEED_ATTRIBUTION, SQL_CRAWL_SNAPSHOT_DELTA, SQL_CRAWL_STATE_DEPTH, SQL_CRAWL_STATE_DOMAIN, SQL_CRAWL_STATE_FINISH, SQL_CRAWL_SURT_KEYS, SQL_CRAWL_TRAP_TEMPLATES, SQL_CRAWL_URL_ALIASES, SQL_REPORT_DEPTH_HISTOGRAM, SQL_REPORT_LANG, SQL_REPORT_LONGEST, SQL_REPORT_PER_SOURCE, SQL_REPORT_TOP50, SQL_REPORT_TOTALS, _sql_crawl_budget_allocation, _sql_crawl_cdx_manifest, _sql_crawl_host_rank, _sql_crawl_opic_host_rank, _sql_crawl_opic_importance, _sql_crawl_salsa, _sql_crawl_top50, _sql_crawl_trustrank, _sql_soft404, q_crawl_anchor_spam, q_crawl_budget_allocation, q_crawl_cdx_manifest, q_crawl_cocitation, q_crawl_degree_powerlaw, q_crawl_discovery_curve, q_crawl_dup_lines, q_crawl_host_components, q_crawl_hub_pages, q_crawl_line_dedup, q_crawl_links_anchor_bm25, q_crawl_links_anchor_terms, q_crawl_links_domain_graph, q_crawl_links_top_targets, q_crawl_mirror_hosts, q_crawl_nav_chrome, q_crawl_opic_host_rank, q_crawl_opic_importance, q_crawl_reciprocity, q_crawl_recrawl_priority, q_crawl_salsa, q_crawl_seed_attribution, q_crawl_snapshot_delta, q_crawl_soft404, q_crawl_state_depth_audit, q_crawl_state_domain_audit, q_crawl_state_finish_histogram, q_crawl_state_host_rank, q_crawl_surt_keys, q_crawl_top50_parity_tokens, q_crawl_trap_templates, q_crawl_trustrank, q_crawl_url_aliases, q_decontam_report, q_report_corpus_totals, q_report_depth_histogram, q_report_docs_per_source, q_report_lang_tallies, q_report_longest_doc, q_report_top50_words  # noqa: F401
from .classify import _sql_classify_lr, _sql_classify_lr_gate, q_classify_lr_gate, q_classify_lr_weights  # noqa: F401
from .pipeline import SQL_DECONTAM, SQL_DECONTAM_FUZZY, _sql_pii, _sql_pipeline_admission, _sql_pipeline_admission_onepass, _sql_pipeline_split_leakage, q_decontam_fuzzy, q_pii_scrub, q_pipeline_admission, q_pipeline_admission_onepass, q_pipeline_split_leakage  # noqa: F401



# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------


def _base_registry() -> dict[str, tuple[SparkFn, str | None]]:
    # ORDER MATTERS: the driver's correctness harness checks the FIRST 50
    # entries. Round-4 rotation (VERDICT r3 next-round #1): the 32 queries
    # added in round 3 that never received a driver CORRECTNESS row come
    # first, then the five queries last driver-checked in r1/r2, then the
    # new round-4 crawl-state queries, then the highest-value r3-green
    # queries up to the window edge. Every query keeps its local DuckDB
    # oracle gate (tests/test_oracle_parity.py) regardless of position.
    # ``registry()`` below re-derives the live order from driver-green
    # history, so this literal's order only breaks ties.
    return {
        # --- never driver-checked (round-3 additions), original order ---
        "multimodal_jpeg_roundtrip": (q_multimodal_jpeg_roundtrip, SQL_MULTIMODAL_JPEG),
        "sample_hash_10pct": (q_sample_hash_10pct, SQL_SAMPLE_HASH),
        "sample_stratified_lang": (q_sample_stratified_lang, SQL_SAMPLE_STRATIFIED),
        "sample_train_test_split": (q_sample_train_test_split, SQL_SAMPLE_SPLIT),
        "sample_weighted_length": (q_sample_weighted_length, SQL_SAMPLE_WEIGHTED),
        "webfilter_gopher": (q_webfilter_gopher, SQL_WEBFILTER_GOPHER),
        "webfilter_c4": (q_webfilter_c4, SQL_WEBFILTER_C4),
        "webfilter_repetition": (q_webfilter_repetition, SQL_WEBFILTER_REPETITION),
        "webfilter_funnel": (q_webfilter_funnel, SQL_WEBFILTER_FUNNEL),
        "webfilter_host_reputation": (
            q_webfilter_host_reputation,
            SQL_WEBFILTER_HOST_REPUTATION,
        ),
        "dedup_srp_pairs": (q_dedup_srp_pairs, SQL_DEDUP_SRP),
        "dedup_srp_recall": (q_dedup_srp_recall, SQL_DEDUP_SRP_RECALL),
        "decontam_report": (q_decontam_report, SQL_DECONTAM),
        "dedup_incremental": (q_dedup_incremental, SQL_DEDUP_INCREMENTAL),
        "pii_scrub": (q_pii_scrub, _sql_pii()),
        "embed_int8_fidelity": (q_embed_int8_fidelity, SQL_EMBED_INT8),
        "embed_label_centroids": (q_embed_label_centroids, SQL_EMBED_LABEL_CENTROIDS),
        "text_top_ngrams": (q_text_top_ngrams, SQL_TEXT_TOP_NGRAMS),
        "text_unigram_ppx": (q_text_unigram_ppx, SQL_TEXT_UNIGRAM_PPX),
        "text_bigram_ppx": (q_text_bigram_ppx, SQL_TEXT_BIGRAM_PPX),
        "text_bpe_train": (q_text_bpe_train, _sql_bpe_train()),
        "text_bpe_apply": (q_text_bpe_apply, _sql_bpe_apply()),
        "events_asof": (q_events_asof, SQL_EVENTS_ASOF),
        "pipeline_admission": (q_pipeline_admission, _sql_pipeline_admission()),
        "graph_pagerank": (q_graph_pagerank, _sql_pagerank()),
        "graph_hits": (q_graph_hits, _sql_hits()),
        "graph_triangles": (q_graph_triangles, SQL_GRAPH_TRIANGLES),
        "text_length_quantiles": (q_text_length_quantiles, SQL_TEXT_LENGTH_QUANTILES),
        "text_topk_per_source": (q_text_topk_per_source, SQL_TEXT_TOPK_PER_SOURCE),
        "sketch_distinct_hll": (q_sketch_distinct, _sql_sketch_distinct()),
        "sketch_cms_heavy_hitters": (q_sketch_cms_heavy_hitters, _sql_sketch_cms()),
        "sketch_hll_union": (q_sketch_hll_union, _sql_sketch_hll_union()),
        # --- last driver-checked in r1/r2, due a re-check ---
        # --- new round-4 crawl-state queries (real engine output) ---
        "crawl_state_finish_histogram": (
            q_crawl_state_finish_histogram,
            SQL_CRAWL_STATE_FINISH,
        ),
        "crawl_state_domain_audit": (
            q_crawl_state_domain_audit,
            SQL_CRAWL_STATE_DOMAIN,
        ),
        "crawl_state_depth_audit": (
            q_crawl_state_depth_audit,
            SQL_CRAWL_STATE_DEPTH,
        ),
        "crawl_state_host_rank": (q_crawl_state_host_rank, _sql_crawl_host_rank()),
        # --- round-4 session-4: anchor-text link graph over engine truth ---
        "crawl_links_top_targets": (q_crawl_links_top_targets, SQL_CRAWL_LINKS_TOP),
        "crawl_links_domain_graph": (
            q_crawl_links_domain_graph,
            SQL_CRAWL_LINKS_DOMAINS,
        ),
        "crawl_links_anchor_terms": (
            q_crawl_links_anchor_terms,
            SQL_CRAWL_LINKS_TERMS,
        ),
        "crawl_links_anchor_bm25": (
            q_crawl_links_anchor_bm25,
            SQL_CRAWL_LINKS_BM25,
        ),
        "text_nb_langid": (q_text_nb_langid, SQL_TEXT_NB_LANGID),
        "text_zipf": (q_text_zipf, SQL_TEXT_ZIPF),
        "dedup_semantic": (q_dedup_semantic, SQL_DEDUP_SEMANTIC),
        # --- round-4 session-2 additions: real PNG/AVI codecs + DSIR ---
        "multimodal_png_roundtrip": (q_multimodal_png_roundtrip, SQL_MULTIMODAL_PNG),
        "multimodal_video_frame_plan": (
            q_multimodal_video_frame_plan,
            SQL_MULTIMODAL_VIDEO,
        ),
        "sample_dsir_topk": (q_sample_dsir_topk, SQL_SAMPLE_DSIR),
        # --- round-4 session-3: chunking / packing / mixture / ppx bands ---
        "text_chunk_windows": (q_text_chunk_windows, SQL_TEXT_CHUNK_WINDOWS),
        "text_pack_manifest": (q_text_pack_manifest, SQL_TEXT_PACK_MANIFEST),
        "text_ppx_partition": (q_text_ppx_partition, SQL_TEXT_PPX_PARTITION),
        "sample_mixture_weights": (q_sample_mixture_weights, SQL_SAMPLE_MIXTURE),
        # --- previously driver-green (r1-r3), rotated out of the window to
        #     make room for the session-4 link-graph queries (local oracle
        #     gate still applies to every one of these) ---
        "report_top50_words": (q_report_top50_words, SQL_REPORT_TOP50),
        "events_json_props": (q_events_json_props, SQL_EVENTS_JSON),
        "crawl_top50_parity_tokens": (q_crawl_top50_parity_tokens, _sql_crawl_top50()),
        "multimodal_meta": (q_multimodal_meta, SQL_MULTIMODAL_META),
        "multimodal_bmp_roundtrip": (q_multimodal_bmp_roundtrip, SQL_MULTIMODAL_BMP),
        "multimodal_wav_roundtrip": (q_multimodal_wav_roundtrip, SQL_MULTIMODAL_WAV),
        "dedup_minhash_lsh": (q_dedup_minhash_lsh, SQL_DEDUP_MINHASH),
        "dedup_simhash_refparity": (q_dedup_simhash_refparity, _sql_simhash_refparity()),
        "dedup_simhash64_pairs": (q_dedup_simhash64_pairs, _sql_simhash64_pairs()),
        "dedup_substring_removal": (
            q_dedup_substring_removal,
            _sql_substring_removal(),
        ),
        "report_longest_doc": (q_report_longest_doc, SQL_REPORT_LONGEST),
        "report_docs_per_source": (q_report_docs_per_source, SQL_REPORT_PER_SOURCE),
        "report_lang_tallies": (q_report_lang_tallies, SQL_REPORT_LANG),
        "report_corpus_totals": (q_report_corpus_totals, SQL_REPORT_TOTALS),
        "report_depth_histogram": (q_report_depth_histogram, SQL_REPORT_DEPTH_HISTOGRAM),
        "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
        "dedup_prefix_buckets": (q_dedup_prefix_buckets, SQL_DEDUP_PREFIX),
        "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, SQL_DEDUP_JACCARD),
        "dedup_minhash_recall": (q_dedup_minhash_recall, _sql_minhash_recall()),
        "dedup_dup_clusters": (q_dedup_dup_clusters, SQL_DEDUP_CLUSTERS),
        "dedup_cluster_stats": (q_dedup_cluster_stats, SQL_DEDUP_CLUSTER_STATS),
        "dedup_simhash_pairs": (q_dedup_simhash_pairs, _sql_simhash_pairs()),
        "dedup_simhash_bitwidth_density": (
            q_dedup_simhash_bitwidth_density,
            _sql_simhash_bitwidth_density(),
        ),
        "dedup_embedding_cosine": (q_dedup_embedding_cosine, SQL_DEDUP_EMBEDDING),
        "dedup_substring_spans": (q_dedup_substring_spans, _sql_substring_spans()),
        "dedup_containment": (q_dedup_containment, SQL_DEDUP_CONTAINMENT),
        "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
        "text_langid": (q_text_langid, SQL_TEXT_LANGID),
        "text_token_stats": (q_text_token_stats, SQL_TEXT_TOKEN_STATS),
        "text_fingerprint": (q_text_fingerprint, SQL_TEXT_FINGERPRINT),
        "text_bpe_token_stats": (q_text_bpe_token_stats, SQL_TEXT_BPE),
        "ann_bruteforce": (q_ann_bruteforce, SQL_ANN_BRUTE),
        "ann_ivf": (q_ann_ivf, SQL_ANN_IVF),
        "ann_ivf_recall": (q_ann_ivf_recall, _sql_ann_recall()),
        "ann_ivf_probe2": (q_ann_ivf_probe2, SQL_ANN_IVF_PROBE2),
        "ann_pq_topk": (q_ann_pq_topk, SQL_ANN_PQ),
        "ann_pq_recall": (q_ann_pq_recall, SQL_ANN_PQ_RECALL),
        "ann_ivf_trained_recall": (q_ann_ivf_trained_recall, _sql_trained_recall()),
        "text_bm25": (q_text_bm25, SQL_TEXT_BM25),
        "search_conjunctive": (q_search_conjunctive, SQL_SEARCH_CONJUNCTIVE),
        "text_tfidf": (q_text_tfidf, SQL_TEXT_TFIDF),
        "text_winnow": (q_text_winnow, SQL_TEXT_WINNOW),
        "text_rabin_fingerprint": (q_text_rabin_fingerprint, SQL_TEXT_RABIN),
        "events_daily": (q_events_daily, SQL_EVENTS_DAILY),
        "events_top_users": (q_events_top_users, SQL_EVENTS_TOP_USERS),
        "events_sessionize": (q_events_sessionize, SQL_EVENTS_SESSIONIZE),
        "events_funnel": (q_events_funnel, SQL_EVENTS_FUNNEL),
        "events_time_to_convert": (
            q_events_time_to_convert,
            SQL_EVENTS_TIME_TO_CONVERT,
        ),
        "tpch_pricing": (q_tpch_pricing, SQL_TPCH_PRICING),
        "tpch_top_customers": (q_tpch_top_customers, SQL_TPCH_TOP_CUSTOMERS),
        "tpch_order_priority": (q_tpch_order_priority, SQL_TPCH_ORDER_PRIORITY),
        "tpch_region_revenue": (q_tpch_region_revenue, SQL_TPCH_REGION_REVENUE),
        "tpch_rollup": (q_tpch_rollup, SQL_TPCH_ROLLUP),
        "tpch_volume_shipping": (q_tpch_volume_shipping, SQL_TPCH_VOLUME_SHIPPING),
        "tpch_promo_share": (q_tpch_promo_share, SQL_TPCH_PROMO_SHARE),
    }


def _staged_registry() -> dict[str, tuple[SparkFn, str | None]]:
    """Queries staged for a FUTURE round's correctness window.

    The driver certifies only the first 50 ``registry()`` entries per
    round, and the current window is exactly the never-driver-checked
    queries (tests/test_registry_window.py pins this). Queries authored
    after the window filled therefore stage HERE: they get the identical
    local DuckDB-oracle gate from day one (tests/test_oracle_parity.py
    iterates both registries), and ``registry()`` promotes them into the
    leading window AUTOMATICALLY as driver-green history frees slots
    (no manual rotation step at round boundaries).
    """
    return {
        "crawl_trap_templates": (q_crawl_trap_templates, SQL_CRAWL_TRAP_TEMPLATES),
        "crawl_recrawl_priority": (
            q_crawl_recrawl_priority,
            SQL_CRAWL_RECRAWL_PRIORITY,
        ),
        "crawl_mirror_hosts": (q_crawl_mirror_hosts, SQL_CRAWL_MIRROR_HOSTS),
        "crawl_url_aliases": (q_crawl_url_aliases, SQL_CRAWL_URL_ALIASES),
        "crawl_soft404": (q_crawl_soft404, _sql_soft404()),
        "crawl_dup_lines": (q_crawl_dup_lines, SQL_CRAWL_DUP_LINES),
        "crawl_line_dedup": (q_crawl_line_dedup, SQL_CRAWL_LINE_DEDUP),
        "crawl_nav_chrome": (q_crawl_nav_chrome, SQL_CRAWL_NAV_CHROME),
        "search_phrase": (q_search_phrase, SQL_SEARCH_PHRASE),
        "crawl_trustrank": (q_crawl_trustrank, _sql_crawl_trustrank()),
        "crawl_surt_keys": (q_crawl_surt_keys, SQL_CRAWL_SURT_KEYS),
        "crawl_anchor_spam": (q_crawl_anchor_spam, SQL_CRAWL_ANCHOR_SPAM),
        "crawl_cocitation": (q_crawl_cocitation, SQL_CRAWL_COCITATION),
        "crawl_budget_allocation": (
            q_crawl_budget_allocation,
            _sql_crawl_budget_allocation(),
        ),
        "pipeline_split_leakage": (
            q_pipeline_split_leakage,
            _sql_pipeline_split_leakage(),
        ),
        "crawl_discovery_curve": (
            q_crawl_discovery_curve,
            SQL_CRAWL_DISCOVERY_CURVE,
        ),
        "crawl_degree_powerlaw": (
            q_crawl_degree_powerlaw,
            SQL_CRAWL_DEGREE_POWERLAW,
        ),
        "crawl_reciprocity": (q_crawl_reciprocity, SQL_CRAWL_RECIPROCITY),
        "crawl_cdx_manifest": (q_crawl_cdx_manifest, _sql_crawl_cdx_manifest()),
        "crawl_snapshot_delta": (q_crawl_snapshot_delta, SQL_CRAWL_SNAPSHOT_DELTA),
        "dedup_tfidf_cosine": (q_dedup_tfidf_cosine, SQL_DEDUP_TFIDF_COSINE),
        "dedup_master_quality": (q_dedup_master_quality, SQL_DEDUP_MASTER_QUALITY),
        "ann_hard_negatives": (q_ann_hard_negatives, SQL_ANN_HARD_NEGATIVES),
        "crawl_host_components": (
            q_crawl_host_components,
            SQL_CRAWL_HOST_COMPONENTS,
        ),
        "text_shard_manifest": (q_text_shard_manifest, SQL_TEXT_SHARD_MANIFEST),
        "sample_temperature_mixture": (
            q_sample_temperature_mixture,
            SQL_SAMPLE_TEMPERATURE,
        ),
        "events_retention": (q_events_retention, SQL_EVENTS_RETENTION),
        "crawl_seed_attribution": (
            q_crawl_seed_attribution,
            SQL_CRAWL_SEED_ATTRIBUTION,
        ),
        "dedup_cdc_chunks": (q_dedup_cdc_chunks, SQL_DEDUP_CDC_CHUNKS),
        "embed_pca_top": (q_embed_pca_top, _sql_embed_pca_top()),
        "text_hash_embedding": (q_text_hash_embedding, SQL_TEXT_HASH_EMBEDDING),
        "events_anomaly_mad": (q_events_anomaly_mad, SQL_EVENTS_ANOMALY_MAD),
        "events_rfm": (q_events_rfm, SQL_EVENTS_RFM),
        "text_kn_ppx": (q_text_kn_ppx, SQL_TEXT_KN_PPX),
        "events_markov": (q_events_markov, SQL_EVENTS_MARKOV),
        "text_readability": (q_text_readability, SQL_TEXT_READABILITY),
        "tpch_revenue_pareto": (q_tpch_revenue_pareto, SQL_TPCH_REVENUE_PARETO),
        "events_gini": (q_events_gini, SQL_EVENTS_GINI),
        "tpch_orders_per_customer": (
            q_tpch_orders_per_customer,
            SQL_TPCH_ORDERS_PER_CUSTOMER,
        ),
        "dedup_minhash_estimate": (
            q_dedup_minhash_estimate,
            _sql_dedup_minhash_estimate(),
        ),
        "text_js_divergence": (q_text_js_divergence, SQL_TEXT_JS_DIVERGENCE),
        "crawl_hub_pages": (q_crawl_hub_pages, SQL_CRAWL_HUB_PAGES),
        "embed_cos_histogram": (q_embed_cos_histogram, SQL_EMBED_COS_HISTOGRAM),
        "text_vocab_growth": (q_text_vocab_growth, _sql_text_vocab_growth()),
        "sample_repeat_plan": (q_sample_repeat_plan, _sql_sample_repeat_plan()),
        "events_hourly_profile": (
            q_events_hourly_profile,
            SQL_EVENTS_HOURLY_PROFILE,
        ),
        "tpch_returned_items": (q_tpch_returned_items, SQL_TPCH_RETURNED_ITEMS),
        "dedup_cluster_purity": (q_dedup_cluster_purity, SQL_DEDUP_CLUSTER_PURITY),
        "ann_ivf_cell_balance": (
            q_ann_ivf_cell_balance,
            SQL_ANN_IVF_CELL_BALANCE,
        ),
        "text_stopword_coverage": (
            q_text_stopword_coverage,
            _sql_text_stopword_coverage(),
        ),
        "tpch_shipyear_priority": (
            q_tpch_shipyear_priority,
            SQL_TPCH_SHIPYEAR_PRIORITY,
        ),
        "tpch_large_orders": (q_tpch_large_orders, SQL_TPCH_LARGE_ORDERS),
        "tpch_disjunctive_revenue": (
            q_tpch_disjunctive_revenue,
            SQL_TPCH_DISJUNCTIVE_REVENUE,
        ),
        "events_attribution": (q_events_attribution, SQL_EVENTS_ATTRIBUTION),
        "dedup_cluster_cohesion": (
            q_dedup_cluster_cohesion,
            SQL_DEDUP_CLUSTER_COHESION,
        ),
        "ann_kmeanspp_init": (q_ann_kmeanspp_init, _sql_ann_kmeanspp_init()),
        "embed_matryoshka_recall": (
            q_embed_matryoshka_recall,
            _sql_embed_matryoshka_recall(),
        ),
        "text_langid_confusion": (
            q_text_langid_confusion,
            SQL_TEXT_LANGID_CONFUSION,
        ),
        "sketch_mg_heavy_hitters": (
            q_sketch_mg_heavy_hitters,
            SQL_SKETCH_MG_HEAVY_HITTERS,
        ),
        "graph_label_propagation": (
            q_graph_label_propagation,
            _sql_graph_label_propagation(),
        ),
        "events_sliding_window": (
            q_events_sliding_window,
            SQL_EVENTS_SLIDING_WINDOW,
        ),
        "text_mojibake": (q_text_mojibake, _sql_text_mojibake()),
        "classify_lr_weights": (q_classify_lr_weights, _sql_classify_lr()),
        "sketch_hll_per_source": (
            q_sketch_hll_per_source,
            _sql_sketch_hll_per_source(),
        ),
        "sketch_quantile_audit": (
            q_sketch_quantile_audit,
            _sql_sketch_quantile_audit(),
        ),
        "tpch_forecast_revenue": (
            q_tpch_forecast_revenue,
            SQL_TPCH_FORECAST_REVENUE,
        ),
        "tpch_unshipped_orders": (
            q_tpch_unshipped_orders,
            SQL_TPCH_UNSHIPPED_ORDERS,
        ),
        "classify_lr_gate": (q_classify_lr_gate, _sql_classify_lr_gate()),
        "sketch_kmv_setops": (q_sketch_kmv_setops, _sql_sketch_kmv_setops()),
        "dedup_oph_pairs": (q_dedup_oph_pairs, _sql_dedup_oph_pairs()),
        "dedup_lsh_onepass": (q_dedup_lsh_onepass, SQL_DEDUP_LSH_ONEPASS),
        "crawl_opic_importance": (
            q_crawl_opic_importance,
            _sql_crawl_opic_importance(),
        ),
        "events_sliding_distinct": (
            q_events_sliding_distinct,
            _sql_events_sliding_distinct(),
        ),
        "search_rrf_fusion": (q_search_rrf_fusion, SQL_SEARCH_RRF_FUSION),
        "tpch_waiting_suppliers": (
            q_tpch_waiting_suppliers,
            SQL_TPCH_WAITING_SUPPLIERS,
        ),
        "events_window_topk": (q_events_window_topk, SQL_EVENTS_WINDOW_TOPK),
        "search_dirichlet_ql": (q_search_dirichlet_ql, SQL_SEARCH_DIRICHLET_QL),
        "embed_rocchio_confusion": (
            q_embed_rocchio_confusion,
            SQL_EMBED_ROCCHIO_CONFUSION,
        ),
        "dedup_winnow_pairs": (q_dedup_winnow_pairs, SQL_DEDUP_WINNOW_PAIRS),
        "text_oov_goodturing": (
            q_text_oov_goodturing,
            SQL_TEXT_OOV_GOODTURING,
        ),
        "pipeline_admission_onepass": (
            q_pipeline_admission_onepass,
            _sql_pipeline_admission_onepass(),
        ),
        "decontam_fuzzy": (q_decontam_fuzzy, SQL_DECONTAM_FUZZY),
        "tpch_idle_rich_customers": (
            q_tpch_idle_rich_customers,
            SQL_TPCH_IDLE_RICH_CUSTOMERS,
        ),
        "dedup_ppjoin": (q_dedup_ppjoin, SQL_DEDUP_PPJOIN),
        "crawl_opic_host_rank": (
            q_crawl_opic_host_rank,
            _sql_crawl_opic_host_rank(),
        ),
        "tpch_top_supplier": (q_tpch_top_supplier, SQL_TPCH_TOP_SUPPLIER),
        "events_stickiness": (q_events_stickiness, SQL_EVENTS_STICKINESS),
        "text_keywords": (q_text_keywords, SQL_TEXT_KEYWORDS),
        "sketch_ams_f2": (q_sketch_ams_f2, _sql_sketch_ams_f2()),
        "events_trend_mk": (q_events_trend_mk, SQL_EVENTS_TREND_MK),
        "tpch_benford_audit": (q_tpch_benford_audit, SQL_TPCH_BENFORD_AUDIT),
        "tpch_cube": (q_tpch_cube, SQL_TPCH_CUBE),
        "events_moving_avg": (q_events_moving_avg, SQL_EVENTS_MOVING_AVG),
        "text_bootstrap_ci": (q_text_bootstrap_ci, _sql_text_bootstrap_ci()),
        "crawl_salsa": (q_crawl_salsa, _sql_crawl_salsa()),
        "tpch_market_share": (q_tpch_market_share, SQL_TPCH_MARKET_SHARE),
        "tpch_small_qty_revenue": (
            q_tpch_small_qty_revenue,
            SQL_TPCH_SMALL_QTY_REVENUE,
        ),
    }


# --------------------------------------------------------------------------
# correctness-window rotation (automatic)
# --------------------------------------------------------------------------

CORRECTNESS_WINDOW = 50

# Oracles whose SQL inlines an artifact frozen at the driver's
# correctness SF (sf0.01) and is therefore only byte-valid there;
# cross-scale sweeps (tools/parity_sweep.py) skip them at other SFs.
SF_PINNED_ORACLES = frozenset({"ann_ivf_trained_recall"})


def _driver_green_names() -> frozenset[str]:
    """Names with a green driver CORRECTNESS row in any recorded round
    (same acceptance rule as tests/test_registry_window.py). Outside the
    dev repo (e.g. a --py-files deployment with no CORRECTNESS_r*.json
    next to the package) this is empty and the base order stands."""
    import json as _json
    from pathlib import Path as _Path

    names: set[str] = set()
    # this file lives in <repo>/spacetime_crawler4_spark/queries/ — the
    # CORRECTNESS artifacts sit two levels up at the repo root
    root = _Path(__file__).resolve().parent.parent.parent
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rows = _json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                names.add(name)
    return frozenset(names)


def _promotion(
    base_order: list[str],
    staged_order: list[str],
    green: frozenset[str],
    window: int = CORRECTNESS_WINDOW,
) -> tuple[list[str], list[str]]:
    """Pure rotation rule: never-driver-checked base queries keep the
    leading window slots (definition order); staged queries fill the
    remaining slots in staging order; driver-green base queries follow
    (they keep their local oracle gate at every position). Returns
    (registry order, still-staged names)."""
    never = [n for n in base_order if n not in green]
    slots = max(0, window - len(never))
    promote = staged_order[:slots]
    order = never + promote + [n for n in base_order if n in green]
    return order, staged_order[len(promote) :]


def registry() -> dict[str, tuple[SparkFn, str | None]]:
    """Full query surface in driver order: the never-driver-checked
    window leads (first CORRECTNESS_WINDOW entries are what the driver
    certifies this round), driver-green queries follow, and any staged
    queries that did not fit the window trail at the very end — exposed
    as first-class ``queries()``/``oracle_sql()`` entries (every one
    keeps the identical local DuckDB-oracle gate) while staying safely
    past the certification window."""
    base = _base_registry()
    staged = _staged_registry()
    order, still = _promotion(list(base), list(staged), _driver_green_names())
    merged = {**base, **staged}
    return {n: merged[n] for n in [*order, *still]}


def pending_registry() -> dict[str, tuple[SparkFn, str | None]]:
    staged = _staged_registry()
    _, still = _promotion(
        list(_base_registry()), list(staged), _driver_green_names()
    )
    return {n: staged[n] for n in still}
