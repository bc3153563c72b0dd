#!/usr/bin/env python
"""Emit `explain("formatted")` for the headline queries into PLANS.md —
the plan-quality audit artifact (pushdown / pruning / join strategy /
codegen spans reviewable without running Spark)."""

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spacetime_crawler4_spark.queries import registry  # noqa: E402
from spacetime_crawler4_spark.session import get_spark  # noqa: E402

AUDITED = [
    "report_top50_words",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash64_pairs",
    "ann_bruteforce",
    "ann_ivf",
    "ann_ivf_probe2",
    "events_sessionize",
    "tpch_pricing",
    "tpch_region_revenue",
    "crawl_top50_parity_tokens",
    "text_winnow",
    "text_rabin_fingerprint",
    "report_depth_histogram",
    "decontam_report",
    "dedup_incremental",
    "pii_scrub",
    "embed_int8_fidelity",
    "events_asof",
    "pipeline_admission",
    "dedup_srp_pairs",
    "sketch_distinct_hll",
    "sketch_cms_heavy_hitters",
    "graph_pagerank",
    "graph_hits",
    "dedup_substring_spans",
    "dedup_containment",
    "webfilter_host_reputation",
    "text_unigram_ppx",
    "text_bigram_ppx",
    "search_conjunctive",
    "dedup_substring_removal",
    "dedup_minhash_recall",
    "graph_triangles",
    "sample_weighted_length",
    "embed_label_centroids",
    "events_funnel",
    "tpch_volume_shipping",
    "text_bpe_train",
    # round-4 additions
    "dedup_semantic",
    "crawl_state_finish_histogram",
    "crawl_state_domain_audit",
    "crawl_state_depth_audit",
    "crawl_state_host_rank",
    "sample_dsir_topk",
    "multimodal_png_roundtrip",
    "multimodal_video_frame_plan",
    "text_chunk_windows",
    "text_pack_manifest",
    "text_ppx_partition",
    "sample_mixture_weights",
    # round-4 session-4 additions
    "crawl_links_top_targets",
    "crawl_links_anchor_terms",
    "crawl_links_anchor_bm25",
    "text_nb_langid",
    "text_zipf",
    # round-4 sessions 6-7 (staged in pending_registry for round 5)
    "crawl_trap_templates",
    "crawl_recrawl_priority",
    "crawl_mirror_hosts",
    "crawl_url_aliases",
    "crawl_soft404",
    # round-4 session-8 (staged in pending_registry for round 5)
    "crawl_dup_lines",
    "crawl_line_dedup",
    "crawl_nav_chrome",
    "search_phrase",
    "crawl_trustrank",
    "crawl_surt_keys",
    "crawl_anchor_spam",
    "crawl_cocitation",
    "crawl_budget_allocation",
    "pipeline_split_leakage",
    "crawl_discovery_curve",
    "crawl_degree_powerlaw",
    "crawl_reciprocity",
    # round-4 session-10 (staged in pending_registry for round 5)
    "crawl_cdx_manifest",
    "crawl_snapshot_delta",
    # round-4 session-11 (staged in pending_registry for round 5)
    "dedup_tfidf_cosine",
    "dedup_master_quality",
    "ann_hard_negatives",
    "crawl_host_components",
    "text_shard_manifest",
    "crawl_seed_attribution",
    "dedup_cdc_chunks",
    "embed_pca_top",
    "text_hash_embedding",
    "text_kn_ppx",
    "events_rfm",
    "tpch_revenue_pareto",
    "dedup_minhash_estimate",
    "text_js_divergence",
    "crawl_hub_pages",
    "text_vocab_growth",
    "sample_repeat_plan",
    # round-4 session-12 (staged; 5 land past round-5 window capacity,
    # local-gated only — the lowest-risk pure-relational shapes by design)
    "tpch_shipyear_priority",
    "tpch_large_orders",
    "tpch_disjunctive_revenue",
    "events_attribution",
    "dedup_cluster_cohesion",
    "ann_kmeanspp_init",
    "embed_matryoshka_recall",
    "text_langid_confusion",
    # round-4 session-13 (staged; classify_lr_weights and
    # sketch_quantile_audit are driver-loop queries whose final frame
    # explains trivially — audited via their operator docstrings instead)
    "sketch_mg_heavy_hitters",
    "graph_label_propagation",
    "events_sliding_window",
    "text_mojibake",
    "sketch_hll_per_source",
    "tpch_forecast_revenue",
    "tpch_unshipped_orders",
    # round-4 session-14 (staged; OPIC/classify-style driver loops audit
    # via operator docstrings; these are the single-action plans)
    "sketch_kmv_setops",
    "dedup_oph_pairs",
    "dedup_lsh_onepass",
    "events_sliding_distinct",
    "search_rrf_fusion",
    "tpch_waiting_suppliers",
    "events_window_topk",
    "search_dirichlet_ql",
    "embed_rocchio_confusion",
    "dedup_winnow_pairs",
    "text_oov_goodturing",
    "pipeline_admission_onepass",
    "decontam_fuzzy",
    "tpch_idle_rich_customers",
    "dedup_ppjoin",
    "crawl_opic_importance",
    "crawl_opic_host_rank",
    "tpch_top_supplier",
    "events_stickiness",
    "text_keywords",
    "sketch_ams_f2",
    "events_trend_mk",
    "tpch_benford_audit",
    "tpch_cube",
    "events_moving_avg",
    "crawl_salsa",
    "tpch_market_share",
    "tpch_small_qty_revenue",
]

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("explain-audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    from spacetime_crawler4_spark.queries import pending_registry

    reg = {**registry(), **pending_registry()}
    out = [
        "# PLANS — explain('formatted') audit of the headline queries\n",
        "Generated by tools/explain_audit.py at sf0.01. Things to check:",
        "PushedFilters/ReadSchema on scans (pushdown+pruning), BroadcastHashJoin",
        "for dims, ArrowEvalPython (never BatchEvalPython) for UDF stages,",
        "two-phase HashAggregate, TakeOrderedAndProject for top-k.\n",
    ]
    for name in AUDITED:
        fn, _sql = reg[name]
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, SF).explain("formatted")
        out.append(f"\n## {name}\n\n```\n{buf.getvalue().strip()}\n```\n")
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(out)
    )
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
