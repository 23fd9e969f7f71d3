"""Per-scale timing sweep for headline queries: run each at
sf0.001/0.01/0.1 (100x data spread), warm, and print a markdown table of
seconds per scale plus the 0.1/0.001 ratio — the direct evidence for
which operators are scheduler-floor-flat (indexes, top-k) vs data-linear
(scans), i.e. how each path extrapolates toward 100 TB.

Usage: python tools/bench_scales.py  (appends nothing; prints the table)
"""

from __future__ import annotations

import sys
import time

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from vectolite_spark import registry  # noqa: E402
from vectolite_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "flagship_topk",
    "ann_ivf_built_topk",
    "ann_pq_topk",
    "bm25_topk",
    "agg_pricing_summary",
    "join_revenue_by_nation",
    "dedup_exact",
    "dedup_minhash_pairs",
    "text_quality",
    "funnel_conversion",
    "cdc_chunk_dedup",
    "embedding_covariance",
    "bucketed_join_revenue",
    "bpe_merge_candidates",
    "ann_lsh_indexed_topk",
    "kmv_distinct_tokens",
    "stratified_split",
    "dup_graph_triangles",
    "matryoshka_two_stage_topk",
    "bloom_vocab_membership",
    "mmr_rerank_topk",
    "passage_highlight",
    "cms_token_estimates",
    "trigram_substring_search",
    "trigram_batch_substring_search",
    "regex_trigram_search",
    "trigram_similarity_topk",
    "copurchase_pairs",
    "association_rules",
    "event_transitions",
    "session_paths",
    "robust_anomalies",
    # round-6 additions
    "dsir_importance_sample",
    "span_corruption_pairs",
    "leakage_safe_split",
    "tokenizer_fertility",
    "seasonal_decomposition",
    "k_anonymity_audit",
    "sliding_wau",
    "cdc_containment_pairs",
    "embedding_outliers",
    "contrastive_triplets",
    "dsir_gumbel_sample",
    "resample_interpolate",
    "schema_drift_audit",
    "embedding_drift",
    # round-7 additions
    "semdedup_prune",
    "gdpr_erasure_audit",
    "snapshot_schema_evolution",
    "snapshot_zorder_pruned_scan",
    "snapshot_changed_data_feed",
    "cdf_incremental_dedup",
    "retrieval_ndcg_eval",
    "centroid_classify_confusion",
    "ann_ivfpq_probe_prebuilt",
    "streaming_session_windows",
    # round-8 additions
    "cdf_incremental_semdedup",
    "cdf_synced_ivf_topk",
    "cdf_synced_bm25_topk",
    "cdf_synced_trigram_search",
    "cdf_synced_srp_topk",
    "cdf_synced_ivfpq_topk",
    "maintenance_loop_capstone",
    "snapshot_shallow_clone",
    "bitext_margin_mine",
    "minhash_recall_contract",
    "ccnet_perplexity_buckets",
    "curation_pipeline_capstone",
    "ccnet_lang_cutpoints",
]
SCALES = ["0.001", "0.01", "0.1"]


def main() -> None:
    spark = get_spark("bench-scales")
    spark.sparkContext.setLogLevel("ERROR")
    registry.vacuum_index_cache()  # bound .cache before mass-building
    rows = []
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        times = []
        for sf in SCALES:
            sf_dir = f"/root/testdata/sf{sf}"
            fn(spark, sf_dir).count()  # warm (plan + scan cache)
            # median of 3: single shots on this box swing +-30-70%
            runs = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).count()
                runs.append(time.time() - t0)
            times.append(sorted(runs)[1])
        ratio = times[-1] / times[0] if times[0] > 0 else float("inf")
        rows.append((name, times, ratio))
    print("| query | sf0.001 | sf0.01 | sf0.1 | 100x-data time ratio |")
    print("|---|---|---|---|---|")
    for name, times, ratio in rows:
        cells = " | ".join(f"{t:.2f}s" for t in times)
        print(f"| {name} | {cells} | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
