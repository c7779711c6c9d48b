"""10× scale probe for the round-7 pre-training corpus gates
(text_decontaminate_ngram / text_quality_gopher / sample_mixture_weights).

Reuses probe_headline_10x's replicated corpus (documents copy-prefixed so
shingles never collide across copies, doc_id shifted by 10M per copy) and
its interleaved min-of-reps timing so box-load drift cancels out of the
ratio. What each op should show at 10×:

- decontaminate: the eval slice grows with the corpus here (it's a modulo
  of doc_id), so the broadcast side is 10× too — the probe therefore
  bounds the WHOLE pipeline, which is strictly harsher than production
  (fixed-size benchmark table). Near-linear expected: gram build is a
  map, the join is broadcast, the count shuffles per-doc rows.
- gopher: map metrics + one (doc_id, bigram) partial-agged shuffle →
  linear.
- mixture: map + explode, no shuffle → linear, dominated by scan.

Run: python probe_newops_10x.py       Results recorded in BASELINE.md §5.
"""

from __future__ import annotations

import json
import time

from probe_headline_10x import SF, X10_DIR, build_replica

from n2kupdate_spark.queries import QUERIES
from n2kupdate_spark.session import get_spark

OPS = [
    "text_decontaminate_ngram",
    "text_quality_gopher",
    "sample_mixture_weights",
    "text_pii_redact",          # pure regex map over customer
    "pack_sequences_greedy",    # per-source window cumsum
    "embed_kmeans_clusters",    # bounded fit + shuffle-free assignment map
    "corpus_prepare_pipeline",  # the whole gate chain end to end
    # round-8 additions
    "dedup_ngram_containment",  # inverted-index pairs, collision-bounded
    "sample_reservoir_per_key", # per-key window top-k by hash
    "agg_histogram_bins",       # map + bins-bounded group
    "embed_pca_project",        # bounded fit + matmul map
    # round-9 additions
    "sample_mixture_unimax",    # #langs-bounded waterfill + map/explode
    "pack_sequences_bestfit",   # chunk-bounded BFD in applyInPandas
    "dedup_substring_spans",    # positioned-gram inverted index + island merge
    "dedup_substring_trim",     # spans + HOF token-filter rewrite
    "text_repetition_signals",  # unioned top-n shuffle + per-doc island merge
    "text_decontaminate_fuzzy", # bipartite LSH probe vs broadcast eval bands
    "text_perplexity_buckets",  # bigram scorer + per-lang ntile window
    "text_quality_classifier",  # bounded LR fit + broadcast-weight scoring
    "sample_dsir_weights",      # 256-row distribution collects + ratio scoring
    "text_bpe_tokenize",        # bounded type-table fit + broadcast-ranks map encode
    # round-10 additions
    "pack_sequences_bpe",       # bounded learn + map encode + chunk-bounded BFD
    "text_decontaminate_bloom", # fixed-bitset build + k broadcast word probes
    "text_information_signals", # single Arrow map pass, zero shuffle
    "multimodal_audio_features", # WAV synth + FFT features, one Arrow pass
    "events_markov_transitions", # user-keyed lead window + tiny count table
    "sim_ann_ivfpq",            # coarse-pruned code scan + shortlist re-rank
    "embed_hard_negatives",     # label-masked closure matmul + per-batch top-k
    # round-11 additions
    "text_decontaminate_bloom_exact",  # bitset probe + sliver-only exact join
    "embed_jl_project",         # zero-fit seeded matmul map, no shuffle
    "corpus_select_budget",     # range-sharded budget cumsum w/ shard pruning
    "graph_pagerank",           # fixed-round power iteration, CC plan shape
    "sim_ann_jl",               # JL shortlist scan + exact re-rank
    # round-12 additions
    "text_unigram_tokenize",    # bounded type-table EM fit + broadcast Viterbi map
    "text_langid_hashgram",     # gram explode + bounded balanced fit + literal-weight score
    "curation_domain_quality",  # URL derive + host parse map, #hosts-bounded rollup
    "graph_domain_pagerank",    # near-dup pair lift to hosts + #hosts power iteration
    "text_wordpiece_tokenize",  # ratio-scored bounded fit + greedy longest-match map
    "text_chunk_overlap",       # pure-codegen explode/slice window chunking, zero shuffle
    "ts_downsample_lttb",       # per-key applyInPandas, n_out-bounded numpy per series
    "corpus_passage_search",    # chunk + hashed-tf embed + pruned matmul top-k
    "ts_anomaly_zscore",        # per-user rows-bounded rolling window, O(1)/row
    "ts_changepoint_cusum",     # per-key applyInPandas CUSUM walk, output ∝ alarms
    "sample_stratified_neyman", # #strata-bounded collect + md5-rank window
    "sample_weighted_topk",     # ES06 log-key map + TakeOrderedAndProject
    "curation_url_normalize",   # pure regexp/HOF codegen map, zero shuffle
    # round-13 additions
    "text_perplexity_kn",       # KN fit: vocab+bigram shuffles, broadcast score tables
    "text_extract_html",        # pure regexp/HOF codegen map, zero shuffle
    "curation_url_dedup",       # normalize map + two keyed partial-agged rollups
    "text_perplexity_kn_buckets",  # KN scorer + per-lang ntile window
    "embed_mrl_recall",         # 4 prefix-sliced brute-matmul scans + Qxk joins
    "dedup_lines_c4",           # posexplode + fingerprint window + id reassembly
    "diag_gate_sweep",          # two scorers + 9-struct literal-grid sweep pass
    "corpus_crawl_pipeline",    # extract map + line-dedup window + gate chain
    "text_blocklist_filter",    # explode + broadcast term join + id-keyed count
    "sample_d4_diverse",        # bounded fit + one matmul map + per-cell window
    "ts_winsorize_clamp",       # one user-keyed window: percentile + clamp in-pass
    "diag_semantic_tau_sweep",  # one bounded pair pass + per-candidate max + grid
    "text_contamination_report", # broadcast eval grams + collision-sized pair agg
    "ts_ewma_smooth",           # bucketed per-key walk, one shuffle
    "graph_triangle_count",     # degree-ordered wedge join, O(m^1.5) bound
    "events_attribution",       # two window shuffles + channel agg
    "text_quality_fineweb",     # split map + two partial-agged shuffles
    "ts_autocorr",              # one shared-exchange window + agg
    "events_rfm_segments",      # event-log collapse + #users-row ntiles
    "ts_seasonal_decompose",    # event-log collapse + #hours-row windows
    "text_readability",         # pure JVM regexp map, zero shuffle
    "diag_dedup_overlap",       # three bounded drop sets + flag agg
    "graph_label_propagation",  # 5 checkpointed join+argmax rounds
    "diag_langid_confusion",    # classifier map + #langs²-bounded agg
    "text_zipf_fit",            # vocab-bounded count + top-200 fit
    "corpus_quality_report",    # four pinned per-doc feeds + source rollup
    "ts_holt_winters",          # #types×#hours collapse + bucketed walk
    "diag_ks_drift",            # min/max grid + (type, bucket) count pass
    "events_path_trigrams",     # one lead window + bounded trigram count
    "events_window_funnel",     # bucketed greedy chain DP, one shuffle
    "embed_outlier_knn",        # block-pair matmul + one windowed pass
    "text_ngram_novelty",       # one gram-keyed min-ownership shuffle
    "ts_trend_mann_kendall",    # bucketed vectorized sign-fold, one shuffle
    "agg_gini_concentration",   # per-customer collapse + nation-hash window
    "agg_welch_ttest",          # one conditional-moments pass, tiny algebra
    # round-14 additions
    "text_script_mix",          # pure JVM regexp map, zero shuffle
    "text_compression_ratio",   # one Arrow mapInPandas deflate pass
    "diag_psi_drift",           # min/max scalars + (type,bin) count pass
    "graph_k_core",             # h-index rounds; driver peel under the gate
    "graph_bfs_distance",       # frontier-bounded BFS; driver deque under gate
    "agg_tdigest_quantile_merge", # (group,bucket) Arrow partials + tiny merge
    "multimodal_image_phash",   # Arrow synth+decode+hash map, 8-byte band join
    "agg_bootstrap_ci",         # one Arrow fold to (G,B) partials + tiny agg
    "merge_scd3",               # key-partitioned joins/unions, batch broadcast
    "ts_robust_zscore_mad",     # two same-key percentile windows, one exchange
    "ts_backtest_holt_winters", # bounded grid; all origins in one Arrow task
    "agg_power_mde",            # one conditional-moments pass, tiny algebra
    "diag_parquet_layout",      # two 8-file rewrites + metadata-parallel footers
    "sample_weighted_per_key",  # one map + one key-partitioned rank window
    "events_step_latency",      # three chained windows, one user exchange
    "diag_schema_diff",         # two footer reads, #columns rows (scale-free)
    "events_active_users_rolling", # distinct (user,day) collapse + x30 explode
    "corpus_interleave_mixture", # count agg + per-source rank window + map
    "agg_chi2_independence",    # one (type,cohort) count pass, driver algebra
    "agg_proportion_ztest",     # (user,type) count collapse + tiny z algebra
    # round-15 additions
    "merge_scd4",               # one key diff feeds current+history, batch broadcast
    "agg_mann_whitney_u",       # (type,value) collapse + small window + tiny agg
    "agg_kruskal_wallis",       # global value collapse + one window + 1-row algebra
    "agg_spearman_corr",        # per-group rank windows (one exchange) + corr agg
    "events_survival_km",       # one user collapse + #days-bounded KM fold
    "diag_benford_fit",         # JVM digit map + (group,digit) count + tiny spine
    "ts_theta_forecast",        # #types×#hours collapse + bucketed SES walk
    "embed_whitening",          # bounded ZCA fit + shuffle-free matmul map
    "graph_modularity_score",   # LPA + degree count + endpoint join scorer
    "text_keyphrase_rake",      # regexp delimiter map + two keyed aggs + window
    "multimodal_gif_scenes",    # Arrow synth+decode+hash map, 8-byte lag window
    "ts_changepoint_pelt",      # dense-spine collapse + bucketed pruned DP walk
    "agg_mg_heavy_hitters",     # map-side k-compress partials + item-keyed sum
    "embed_procrustes_align",   # bounded anchor fit + shuffle-free matmul maps
    "join_asof_nearest",        # union + two direction sorts, one key shuffle
    "ts_rolling_quantile",      # one key shuffle, 20-bounded frame sorts
    "graph_link_prediction",    # wedge join + anti-join vs kept edges
    "agg_cliffs_delta",         # (type,value) collapse + small window + tiny agg
    "agg_fdr_bh",               # one conditional-moments pass + #types windows
    # round-16 additions
    "ts_backtest_theta",        # bounded grid; all origins in one Arrow task
    "agg_anova_oneway",         # one (type) moments pass + #types-row F algebra
    "agg_levene_bf",            # exact median agg + broadcast join + moments pass
    "agg_cohens_d",             # the shared conditional-moments pass + tiny algebra
    "merge_scd6",               # key joins/unions + batch-sized type-1 sweep join
    "agg_jarque_bera",          # one (type) power-sums pass + #types-row algebra
    "agg_pairwise_welch_holm",  # one (type) moments pass + driver pair/Holm walk
    "ts_ar_forecast",           # dense-grid collapse + per-key 25x25 YW solve
    "ts_backtest_ar",           # shared harness; all origins in one Arrow task
    "ts_period_detect",         # dense-grid collapse + per-key rfft periodogram
    "graph_hits",               # keyed join+agg double-steps on the pair list
    "graph_assortativity",      # edge-row degree joins + one 6-sum moments agg
    "agg_tost_equivalence",     # the shared conditional-moments pass + tiny algebra
]


def main() -> None:
    import sys

    ops = [o for o in OPS if not sys.argv[1:] or o in sys.argv[1:]]
    spark = get_spark(app_name="probe-newops-10x")
    spark.sparkContext.setLogLevel("ERROR")
    build_replica(spark)
    for name in ops:  # warm-up (JIT + code cache), same policy as bench.py
        QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    t1: dict[str, float] = {}
    t10: dict[str, float] = {}
    for name in ops:
        s1, s10 = [], []
        for _ in range(3):
            for sf_dir, out in ((SF, s1), (X10_DIR, s10)):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                out.append(time.perf_counter() - t0)
        t1[name], t10[name] = round(min(s1), 3), round(min(s10), 3)
        print(f"{name:28s} {t1[name]:7.2f}s {t10[name]:8.2f}s  {t10[name] / t1[name]:5.2f}x")
    print(json.dumps({"sf0.1": t1, "x10": t10}))


if __name__ == "__main__":
    main()
