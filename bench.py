#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

The session, JVM, and parquet footer caches are warmed by a trivial
count() first so JVM startup isn't billed to q1. Since round 11 each
entry records min over SPARK_GRAFT_BEST_OF attempts (default 2) — the
load-robust estimator; see the inline comment at the timing loop.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set — one per operator family (SURVEY.md §2 + extensions).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_change",
    "q10_returned_items",
    "top_customers_per_nation",
    "rollup_revenue",
    "events_hourly_rollup",
    "events_sessionization",
    "triple_two_hop",
    "triple_three_hop",
    "graph_degrees",
    "docs_minhash_neardups",
    "docs_quality_scores",
    "emb_knn_topk",
    "emb_lsh_knn",
    "q13_customer_distribution",
    "q18_large_orders",
    "events_asof_join",
    "events_cms_estimate",
    "events_hypertable_rollup",
    "docs_train_test_split",
    "docs_dedup_clusters",
    "docs_decontaminate",
    "docs_pii_redaction",
    "docs_packing",
    "docs_vocab_topk",
    "emb_quantization",
    "basket_triangle_count",
    "docs_chunking",
    "events_sliding_window",
    "events_per_user_cap",
    # round 11: the one-time basket-edge index build timed as its own
    # entry, run BEFORE the first _weighted_edges consumer so the whole
    # basket family measures steady-state index-read cost (the
    # emb_pq_index_build split; previously every basket query re-paid
    # the ~3 s lineitem wedge build inside its own timing)
    "basket_edges_build",
    "basket_sssp_histogram",
    # round 3
    "events_funnel",
    "events_retention",
    "events_decay_score",
    "events_anomaly_zscore",
    "basket_kcore",
    "basket_link_prediction",
    "emb_filtered_knn",
    "lineitem_price_histogram",
    "docs_bpe_pair_counts",
    "media_phash_neardups",
    "events_scd2_segments",
    "lineitem_profile",
    "basket_recommendations",
    "lineitem_unpivot",
    "orders_skew_report",
    "events_lag_features",
    "lineitem_quantile_sketch",
    "lineitem_contract_checks",
    "events_markov_transitions",
    "grouping_sets_revenue",
    "docs_bm25_search",
    "events_hll_distinct",
    "emb_pq_knn",
    "parts_fuzzy_match",
    "orders_salted_join",
    "docs_bpe_encode",
    "lineitem_correlations",
    "docs_phrase_search",
    "docs_setsim_join",
    "emb_ivfpq_knn",
    # round 6: the Lloyd-trained IVF (training in-plan) — tracked since
    # the training round shape changed this round
    "emb_ivf_knn",
    "lineitem_ols",
    "docs_zipf_fit",
    "docs_weighted_sample",
    "events_join_size_estimate",
    "events_kmv_setops",
    "orders_benford_audit",
    "lineitem_snapshot_diff",
    "orders_kanonymity",
    "docs_incremental_neardups",
    "lineitem_psi",
    # round 4
    "docs_token_budget_selection",
    "docs_stratified_sample",
    "basket_harmonic_centrality",
    "events_cusum_changepoints",
    "lineitem_quantiles_by_flag",
    "docs_heaps_law",
    "events_ab_test",
    "events_ohlc_bars",
    "docs_dup_rate_by_source",
    "docs_packing_efficiency",
    "docs_collocations",
    "emb_ann_recall",
    "events_mann_whitney",
    "events_ks_test",
    "events_kaplan_meier",
    "emb_jl_distortion",
    "events_top_paths",
    "orders_rfm_segments",
    "basket_personalized_pagerank",
    "orders_cohort_ltv",
    "docs_quality_vs_dup",
    "emb_threshold_curve",
    "docs_contamination_by_source",
    "docs_source_quota_selection",
    "orders_pareto_share",
    "docs_novelty_by_source",
    "docs_proximity_search",
    "emb_centroid_outliers",
    "events_interarrival_quantiles",
    "graph_degree_powerlaw",
    "events_rolling_wau",
    "basket_assortativity",
    "basket_ktruss",
    "supplier_hhi_by_nation",
    "triple_predicate_cooccurrence",
    "events_attribution",
    "docs_langid_confusion",
    "emb_knn_label_accuracy",
    "events_mix_trend",
    "events_error_seasonality",
    # round 6: the one-time index build measured as its own entry, run
    # BEFORE the from-index query so emb_pq_index_knn measures the
    # steady-state query cost (the r5 suite billed the build inside it)
    "emb_pq_index_build",
    # round 5
    "emb_pq_index_knn",
    "emb_semantic_dedup",
    "docs_dsir_selection",
    # round 6: phrase search from the positional index (steady-state —
    # the fingerprint-keyed build runs untimed in main(), the fixture
    # accounting VERDICT r5 ask #4 prescribed for one-time builds)
    "docs_phrase_search_indexed",
    # round 6: the proximity mode of the same positional index (shares
    # the artifact, so the same untimed fixture build covers it)
    "docs_proximity_search_indexed",
    # round 6: C4-style global span dedup (rewrite-the-corpus)
    "docs_span_dedup",
    # round 6: added after the explode/groupBy SimHash rewrite (the
    # old nested-HOF fingerprint was ~118 s at sf0.1 — worth tracking)
    "docs_simhash_neardups",
    # round 8: the four new surfaces (fluent-traversal compile path;
    # PNG inflate+unfilter, baseline-JPEG entropy decode and GIF LZW
    # decode through Arrow batches)
    "gremlin_region_orders",
    "media_png_decode",
    "media_jpeg_decode",
    "media_gif_decode",
    "media_gif_frame_extract",
    # round 9: the eleven new surfaces (temporal-mean video
    # fingerprint + banded near-dup; MJPEG-in-AVI and MJPEG-in-MP4
    # container extraction — per-frame JPEG entropy decode through
    # the shared video seam; in-plan BPE tokenizer training over the
    # word histogram; in-plan depth-2 tree training, histogram split
    # search; mp3 header-walk metadata probe; DTMF digit decoding
    # via the Goertzel/DFT bank through the G.711 mu-law path;
    # scene-cut detection over MJPEG-MP4; in-plan Naive Bayes
    # training; dense-grid hourly autocorrelation; greedy k-center
    # diversity selection)
    "media_video_neardups",
    "media_avi_frame_extract",
    "media_mp4_frame_extract",
    "docs_bpe_train",
    "docs_decision_tree",
    "media_mp3_probe",
    "media_audio_tone_probe",
    "media_scene_cuts",
    "docs_naive_bayes",
    "events_autocorrelation",
    "emb_kcenter_selection",
    # round-10 additions (in-plan trained linear classifier; IMA ADPCM
    # compressed-audio decode; shot-level video fingerprints; stereo
    # WAV downmix; hard-negative triplet mining; integer-exact
    # sampled-source stress centrality; association-rule mining;
    # MMR diversity-aware selection)
    "docs_linear_classifier",
    "media_adpcm_decode",
    "media_shot_neardups",
    "media_stereo_decode",
    "emb_hard_negatives",
    "basket_stress_centrality",
    "basket_association_rules",
    "emb_mmr_selection",
    # round-11 additions (exact variable-length substring dedup —
    # ExactSubstr, Lee et al. 2022 — as stride-1 window fingerprints +
    # dense-range complement reassembly; FLAC lossless-compressed-audio
    # decode through the decode_audio seam)
    "docs_substring_dedup",
    "media_flac_decode",
    # round 11: 3-round weight-doubling boosted stumps (integer-exact
    # AdaBoost variant, micronat vote weights)
    "docs_boosted_stumps",
    # round 11: NN-Descent all-corpus k-NN graph construction
    "emb_knn_graph",
    # round 11: CCNet-style bigram-LM perplexity quality selection
    "docs_lm_perplexity",
    # round 11: lossless WAV->FLAC transcoding (encode + double decode)
    "media_flac_transcode",
    # round 11: per-source substring-duplication profile
    "docs_substring_dup_by_source",
    # round 12: CCNet paragraph-level dedup + per-source profile
    "docs_paragraph_dedup",
    "docs_paragraph_dup_by_source",
    # round 12: DCT perceptual hash (pHash) in the shared band schema
    "media_phash_dct_neardups",
    # round 12: unigram-LM (SentencePiece-style) tokenizer training
    "docs_unigram_tokenizer",
    # round 12: graph-walk ANN — in-plan build+walk, then the persisted
    # index's build and steady-state served-query surfaces (lifecycle
    # #16; build timed separately from the walk, the PQ-index split)
    "emb_graph_knn",
    "emb_graph_index_build",
    "emb_graph_index_knn",
    # round 12: per-source tokenizer fertility (the unigram encode
    # pass) and RRF hybrid retrieval (BM25 + dense, integer fusion)
    "docs_unigram_fertility",
    "docs_hybrid_search",
    # round 12: deterministic per-epoch training-order shuffle
    "docs_epoch_shuffle",
    # round 13: document-preserving best-fit packing (harmonic length
    # classes) and the dual-strategy efficiency report
    "docs_bestfit_packing",
    # round 13: trained char-3gram language-ID (perceptron family #9)
    "docs_langid_trained",
    # round 13: embedding-space benchmark decontamination (IVF-probed)
    "emb_decontaminate",
    # round 13: two-layer (HNSW-style) graph-ANN walk — both builds +
    # both walks in one certified plan
    "emb_hnsw_knn",
    # round 13: integer blur/flat image quality gates
    "media_image_quality",
    # round 13: MinHash fuzzy decontamination (the middle rung)
    "docs_fuzzy_decontaminate",
]

#: Suite-aging canaries (VERDICT r5 ask #7): five cheap, shape-diverse
#: queries measured warm at suite start and re-measured at suite end.
#: Deliberately NOT in HEADLINE, so pre-warming them never contaminates
#: round-over-round comparisons of shared suite queries. The ratio
#: end/start is the measured session-aging tax on unchanged plans
#: (driver-JVM garbage, codegen cache pressure, AQE state), reported in
#: the JSON line so cross-round per-query deltas can be discounted.
CANARY = [
    "triple_subject_lookup",
    "nations_set_ops",
    "latest_event_per_user",
    "price_percentiles",
    "docs_token_stats",
]
assert not set(CANARY) & set(HEADLINE)


def main() -> None:
    from degdb_spark.queries import registry
    from degdb_spark.session import get_spark

    spark = get_spark(app_name="degdb_spark_bench")
    # warm the JVM + parquet footers without billing it to the first query
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    # warm shared codegen infrastructure (janino + the higher-order-function
    # / window / join operator classes) on 1-row inputs, so one-time
    # classloading isn't billed to whichever query happens to run first —
    # per-query expression compilation is still measured cold.
    spark.sql(
        "select aggregate(zip_with(array(1.0d,2.0d), array(3.0d,4.0d),"
        " (a,b)->a*b), 0d, (acc,x)->acc+x) v"
    ).count()
    spark.sql(
        "with t as (select * from values (1,'a'),(2,'b') u(k,s)) "
        "select k, row_number() over (partition by s order by k) r, n "
        "from t join (select k, count(*) n from t group by k) g using (k)"
    ).count()

    reg = registry()

    def run_one(name: str) -> float:
        t0 = time.time()
        n = reg[name].spark(spark, SF_DIR).count()  # force full execution
        dt = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)
        return dt

    # one-time positional-index build as an untimed fixture: the
    # fingerprint-keyed artifact persists, so the HEADLINE entry below
    # measures the steady-state probe (same split as emb_pq_index_build
    # vs emb_pq_index_knn, where the build IS a timed entry)
    reg["docs_phrase_search_indexed"].spark(spark, SF_DIR).count()

    # canary pass 1 (cold, discarded) + pass 2 (warm baseline)
    for name in CANARY:
        run_one(name)
    canary_start = round(sum(run_one(name) for name in CANARY), 3)

    # Per-entry BEST-OF-N (round 11, VERDICT r10 "What's wrong" #2):
    # ambient load inflated cross-round per-query deltas by ±16% on
    # identical plans, so each entry runs N times (default 2) and
    # records the MIN — the standard load-robust estimator; a
    # background-load spike must hit every attempt of an entry to
    # survive into the number. Cache is CLEARED (and the collector
    # nudged) between attempts (ADVICE r11: without that, attempt 2
    # hit pin()-persisted frames and the min measured warm cached
    # execution), so every attempt re-executes the full plan from
    # parquet; what min(best-of-N) measures is "a full cold-cache run
    # absent scheduler noise", with only JVM/codegen warm-up amortized
    # after attempt 1. SPARK_GRAFT_BEST_OF=1 restores the single-shot
    # pre-r11 metric for comparisons.
    best_of = max(1, int(os.environ.get("SPARK_GRAFT_BEST_OF", "2")))
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        attempts = []
        for i in range(best_of):
            if i:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            attempts.append(run_one(name))
        dt = min(attempts)
        timings[name] = dt
        total += dt
        # Inter-query isolation (outside the timed region): drop
        # block-manager state from checkpoint-heavy queries and nudge the
        # driver JVM's collector. Without this, garbage from earlier
        # queries (codegen classes, localCheckpoint blocks, AQE plan
        # state) taxes later queries' driver time — measured ~17 s of
        # aging across the 26-query suite, e.g. q18 at 5.8 s aged vs
        # 1.3 s isolated. Long-lived production sessions get the same
        # effect from spark.cleaner.periodicGC.interval.
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    # canary pass 3 (after the whole suite): end/start on warm plans is
    # the measured session-aging tax — subtractable noise floor for
    # round-over-round per-query comparison
    canary_end = round(sum(run_one(name) for name in CANARY), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Key order matters: the driver retains the TAIL of this line when it
    # truncates (BENCH_r04.json kept only 64 of 113 per-query figures and
    # lost the head). The bulky per-query dict goes first and the headline
    # total goes LAST, so any truncation keeps the one number that matters.
    print(
        json.dumps(
            {
                "queries": timings,
                "canary_warm_start_sec": canary_start,
                "canary_end_sec": canary_end,
                "aging_ratio": round(canary_end / canary_start, 3)
                if canary_start
                else None,
                "metric": "headline_suite_seconds",
                "best_of": best_of,
                "unit": "sec",
                "sf": float(sf),
                "value": round(total, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
