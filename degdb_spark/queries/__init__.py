"""Query registry: every operator surfaced to the driver contract.

Each entry pairs a Spark implementation (Callable[(SparkSession, sf_dir),
DataFrame]) with the equivalent DuckDB oracle SQL (or None for ops that
are not SQL-expressible — the driver then records a rows-only check).

Column-name discipline: every computed column is aliased identically in
the Spark code and the oracle SQL, because the driver's comparator sorts
columns by name before value-hashing. Float aggregates are ROUND()ed on
both sides so double summation-order differences can't drift the hash.

Window policy (standing): the driver's correctness gate checks the
FIRST 50 entries in iteration order each round, and testdata can
regenerate between rounds (so old green rows go stale). Each round's
window is therefore {never-driver-checked} ∪ {changed-this-round} ∪
{oldest-driver-checked}, expressed as the explicit ``_WINDOW`` list
below; everything else follows in module order. Update ``_WINDOW``
every round: drop what just got checked, promote whatever is now
oldest or new.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from pyspark.sql import DataFrame, SparkSession


class Query(NamedTuple):
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL (ANSI-ish), None → rows-only check


#: Round-11 window (see module docstring). Composition (50 checked
#: slots): the SEVEN r5-era rows spilled by round 10's additions
#: (exactly as planned in the round-10 comment), then the SEVEN
#: surfaces NEW in round 11 (basket_edges_build — the persisted
#: co-purchase edge contract index's explicit build surface, weight-
#: histogram oracle; docs_substring_dedup — exact variable-length
#: substring dedup, ExactSubstr/Lee et al. 2022, stride-1 window
#: fingerprints with dense-range complement reassembly;
#: media_flac_decode — pure-numpy FLAC decode through the new
#: codecs.decode_audio seam, lossless closed-form oracle;
#: docs_boosted_stumps — 3-round weight-doubling boosted stumps,
#: integer-exact with micronat vote weights; emb_knn_graph —
#: NN-Descent k-NN graph construction, every local-join round
#: unrolled in the oracle; docs_lm_perplexity — CCNet-style
#: bigram-LM perplexity quality selection, trained in-plan;
#: media_flac_transcode — lossless WAV→FLAC transcoding with the
#: double-decode oracle; docs_substring_dup_by_source — the
#: per-source substring-duplication profile), then the TWENTY-ONE surfaces CHANGED in round 11 — the 14 basket_* queries now serve
#: _weighted_edges FROM the persisted index (plans changed), and the
#: 5 audio queries now decode through codecs.decode_audio (FLAC
#: sniffing dispatch) — then r6-era fill in module order. The five
#: r10-era basket/audio rows double-covered by the changed set cost
#: no extra slots; 14 r6-era rows fit, 24 spill to round 12.
#:
#: Round-12 window, planned now so the standing policy stays
#: executable: the 24 spilled r6-era rows (lineitem_sample_revenue,
#: docs_temperature_mixture,
#: events_heavy_hitters,
#: events_kmv_distinct, events_asof_join,
#: events_range_join, events_hypertable_rollup,
#: events_cms_estimate, media_phash_neardups, media_payload_stats,
#: docs_bigrams, events_sliding_window, events_asof_forward,
#: events_per_user_cap, lineitem_stratified_sample,
#: docs_decontaminate, docs_pii_redaction, docs_repetition_metrics,
#: docs_filter_rules, docs_vocab_topk, docs_tfidf_terms,
#: docs_packing, docs_simhash_neardups, docs_exact_dedup) first,
#: then the r7-era cohort in module order + anything new/changed in
#: round 12, overflow evicting newest-fill-first as usual.
_WINDOW = [
    # --- r5-era spill from round 10, oldest first (7)
    "events_ab_test",
    "events_mann_whitney",
    "events_ks_test",
    "events_kaplan_meier",
    "events_top_paths",
    "events_cusum_changepoints",
    "docs_proximity_search",
    # --- new in round 11 (8)
    "basket_edges_build",  # NEW r11: persisted basket-edge index build surface
    "docs_substring_dedup",  # NEW r11: ExactSubstr variable-length dedup
    "media_flac_decode",  # NEW r11: FLAC decode, lossless closed-form oracle
    "docs_boosted_stumps",  # NEW r11: integer-exact boosted stumps
    "emb_knn_graph",  # NEW r11: NN-Descent k-NN graph, unrolled trajectory oracle
    "docs_lm_perplexity",  # NEW r11: CCNet-style bigram-LM quality selection
    "media_flac_transcode",  # NEW r11: lossless WAV->FLAC transcode, double-decode oracle
    "docs_substring_dup_by_source",  # NEW r11: per-source substring-duplication profile
    # --- changed in round 11: basket family reads the persisted
    #     edge index instead of re-building the wedge frame — incl.
    #     coverage's unthresholded pair view (16)
    "basket_sssp_histogram",
    "basket_communities",
    "basket_kcore",
    "basket_link_prediction",
    "basket_recommendations",
    "basket_modularity",
    "basket_edge_churn",
    "basket_embedding_power",
    "basket_ktruss",
    "basket_assortativity",
    "basket_personalized_pagerank",
    "basket_harmonic_centrality",
    "basket_stress_centrality",
    "basket_association_rules",
    "basket_triangle_count",  # CHANGED r11: unthresholded pair view of the index
    "basket_clustering_top",  # CHANGED r11: same
    # --- changed in round 11: audio decode now dispatches through
    #     codecs.decode_audio (FLAC sniffing) (5)
    "media_audio_decode",
    "media_adpcm_decode",
    "media_stereo_decode",
    "media_audio_tone_probe",
    "media_audio_neardups",
    # --- r6-era fill, oldest-first module order (14)
    "emb_quantization",
    "emb_threshold_pairs",
    "emb_centroid_by_label",
    "emb_lsh_knn",
    "graph_degrees",
    "graph_pagerank_top",
    "graph_components",
    "graph_bfs_from_region",
    "gremlin_region_members",
    "motif_customer_region",
    "motif_shared_nation",
    "aggregate_gallery",
    "latest_event_per_user",
    "docs_train_test_split",
]


def registry() -> dict[str, Query]:
    from degdb_spark.queries import (
        behavior_queries,
        coverage_queries,
        embeddings_queries,
        events_queries,
        graph_adv_queries,
        graph_motif_queries,
        graph_queries,
        multimodal_queries,
        relational,
        relational_adv,
        sampling_queries,
        search_queries,
        surface_queries,
        text_queries,
        timeseries_queries,
        tpch_more,
        triples_queries,
    )

    full: dict[str, Query] = {}
    for mod in (
        embeddings_queries,
        graph_queries,
        graph_motif_queries,
        sampling_queries,
        timeseries_queries,
        multimodal_queries,
        coverage_queries,
        text_queries,
        events_queries,
        triples_queries,
        relational,
        relational_adv,
        tpch_more,
        graph_adv_queries,
        surface_queries,
        behavior_queries,
        search_queries,
    ):
        overlap = set(full) & set(mod.QUERIES)
        assert not overlap, f"duplicate query names: {overlap}"
        full.update(mod.QUERIES)

    missing = [n for n in _WINDOW if n not in full]
    assert not missing, f"_WINDOW names not in registry: {missing}"
    assert len(_WINDOW) == len(set(_WINDOW)), "duplicate names in _WINDOW"
    out: dict[str, Query] = {n: full[n] for n in _WINDOW}
    out.update((n, q) for n, q in full.items() if n not in out)
    return out
