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


#: Round-10 window (see module docstring). Composition (50 checked
#: slots), exactly as planned in the round-9 comment / VERDICT r9
#: "Next round #1": the full remaining r5-era cohort in
#: oldest-first module order EXCEPT its last seven rows
#: (events_cusum_changepoints and docs_proximity_search displaced by
#: the first three additions; events_top_paths, events_kaplan_meier,
#: events_ks_test, events_mann_whitney and events_ab_test evicted
#: newest-fill-first as the later five landed — all seven spill to
#: round 11), plus the EIGHT surfaces NEW
#: in round 10 (docs_linear_classifier — in-plan averaged-perceptron
#: linear classifier, all-integer with an unrolled-CTE oracle;
#: media_adpcm_decode — IMA ADPCM (WAV format 0x11)
#: compressed-audio decode through the decode_wav seam;
#: media_shot_neardups — shot-level video fingerprints composing
#: scene segmentation with the shared banded near-dup index;
#: media_stereo_decode — interleaved-stereo PCM16 ingestion with the
#: exact floor((L+R)/2) downmix in the decode_wav seam;
#: emb_hard_negatives — contrastive triplet mining with the kcenter
#: exactness recipe; basket_stress_centrality — sampled-source
#: stress centrality, the integer-exact Brandes sweep;
#: basket_association_rules — support/confidence/lift market-basket
#: rule mining; emb_mmr_selection — MMR diversity-aware retrieval
#: with the kcenter literal-scan discipline), plus
#: the 4 surfaces CHANGED in round 10 (emb_kcenter_selection —
#: degenerate-input guards; events_autocorrelation — grid-span
#: guard, count pin, and grid repartition; media_audio_tone_probe
#: and media_scene_cuts — the strict/quarantine decode seam).
#:
#: Round-11 window, planned now so the standing policy stays
#: executable: the 7 spilled r5-era rows (events_cusum_changepoints,
#: docs_proximity_search, events_top_paths, events_kaplan_meier,
#: events_ks_test, events_mann_whitney and events_ab_test — the last
#: five evicted newest-fill-first as media_stereo_decode,
#: emb_hard_negatives, basket_stress_centrality,
#: basket_association_rules and emb_mmr_selection landed)
#: first, then the r6-era
#: cohort in module order (emb_quantization, emb_threshold_pairs,
#: emb_centroid_by_label, emb_lsh_knn, graph_degrees,
#: graph_pagerank_top, graph_components, graph_bfs_from_region,
#: gremlin_region_members, motif_customer_region,
#: motif_shared_nation, aggregate_gallery, latest_event_per_user,
#: docs_train_test_split, …) + anything new/changed in round 11,
#: overflow evicting newest-fill-first as usual.
_WINDOW = [
    # --- r5-era cohort, oldest-first module order (38)
    "emb_knn_label_accuracy",
    "emb_centroid_outliers",
    "emb_threshold_curve",
    "emb_jl_distortion",
    "emb_ann_recall",
    "emb_knn_topk",
    "emb_neardup",
    "graph_degree_powerlaw",
    "docs_source_quota_selection",
    "docs_token_budget_selection",
    "docs_stratified_sample",
    "lineitem_quantiles_by_flag",
    "events_ohlc_bars",
    "events_interarrival_quantiles",
    "events_rolling_wau",
    "media_frame_sample",
    "media_image_decode",
    "media_audio_decode",
    "media_resize_check",
    "docs_heaps_law",
    "docs_contamination_by_source",
    "docs_novelty_by_source",
    "docs_langid_confusion",
    "docs_packing_efficiency",
    "docs_collocations",
    "docs_minhash_neardups",
    "triple_predicate_cooccurrence",
    "supplier_hhi_by_nation",
    "orders_pareto_share",
    "orders_cohort_ltv",
    "orders_rfm_segments",
    "basket_ktruss",
    "basket_assortativity",
    "basket_personalized_pagerank",
    "basket_harmonic_centrality",
    "events_error_seasonality",
    "events_mix_trend",
    "events_attribution",
    # --- new in round 10 (8)
    "docs_linear_classifier",  # NEW r10: in-plan averaged perceptron, integer-exact
    "media_adpcm_decode",  # NEW r10: IMA ADPCM decode, planted-ramp exact oracle
    "media_shot_neardups",  # NEW r10: shot-level video near-dup, trim-robust
    "media_stereo_decode",  # NEW r10: stereo PCM16 downmix, closed-form oracle
    "emb_hard_negatives",  # NEW r10: contrastive triplet mining, kcenter-exact
    "basket_stress_centrality",  # NEW r10: integer-exact Brandes stress sweep
    "basket_association_rules",  # NEW r10: support/confidence/lift rule mining
    "emb_mmr_selection",  # NEW r10: MMR diversity-aware retrieval, unrolled oracle
    # --- changed in round 10 (4)
    "emb_kcenter_selection",  # CHANGED r10: degenerate-input guards
    "events_autocorrelation",  # CHANGED r10: span guard + pinned counts + grid repartition
    "media_audio_tone_probe",  # CHANGED r10: strict/quarantine seam
    "media_scene_cuts",  # CHANGED r10: strict/quarantine seam
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
