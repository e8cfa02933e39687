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


#: Round-9 window (see module docstring). Composition (50 checked
#: slots), exactly as planned in the round-8 comment / VERDICT r8
#: "Next round #1": ALL 37 remaining r4-era rows (the full cohort fits
#: this round — q5/q6/q10 and the galleries displaced from r8 are
#: here), plus the surfaces NEW in round 9 (media_video_neardups —
#: temporal-mean video fingerprint + banded near-dup,
#: media_avi_frame_extract — the MJPEG-in-AVI container,
#: media_mp4_frame_extract — the MJPEG-in-MP4 / ISO-BMFF container,
#: docs_bpe_train — in-plan BPE tokenizer training,
#: docs_decision_tree — in-plan depth-2 tree training with exact
#: integer split search, media_mp3_probe — header-walk mp3
#: metadata without decode, media_audio_tone_probe — DTMF digit
#: decoding via an energy-gated Goertzel/DFT bank through the G.711
#: mu-law telephony path, media_scene_cuts — frame-differencing shot
#: segmentation over MJPEG-MP4 with planted scene boundaries,
#: docs_naive_bayes — in-plan multinomial NB training with an
#: integer-micronat cross-engine-exact argmax,
#: events_autocorrelation — dense-hourly-grid ACF at lags 1..6 with
#: integer-exact sums, emb_kcenter_selection — greedy k-center
#: (farthest-point) diversity selection with an unrolled-CTE oracle;
#: all genuinely new surfaces per the standing
#: freeze policy), plus the 2 surfaces CHANGED in round 9
#: (media_gif_frame_extract and media_frame_extract — their operator
#: extract_video_frames now routes through the single
#: codecs.decode_video_frames seam that also serves AVI/MP4). The 11
#: new + 2 changed + 37 r4-era rows fill the window exactly — no
#: oldest-era fill slots remain this round. (The round-9 pin
#: migration touched many query files but is mode-identity by
#: construction — the default knob value still localCheckpoints — and
#: is covered by the full local oracle sweep + the
#: test_persistence.py bit-identity properties.)
#:
#: Round-10 window, planned now so the standing policy stays
#: executable: the remaining r5-era rows in module order
#: (emb_knn_label_accuracy, emb_centroid_outliers,
#: emb_threshold_curve, emb_jl_distortion,
#: emb_ann_recall, emb_knn_topk, emb_neardup, graph_degree_powerlaw
#: and docs_source_quota_selection first,
#: displaced from this window by the round-9 additions, then
#: docs_token_budget_selection, docs_stratified_sample,
#: lineitem_quantiles_by_flag, events_ohlc_bars, the media decode
#: quartet, the docs_* text cohort, basket_ktruss/assortativity/
#: personalized_pagerank/harmonic_centrality, the events stats
#: family) + anything that changes in round 10 + oldest r6-era fill
#: to 50. Overflow evicts oldest-first.
_WINDOW = [
    # --- the full remaining r4-era cohort (37, registry module order)
    "q5_local_supplier_volume",
    "q6_revenue_change",
    "q10_returned_items",
    "top_customers_per_nation",
    "running_order_totals",
    "rollup_revenue",
    "nations_set_ops",
    "scalar_function_gallery",
    "date_function_gallery",
    "grouping_sets_revenue",
    "lineitem_correlations",
    "lineitem_ols",
    "orders_benford_audit",
    "lineitem_snapshot_diff",
    "orders_kanonymity",
    "lineitem_ols_by_flag",
    "lineitem_chi_square",
    "lineitem_equidepth_bins",
    "lineitem_psi",
    "orders_skew_report",
    "price_percentiles",
    "regexp_gallery",
    "window_function_gallery",
    "moving_average_revenue",
    "q16_supplier_variety",
    "q22_dormant_rich_customers",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_discount_brackets",
    "events_markov_transitions",
    "docs_bm25_search",
    "docs_phrase_search",
    "parts_linkage_scores",
    # --- new in round 9 (11)
    "media_video_neardups",  # NEW r9: video aHash + banded near-dup, pixel oracle
    "media_avi_frame_extract",  # NEW r9: MJPEG-in-AVI container, quant-exact oracle
    "media_mp4_frame_extract",  # NEW r9: MJPEG-in-MP4 (ISO-BMFF), shared oracle
    "media_mp3_probe",  # NEW r9: mp3 header-walk metadata, closed-form oracle
    "docs_bpe_train",  # NEW r9: in-plan BPE training vs unrolled argmax oracle
    "docs_decision_tree",  # NEW r9: in-plan tree training, planted-concept recovery
    "media_audio_tone_probe",  # NEW r9: DTMF via Goertzel bank through G.711 mu-law
    "media_scene_cuts",  # NEW r9: shot segmentation over MJPEG-MP4, planted cuts
    "docs_naive_bayes",  # NEW r9: in-plan NB training, micronat-exact argmax
    "events_autocorrelation",  # NEW r9: dense-grid hourly ACF, integer-exact sums
    "emb_kcenter_selection",  # NEW r9: greedy k-center diversity selection
    # --- changed in round 9 (2): extract_video_frames now routes
    # through codecs.decode_video_frames (the shared GIF/AVI/RAWV seam)
    "media_gif_frame_extract",
    "media_frame_extract",
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
