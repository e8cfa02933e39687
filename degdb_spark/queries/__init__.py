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


#: Round-5 window (see module docstring). Composition (50 checked
#: slots), per VERDICT.md r4 "Next round #1": the 40 round-4 additions
#: that have NEVER had a driver row (all green in local sf0.01 sweeps
#: and the judge's sf0.1 spot checks; basket_ktruss and
#: triple_predicate_cooccurrence also CHANGED this round — oriented
#: support counting / capped fanout — so their slots double as
#: changed-this-round coverage), plus the 10 oldest driver rows, all
#: r2-era: the minhash/simhash/embedding near-dup quartet and the
#: media decode family. After this window lands green, every query in
#: the registry has cumulative driver evidence.
#:
#: Round-6 window, planned now so the standing policy stays
#: executable: the remaining r2-era rows (aggregate_gallery,
#: docs_bigrams, docs_decontaminate, docs_dedup_clusters,
#: docs_filter_rules, docs_neardup_kept, docs_ngram_jaccard,
#: docs_packing, docs_pii_redaction, docs_repetition_metrics,
#: docs_tfidf_terms, docs_train_test_split, docs_vocab_topk,
#: emb_centroid_by_label, emb_ivf_knn, emb_lsh_knn, emb_quantization,
#: emb_threshold_pairs, events_asof_forward, events_asof_join,
#: events_cms_estimate, events_heavy_hitters,
#: events_hypertable_rollup, events_kmv_distinct, events_per_user_cap,
#: events_range_join, events_sliding_window, graph_bfs_from_region,
#: graph_components, graph_degrees, graph_pagerank_top,
#: gremlin_region_members, latest_event_per_user,
#: lineitem_sample_revenue, lineitem_stratified_sample,
#: motif_customer_region, motif_shared_nation, media_audio_neardups,
#: media_phash_neardups = 38 rows) + anything that changes in round 5
#: + oldest r1 leftovers to fill 50. Overflow evicts oldest-first.
_WINDOW = [
    # round-4 additions, never driver-checked (VERDICT r4 list)
    "docs_token_budget_selection",
    "docs_source_quota_selection",
    "docs_stratified_sample",
    "docs_heaps_law",
    "docs_dup_rate_by_source",
    "docs_quality_vs_dup",
    "docs_contamination_by_source",
    "docs_novelty_by_source",
    "docs_langid_confusion",
    "docs_packing_efficiency",
    "docs_collocations",
    "docs_proximity_search",
    "emb_ann_recall",
    "emb_centroid_outliers",
    "emb_jl_distortion",
    "emb_knn_label_accuracy",
    "emb_threshold_curve",
    "graph_degree_powerlaw",
    "triple_predicate_cooccurrence",
    "supplier_hhi_by_nation",
    "orders_pareto_share",
    "orders_cohort_ltv",
    "orders_rfm_segments",
    "lineitem_quantiles_by_flag",
    "basket_ktruss",
    "basket_assortativity",
    "basket_personalized_pagerank",
    "basket_harmonic_centrality",
    "events_ab_test",
    "events_attribution",
    "events_cusum_changepoints",
    "events_error_seasonality",
    "events_interarrival_quantiles",
    "events_kaplan_meier",
    "events_ks_test",
    "events_mann_whitney",
    "events_mix_trend",
    "events_ohlc_bars",
    "events_rolling_wau",
    "events_top_paths",
    # oldest driver rows (r2-era, twice-regenerated testdata)
    "docs_minhash_neardups",
    "docs_simhash_neardups",
    "emb_neardup",
    "emb_knn_topk",
    "media_image_decode",
    "media_audio_decode",
    "media_resize_check",
    "media_frame_extract",
    "media_frame_sample",
    # new surface this round (ANN index lifecycle query twin); takes
    # the 50th slot from media_payload_stats, which rolls to round 6
    "emb_pq_index_knn",
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
