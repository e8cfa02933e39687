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


#: Round-12 window (see module docstring). Composition (50 checked
#: slots): the TWENTY-FOUR r6-era rows spilled by round 11 (exactly
#: as planned in the round-11 comment), then the TEN surfaces NEW
#: in round 12 (docs_paragraph_dedup / docs_paragraph_dup_by_source —
#: CCNet paragraph-level dedup + its per-source profile;
#: media_phash_dct_neardups — DCT perceptual hash in the shared band
#: schema; docs_unigram_tokenizer — unigram-LM tokenizer training,
#: full EM trajectory oracle; emb_graph_knn — beam ANN walk over the
#: navigable NN-Descent graph; emb_graph_index_build /
#: emb_graph_index_knn — the persisted k-NN graph contract index,
#: lifecycle #16; docs_unigram_fertility — per-source tokenizer
#: fertility through the trained unigram model's encode pass;
#: docs_hybrid_search — Reciprocal-Rank Fusion of BM25 and dense
#: rankings in exact integer nano-units; docs_epoch_shuffle —
#: deterministic per-epoch training-order shuffle), then the THREE
#: surfaces CHANGED in round 12
#: (emb_knn_graph — the NN-Descent reverse-neighbor table is now
#: capped to rho*k per pivot, plan + oracle changed;
#: media_flac_decode / media_flac_transcode — decode_flac gained the
#: RFC 9639 unknown-total/unknown-MD5 paths), then r7-era fill in
#: module order (16 rows; the remaining 32 r7-era rows spill to
#: round 13).
#:
#: Round-13 window, planned now so the standing policy stays
#: executable: the 35 spilled r7-era rows first (docs_bpe_pair_counts,
#: docs_bpe_encode, docs_dup_rate_by_source, docs_quality_vs_dup,
#: docs_ngram_jaccard, docs_dedup_clusters, docs_neardup_kept,
#: docs_incremental_neardups, docs_token_stats, docs_quality_scores,
#: docs_language_id, docs_span_dedup, docs_fingerprints,
#: events_hourly_rollup, events_dedup_first, events_sessionization,
#: events_json_props, events_type_pivot, triple_subject_lookup,
#: triple_or_patterns, triple_and_not, triple_two_hop,
#: triple_three_hop, triple_insert_dedup, triple_predicate_histogram,
#: cube_lineitem_status, customers_without_orders,
#: left_join_order_stats, full_outer_nation_presence,
#: above_nation_average, orders_with_big_items,
#: conditional_aggregation, array_aggregation,
#: docs_phrase_search_indexed, docs_proximity_search_indexed), then
#: the r8-era cohort in module order + anything new/changed in round
#: 13, overflow evicting newest-fill-first as usual.
_WINDOW = [
    # --- r6-era spill from round 11, module order (24)
    "lineitem_sample_revenue",
    "docs_temperature_mixture",
    "events_heavy_hitters",
    "events_kmv_distinct",
    "events_asof_join",
    "events_range_join",
    "events_hypertable_rollup",
    "events_cms_estimate",
    "media_phash_neardups",
    "media_payload_stats",
    "docs_bigrams",
    "events_sliding_window",
    "events_asof_forward",
    "events_per_user_cap",
    "lineitem_stratified_sample",
    "docs_decontaminate",
    "docs_pii_redaction",
    "docs_repetition_metrics",
    "docs_filter_rules",
    "docs_vocab_topk",
    "docs_tfidf_terms",
    "docs_packing",
    "docs_simhash_neardups",
    "docs_exact_dedup",
    # --- new in round 12 (7)
    "docs_paragraph_dedup",  # NEW r12: CCNet paragraph-level dedup
    "docs_paragraph_dup_by_source",  # NEW r12: per-source paragraph profile
    "media_phash_dct_neardups",  # NEW r12: DCT pHash, shared band schema
    "docs_unigram_tokenizer",  # NEW r12: unigram-LM tokenizer training
    "emb_graph_knn",  # NEW r12: beam ANN walk over the navigable graph
    "emb_graph_index_build",  # NEW r12: persisted k-NN graph build surface
    "emb_graph_index_knn",  # NEW r12: graph ANN served from the index
    "docs_unigram_fertility",  # NEW r12: tokenizer fertility by source (encode pass)
    "docs_hybrid_search",  # NEW r12: RRF hybrid retrieval (BM25 + dense)
    "docs_epoch_shuffle",  # NEW r12: deterministic per-epoch training-order shuffle
    # --- changed in round 12 (3)
    "emb_knn_graph",  # CHANGED r12: reverse-neighbor cap (rho*k, md5 order)
    "media_flac_decode",  # CHANGED r12: RFC 9639 unknown-total/MD5 paths
    "media_flac_transcode",  # CHANGED r12: same decoder change
    # --- r7-era fill, oldest-first module order (16)
    "emb_pq_knn",
    "emb_ivfpq_knn",
    "emb_pq_index_build",
    "emb_pq_index_knn",
    "emb_filtered_knn",
    "emb_ivf_fixed_knn",
    "emb_ivf_knn",
    "emb_semantic_dedup",
    "docs_mixture_sample",
    "lineitem_quantile_sketch",
    "events_hll_distinct",
    "docs_chunking",
    "docs_dsir_selection",
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
