"""Query registry: every operator surfaced to the driver contract.

Each entry pairs a Spark implementation (Callable[(SparkSession, sf_dir),
DataFrame]) with the equivalent DuckDB oracle SQL (or None for ops that
are not SQL-expressible — the driver then records a rows-only check).

Column-name discipline: every computed column is aliased identically in
the Spark code and the oracle SQL, because the driver's comparator sorts
columns by name before value-hashing. Float aggregates are ROUND()ed on
both sides so double summation-order differences can't drift the hash.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from pyspark.sql import DataFrame, SparkSession


class Query(NamedTuple):
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL (ANSI-ish), None → rows-only check


def registry() -> dict[str, Query]:
    from degdb_spark.queries import (
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
        surface_queries,
        text_queries,
        timeseries_queries,
        tpch_more,
        triples_queries,
    )

    out: dict[str, Query] = {}
    # Ordering is a verification-coverage decision: the driver's oracle
    # gate checks the first 50 entries in iteration order, so the least-
    # proven families (embeddings, graph, motif, sampling, sketch/
    # timeseries, text-dedup) lead and the long-green relational/TPC-H
    # queries trail. Round 1 verified the relational half; this order
    # puts every other family inside the round-2 window.
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
        # tail on purpose: next round these rotate into the driver's
        # 50-query window; this round the window stays on the round-1-
        # unverified families (see module docstring).
        graph_adv_queries,
        surface_queries,
    ):
        overlap = set(out) & set(mod.QUERIES)
        assert not overlap, f"duplicate query names: {overlap}"
        out.update(mod.QUERIES)
    return out
