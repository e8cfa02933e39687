"""MQL-style query resolution over the triple store.

The reference declares an MQL query type (Freebase's Metaweb Query
Language — JSON templates with nulls as placeholders) but returns
ErrNotImplemented (/root/reference/protocol/protocol.proto:68-74,
core/query.go:109-112). This implements the useful core:

    {"id": "/m/02mjmr", "/type/object/name": null}
        → fills the null with the object's name
    {"id": null, "/type/object/type": "/people/person",
     "/type/object/name": null}
        → one result per matching subject, names filled
    {"id": "...", "pred": []}      → ALL values for pred, as a list
    {"id": "...", "pred": {...}}   → nested template on the pred's
                                     object (one hop per nesting level)

Execution: constraints (non-null values) become semi-joins narrowing the
subject set; then ONE plan gathers every requested property for every
matching subject — join subjects⋈triples on ``subj``, filter to the
requested predicates, groupBy(subj, pred) with sorted collect_list, and
a map_from_arrays pivot. A single collect returns the whole level;
nested templates recurse once per nesting LEVEL (all parents' children
batched together), never per subject. With the subj-sharded layout the
joins co-partition; total job count is O(nesting depth), independent of
match count.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: Driver-collect guard: MQL's API contract is return-results-to-caller
#: (same as the HTTP surface), so each nesting level necessarily
#: collects one row per subject. An UNROOTED template over an unbounded
#: subject set would make that a driver OOM — the guard fails loudly at
#: this many results per level instead of truncating silently (a
#: truncated MQL answer is a WRONG answer). Callers with genuinely huge
#: result sets should stream through the DataFrame surfaces instead.
MQL_MAX_RESULTS = 100_000


def query_mql(
    triples: DataFrame,
    template: Mapping[str, Any],
    max_results: int | None = MQL_MAX_RESULTS,
) -> list[dict]:
    """Resolve an MQL-ish template; returns completed dicts.
    ``max_results`` bounds the per-level driver collect (None
    disables)."""
    subjects = _matching_subjects(triples, template)
    filled = _resolve_level(triples, subjects, template, max_results)
    return [filled[s] for s in sorted(filled)]


def _matching_subjects(triples: DataFrame, template: Mapping[str, Any]) -> DataFrame:
    sid = template.get("id")
    if sid is not None:
        return triples.sparkSession.createDataFrame([(sid,)], ["subj"])
    subjects = triples.select("subj").distinct()
    for pred, want in template.items():
        if pred == "id" or want is None or isinstance(want, (list, dict)):
            continue
        match = triples.filter(
            (F.col("pred") == pred) & (F.col("obj") == str(want))
        ).select("subj")
        subjects = subjects.join(match, on="subj", how="left_semi")
    return subjects


def _resolve_level(
    triples: DataFrame,
    subjects: DataFrame,
    template: Mapping[str, Any],
    max_results: int | None = MQL_MAX_RESULTS,
) -> dict[str, dict]:
    """Fill ``template`` for every subject in one plan (one collect);
    recurse once per nesting level for dict-valued predicates."""
    wanted = [p for p in template if p != "id"]
    if wanted:
        props = (
            triples.join(subjects, on="subj")
            .filter(F.col("pred").isin(wanted))
            .groupBy("subj", "pred")
            .agg(F.sort_array(F.collect_list("obj")).alias("vals"))
            .groupBy("subj")
            .agg(
                F.map_from_arrays(
                    F.collect_list("pred"), F.collect_list("vals")
                ).alias("pm")
            )
        )
        level = subjects.join(props, on="subj", how="left")
    else:
        level = subjects.withColumn("pm", F.lit(None).cast("map<string,array<string>>"))
    if max_results is not None:
        # limit+1 keeps the probe cheap (CollectLimit, not a full
        # count) while still distinguishing "exactly at the cap" from
        # "over it"
        rows = level.limit(max_results + 1).collect()
        if len(rows) > max_results:
            raise ValueError(
                f"MQL level matched more than max_results={max_results} "
                "subjects; refusing a driver-sized collect. Narrow the "
                "template or raise/disable max_results."
            )
    else:
        rows = level.collect()  # the ONE action for this nesting level

    have: dict[str, dict[str, list[str]]] = {
        r["subj"]: dict(r["pm"] or {}) for r in rows
    }

    # batch-resolve nested templates: all parents' children in one
    # recursive call per dict-valued predicate
    nested: dict[str, dict[str, dict]] = {}
    for pred, want in template.items():
        if isinstance(want, dict):
            children = sorted(
                {v for vals in have.values() for v in vals.get(pred, [])}
            )
            if children:
                child_df = triples.sparkSession.createDataFrame(
                    [(c,) for c in children], ["subj"]
                )
                nested[pred] = _resolve_level(triples, child_df, want, max_results)
            else:
                nested[pred] = {}

    out: dict[str, dict] = {}
    for subj, props_of in have.items():
        d: dict[str, Any] = {"id": subj}
        for pred, want in template.items():
            if pred == "id":
                continue
            vals = props_of.get(pred, [])
            if want is None:
                d[pred] = vals[0] if vals else None
            elif isinstance(want, list):
                d[pred] = vals
            elif isinstance(want, dict):
                d[pred] = [nested[pred].get(v, {"id": v}) for v in vals]
            else:  # constraint — echo it (subject already filtered)
                d[pred] = str(want)
        out[subj] = d
    return out
