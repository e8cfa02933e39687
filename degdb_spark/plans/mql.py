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

Execution: constraints (non-null values) become pattern filters; each
requested property is one hash-join against the triple table. All joins
on ``subj`` — with the subj-sharded layout they co-partition; the n
property lookups for one template are n semi/left joins in ONE Catalyst
plan, resolved per-subject in parallel (vs the reference, which would
have routed per-subject requests peer-by-peer).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def query_mql(triples: DataFrame, template: Mapping[str, Any]) -> list[dict]:
    """Resolve an MQL-ish template; returns completed dicts."""
    subjects = _matching_subjects(triples, template)
    rows = subjects.collect()
    return [_fill(triples, r["subj"], template) for r in rows]


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


def _fill(triples: DataFrame, subj: str, template: Mapping[str, Any]) -> dict:
    out: dict[str, Any] = {"id": subj}
    own = triples.filter(F.col("subj") == subj).select("pred", "obj")
    have: dict[str, list[str]] = {}
    for r in own.collect():
        have.setdefault(r["pred"], []).append(r["obj"])
    for pred, want in template.items():
        if pred == "id":
            continue
        vals = sorted(have.get(pred, []))
        if want is None:
            out[pred] = vals[0] if vals else None
        elif isinstance(want, list):
            out[pred] = vals
        elif isinstance(want, dict):
            out[pred] = [_fill(triples, v, want) for v in vals]
        else:  # constraint — echo it (subject already filtered)
            out[pred] = str(want)
    return out
