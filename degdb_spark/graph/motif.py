"""Motif pattern matching over the triple graph — GraphFrames-style
`find()` re-expressed with joins (SURVEY.md §7 Phase 4: "motif-style
pattern match generalising Phase-2 chaining").

Pattern language (a subset of GraphFrames' motif syntax):

    (a)-[knows]->(b); (b)-[knows]->(c)

- named vertices bind across edge terms (the join keys);
- the bracket part is an optional *predicate name* filter (unlike
  GraphFrames, where it names the edge variable — predicates are what
  degdb patterns filter on);
- a literal vertex is written with a leading '=': (=customer/1)-[in_nation]->(n).

Result: one row per match, one column per named vertex.

Plan shape: k edge terms → k-1 equi-joins on the shared vertex names.
Catalyst reorders/broadcasts them; at 100 TB the win over naive chaining
is that *all* bindings stay in the row (no re-join to recover earlier
hops), and selective literal terms prune first.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM_RE = re.compile(
    r"^\((?P<src>[^)]*)\)\s*-\s*\[(?P<pred>[^\]]*)\]\s*->\s*\((?P<dst>[^)]*)\)$"
)


@dataclass
class EdgeTerm:
    src: str  # variable name or '=literal'
    pred: str | None  # predicate name filter or None
    dst: str


def parse_motif(pattern: str) -> list[EdgeTerm]:
    terms = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM_RE.match(raw)
        if not m:
            raise ValueError(f"bad motif term: {raw!r}")
        terms.append(
            EdgeTerm(
                src=m.group("src").strip(),
                pred=m.group("pred").strip() or None,
                dst=m.group("dst").strip(),
            )
        )
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def find(triples: DataFrame, pattern: str) -> DataFrame:
    """Match a motif; returns one column per named vertex variable."""
    terms = parse_motif(pattern)
    result: DataFrame | None = None
    bound: set[str] = set()

    for i, t in enumerate(terms):
        e = triples.select(
            F.col("subj").alias(f"_src{i}"),
            F.col("pred").alias(f"_pred{i}"),
            F.col("obj").alias(f"_dst{i}"),
        )
        if t.pred is not None:
            e = e.filter(F.col(f"_pred{i}") == t.pred)
        for role, col in ((t.src, f"_src{i}"), (t.dst, f"_dst{i}")):
            if role.startswith("="):
                e = e.filter(F.col(col) == role[1:])
        if t.src == t.dst and not t.src.startswith("="):
            # self-loop term '(x)-[p]->(x)': the same variable binds both
            # ends, so require src == dst within the edge itself
            e = e.filter(F.col(f"_src{i}") == F.col(f"_dst{i}"))
        if result is None:
            result = e
        else:
            conds = []
            for role, col in ((t.src, f"_src{i}"), (t.dst, f"_dst{i}")):
                if not role.startswith("=") and role in bound:
                    conds.append(F.col(col) == F.col(_binding(terms[:i], role)))
            if conds:
                cond = conds[0]
                for c in conds[1:]:
                    cond = cond & c
                result = result.join(e, on=cond)
            else:  # disconnected term — cross join (rare, explicit)
                result = result.crossJoin(e)
        for role in (t.src, t.dst):
            if not role.startswith("="):
                bound.add(role)

    assert result is not None
    out_cols = []
    seen = set()
    for v in sorted(bound):
        out_cols.append(F.col(_binding(terms, v)).alias(v))
        seen.add(v)
    return result.select(*out_cols).distinct()


def _binding(terms: list[EdgeTerm], var: str) -> str:
    """First column that binds ``var`` among the terms processed so far."""
    for i, t in enumerate(terms):
        if t.src == var:
            return f"_src{i}"
        if t.dst == var:
            return f"_dst{i}"
    raise KeyError(var)
