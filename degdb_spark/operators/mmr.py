"""Maximal Marginal Relevance (MMR) selection over an embedding column.

The diversity-aware RETRIEVAL dual of greedy k-center (Carbonell &
Goldstein 1998): pick k items maximizing λ·relevance-to-query −
(1−λ)·max-similarity-to-already-selected — the standard re-ranker a
retrieval or data-selection pipeline runs so its top-k isn't k
near-duplicates of the best hit. k-center KEEPS a spread-out skeleton
of the whole corpus; MMR keeps a spread-out skeleton of the
*relevant* region.

Plan shape (the kcenter discipline, operators/kcenter.py): the query
vector and the selected set ride as in-plan LITERALS with precomputed
norms, so each greedy round is ONE fully-parallel scan (higher-order-
function expression, whole-stage codegen, no shuffle, no persisted
state) followed by a 1-row argmax collect. Relevance is computed once
into the pinned candidate frame; max-sim-to-selected is recomputed
from the literal each round — max is associative over the 6-dp-rounded
per-pick similarities, so this equals the incremental GREATEST the
oracle carries.

Cross-engine exactness: float→double cast before any arithmetic,
sequential-fold dot products, every cosine similarity 6-dp
round-half-up (floor(x·1e6 + 0.5)/1e6) BEFORE the max, and the MMR
score is the single expression 0.7·rel − 0.3·ms (explicit literals on
both engines — never computed as 1−λ, which would differ in the last
ulp) quantized the same way before the (score desc, id asc) argmax.
The oracle unrolls the greedy trajectory as materialized CTEs like
_kcenter_sql.

Reference provenance: degdb has no embedding surface; this extends
the similarity-search/data-selection family (SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from degdb_spark.operators.kcenter import _DIST_SCALE, _centers_lit, _fold_dot
from degdb_spark.persistence import pin

#: trade-off weights as SQL literals — BOTH sides use exactly these
#: tokens (0.3 is NOT computed as 1 − 0.7, which differs in the last ulp)
LAMBDA_REL = "0.7"
LAMBDA_DIV = "0.3"


def _sim6(dot: str, n2: str, c2: str) -> str:
    """6-dp round-half-up cosine similarity expression fragment."""
    return (
        f"floor(({dot} / (sqrt({n2}) * sqrt({c2})))"
        f" * {float(_DIST_SCALE)!r}d + 0.5d) / {float(_DIST_SCALE)!r}d"
    )


def _maxsim_expr(selected: list[list[float]]) -> str:
    """max over the selected-set literal of the 6-dp similarity from
    the row's double vector column ``v`` (with precomputed ``n2``)."""
    dot = "aggregate(zip_with(v, c.cv, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)"
    return (
        f"array_max(transform({_centers_lit(selected)},"
        f" c -> {_sim6(dot, 'n2', 'c.c2')}))"
    )


def _score_col() -> F.Column:
    return F.expr(
        f"floor(({LAMBDA_REL}d * rel - {LAMBDA_DIV}d * ms)"
        f" * {float(_DIST_SCALE)!r}d + 0.5d) / {float(_DIST_SCALE)!r}d"
    )


def mmr_select(
    emb: DataFrame, k: int = 6, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Greedy MMR selection; the query is the minimum-id vector (the
    deterministic convention kcenter uses for its seed), candidates
    are every other vector. Returns (sel_rank, vec_id, score) where
    ``score`` is the pick's MMR objective at selection time
    (max-sim-to-selected is 0.0 for the first pick). Ties break by
    ascending id. Raises ValueError on an empty table; stops early if
    candidates run out before k."""
    spark = emb.sparkSession
    pts = pin(
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        ).withColumn(
            "n2",
            F.expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)"),
        ),
        eager=True,
    )
    qrows = pts.orderBy("vec_id").limit(1).collect()
    if not qrows:
        raise ValueError("mmr_select: empty embeddings input")
    qv = list(qrows[0].v)
    cand = pin(
        pts.filter(F.col("vec_id") != int(qrows[0].vec_id)).withColumn(
            "rel", F.expr(_maxsim_expr([qv]))  # one-element literal: rel to q
        ),
        eager=True,
    )
    picks: list[tuple[int, int, float]] = []
    selected: list[list[float]] = []
    picked_ids: list[int] = []
    for rank in range(1, k + 1):
        stage = cand.filter(~F.col("vec_id").isin(picked_ids)) if picked_ids else cand
        stage = stage.withColumn(
            "ms",
            # floor at 0: the empty-selected-set penalty is 0, so a
            # candidate ANTI-similar to every pick is not rewarded
            # beyond neutrality (and the oracle's incremental
            # GREATEST-from-0.0 carries exactly this clamp)
            F.expr(f"greatest(0.0d, {_maxsim_expr(selected)})")
            if selected
            else F.lit(0.0),
        ).withColumn("score", _score_col())
        rows = stage.orderBy(F.col("score").desc(), "vec_id").limit(1).collect()
        if not rows:
            break  # fewer than k candidates
        nxt = rows[0]
        picks.append((rank, int(nxt.vec_id), float(nxt.score)))
        selected.append(list(nxt.v))
        picked_ids.append(int(nxt.vec_id))
    return spark.createDataFrame(picks, "sel_rank int, vec_id long, score double")
