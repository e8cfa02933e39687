"""Greedy k-center (farthest-point) selection over an embedding column.

The diversity-selection primitive of a training-data pipeline: pick k
points such that every point is close to some pick (the classic 2-OPT
greedy for the k-center objective, Gonzalez 1985) — used to build
coresets, seed clusterings, and select maximally-diverse exemplars
from a near-duplicate-heavy corpus. Dual of SemDeDup: that REMOVES
near-neighbours, this KEEPS a spread-out skeleton.

Plan shape (the part that matters at 100 TB): the selected centers are
tiny (k vectors) and ride as an in-plan LITERAL, so each greedy round
is ONE fully-parallel scan of the embedding table computing
min-distance-to-centers per point (a higher-order-function expression,
whole-stage codegen, no shuffle) followed by a 1-row argmax collect —
the same per-round scalar-collect discipline as BPE training and the
decision-tree split search. k rounds = k scans; no state is persisted
between rounds because min-distance is recomputed from the center
literal (cheaper than materializing an n-row state column, and
restart-safe for free).

Cross-engine exactness: embeddings are cast float→double BEFORE any
arithmetic on both engines, the dot-product fold is sequential on both
(F.aggregate/zip_with here, list_dot_product in DuckDB), and each
pairwise cosine distance is round-half-up-quantized at 6 dp
(floor(x·1e6 + 0.5)/1e6 — the same dround shape as everywhere else;
NOT a true floor) before the min/argmax, so the greedy trajectory is
bit-stable and the oracle can replay it as an unrolled CTE chain.

Reference provenance: degdb has no embedding surface; this implements
the similarity-search/data-selection leg of the training-pipeline
extension (SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from degdb_spark.operators.ml_lsh import _sql_double
from degdb_spark.persistence import pin

#: distance rounding (decimal places) applied before every min/argmax —
#: both the Spark expression and the oracle SQL derive their scale
#: from this constant
DIST_DP = 6
_DIST_SCALE = 10**DIST_DP


def _fold_dot(a: list[float], b: list[float]) -> float:
    """Sequential left fold of the element products — the exact same
    IEEE operation order as the Spark aggregate/zip_with expression
    and DuckDB's list_dot_product, so a norm precomputed here is
    bit-identical to one computed in-plan."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _centers_lit(centers: list[list[float]]) -> str:
    """The selected centers as ONE SQL array-of-structs literal
    (cv = vector, c2 = |cv|² precomputed via the same sequential
    fold) — single F.expr parse; see ml_lsh._centroid_struct_lit for
    why Column-by-Column literal assembly is a py4j anti-pattern and
    why the norm rides in the literal (a HOF sub-expression over a
    literal is NOT constant-folded by Catalyst — it would re-run per
    row per center per scan)."""
    structs = ", ".join(
        "named_struct('cv', array("
        + ", ".join(_sql_double(x) for x in c)
        + f"), 'c2', {_sql_double(_fold_dot(c, c))})"
        for c in centers
    )
    return f"array({structs})"


def _mindist_expr(centers: list[list[float]]) -> str:
    """min over centers of the DIST_DP-rounded cosine distance from the
    point's double vector column ``v`` (with precomputed ``n2`` = |v|²)."""
    dot = "aggregate(zip_with(v, c.cv, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)"
    dist = (
        f"floor((1.0d - {dot} / (sqrt(n2) * sqrt(c.c2)))"
        f" * {float(_DIST_SCALE)!r}d + 0.5d) / {float(_DIST_SCALE)!r}d"
    )
    return f"array_min(transform({_centers_lit(centers)}, c -> {dist}))"


def kcenter_select(
    emb: DataFrame, k: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Greedy k-center selection; returns (sel_rank, vec_id, dist) where
    ``dist`` is the selected point's 6-dp cosine distance to the nearest
    EARLIER pick (the coverage-radius trajectory; 0.0 for the seed,
    which is the minimum id). Ties in the farthest-point argmax break
    by ascending id.

    Degenerate inputs (ADVICE r9): an empty table raises ValueError
    (not a bare IndexError from the seed collect); if a round's
    farthest point is at distance 0.0 every remaining point coincides
    with a selected center, so selection STOPS — output is capped at
    the number of distinct points rather than re-picking the seed into
    duplicate rows."""
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
    seed_rows = pts.orderBy("vec_id").limit(1).collect()
    if not seed_rows:
        raise ValueError("kcenter_select: empty embeddings input")
    seed = seed_rows[0]
    picks = [(1, int(seed.vec_id), 0.0)]
    centers = [list(seed.v)]
    for rank in range(2, k + 1):
        nxt = (
            pts.withColumn("md", F.expr(_mindist_expr(centers)))
            .orderBy(F.col("md").desc(), "vec_id")
            .limit(1)
            .collect()[0]
        )
        if float(nxt.md) == 0.0:
            # every remaining point coincides (at 6 dp) with a selected
            # center: k exceeds the distinct-point count, stop early
            break
        picks.append((rank, int(nxt.vec_id), float(nxt.md)))
        centers.append(list(nxt.v))
    return spark.createDataFrame(picks, "sel_rank int, vec_id long, dist double")
