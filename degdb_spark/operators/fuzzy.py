"""Fuzzy string matching / entity resolution via q-gram blocking.

The metadata twin of the document near-dup stack (operators/dedup.py):
catalog strings (names, titles, URLs) get canonicalized, blocked on
character q-grams, and candidate pairs are verified with edit distance
— never an all-pairs comparison.

Scale design (100 TB metadata):

- Canonicalize FIRST: group identical strings to one canonical row
  before any pairing, so duplicated literals (the common case in
  product/metadata tables — 31× repetition in the test `part` table)
  collapse before the quadratic step.
- Blocking is an equi-self-join on distinct q-grams — the same banded
  candidate-join family as MinHash-LSH, one shuffle keyed by gram.
  ``block_cap`` drops grams whose posting list exceeds a bound: a
  frequent gram ('ing') would otherwise produce a near-cartesian
  block. The cap is an aggregation over the gram table (in-plan, no
  driver round-trip) and is deterministic, so the oracle replays it.
- Verification (levenshtein ≤ max_dist) runs only on candidates;
  both engines implement classic Wagner-Fischer so distances agree
  exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def qgrams(col: Column | str, q: int = 3) -> Column:
    """Distinct character q-grams; empty array for strings shorter
    than q (sequence bounds guarded)."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.length(c) - (q - 1))
    # sequence(1, 0) counts DOWN in Spark — short strings need an
    # explicit empty, and the oracle's range() agrees (empty when b < a)
    return F.when(F.length(c) < q, F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, q)))
    )


def blocked_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    q: int = 3,
    block_cap: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (id_a, id_b, text_a, text_b) sharing at
    least one q-gram, canonical order id_a < id_b."""
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
        F.explode(qgrams(text_col, q)).alias("g"),
    )
    if block_cap is not None:
        sizes = grams.groupBy("g").agg(F.count(F.lit(1)).alias("_n"))
        grams = grams.join(
            F.broadcast(sizes.filter(F.col("_n") <= block_cap).select("g")), on="g"
        )
    a = grams.select(
        F.col("_id").alias("id_a"), F.col("_txt").alias("text_a"), "g"
    )
    b = grams.select(
        F.col("_id").alias("id_b"), F.col("_txt").alias("text_b"), "g"
    )
    return (
        a.join(b, on="g")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "text_a", "text_b")
        .distinct()
    )


def fuzzy_match(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    q: int = 3,
    block_cap: int | None = None,
) -> DataFrame:
    """Pairs within edit distance ``max_dist``, from blocked candidates
    only. Returns (id_a, id_b, text_a, text_b, dist)."""
    cand = blocked_pairs(df, id_col, text_col, q=q, block_cap=block_cap)
    return cand.withColumn(
        "dist", F.levenshtein("text_a", "text_b").cast("long")
    ).filter(F.col("dist") <= max_dist)


#: Fellegi-Sunter agreement weights: per field, (m, u) = P(agree |
#: match), P(agree | non-match). Pinned literals — in production these
#: come from EM over labeled pairs; pinning keeps scoring a pure
#: function the oracle replays.
FS_FIELDS: list[tuple[str, float, float]] = [
    ("name_close", 0.95, 0.05),
    ("brand_eq", 0.90, 0.10),
    ("type_eq", 0.85, 0.20),
]


def linkage_scores(
    pairs: DataFrame,
    agreements: dict[str, "Column"],
    fields: list[tuple[str, float, float]] | None = None,
    out_dp: int = 4,
) -> DataFrame:
    """Fellegi-Sunter match weights over candidate pairs: for each
    field, agreement contributes log2(m/u) and disagreement
    log2((1-m)/(1-u)); the total weight ranks pairs for link / review /
    non-link decisions. The probabilistic layer on top of blocking
    (blocked_pairs) and edit-distance verification (fuzzy_match) —
    pure codegen arithmetic on the candidate set only.

    ``agreements``: field name -> boolean Column over `pairs`.
    """
    import math

    from degdb_spark.queries.rounding import dround

    fs = fields if fields is not None else FS_FIELDS
    total = F.lit(0.0)
    out = pairs
    for name, m, u in fs:
        agree_w = math.log2(m / u)
        disagree_w = math.log2((1 - m) / (1 - u))
        out = out.withColumn(f"agree_{name}", agreements[name].cast("int"))
        total = total + F.when(
            F.col(f"agree_{name}") == 1, F.lit(agree_w)
        ).otherwise(F.lit(disagree_w))
    return out.withColumn("match_weight", dround(total, out_dp))
